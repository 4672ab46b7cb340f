"""Arbitrary-SQL escape hatch: ``select`` / ``select_two_layers``
(geofileops ``geoops.py:1620`` and ``geoops.py:3302``; the underlying
statement runner is ``fileops.py:577,2192``).

The reference executes user SQL (SQLite dialect + spatialite functions)
against the input file(s), substituting a documented set of placeholders
(``{input_layer}``, ``{columns_to_select_str}``,
``{layer1_columns_prefix_alias_str}``, ``{batch_filter}``, ...). The
Spark twin registers each input DataFrame as a temporary view, renders
the same placeholders into Spark-SQL identifiers, and hands the result
of ``spark.sql`` back as a DataFrame — Catalyst plans the statement, so
the user query gets predicate pushdown / join strategy / AQE for free.

Dialect notes (documented deviations, not silent ones):

* The statement is **Spark SQL**, not SQLite — spatial functions are the
  ``st_*`` UDF surface (``functions.st.register_sql_functions``, called
  automatically here) instead of spatialite's builtins (same semantics,
  SURVEY.md §2.8; Spark SQL function names are case-insensitive, so
  reference-style ``ST_Area(...)`` spellings work unchanged).
* ``{batch_filter}`` renders to the empty string: Spark parallelizes the
  plan itself, there is no per-batch rowid window to emulate
  (reference replaces it with ``AND rowid >= x AND rowid < y``).
* ``{inputN_databasename}."{inputN_layer}"`` (the reference's attached-
  sqlite-db qualification) collapses to the registered view name.
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VIEW_SEQ = itertools.count()


def _q(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _register(df: DataFrame, stem: str) -> str:
    from .functions.st import register_sql_functions

    register_sql_functions(df.sparkSession)
    view = f"gfo_{stem}_{next(_VIEW_SEQ)}"
    df.createOrReplaceTempView(view)
    return view


def _cols(df: DataFrame, requested: list[str] | None, geom_col: str) -> list[str]:
    """Columns covered by the column placeholders: the requested list, or
    all non-geometry columns (reference ColumnFormatter keeps "standard"
    columns — the geometry travels via the geometrycolumn placeholder)."""
    if requested is not None:
        return list(requested)
    return [c for c in df.columns if c != geom_col]


# sentinels for the documented `{{`/`}}` literal-brace escapes: they are
# swapped in BEFORE any placeholder pass (including the {inputN_layer}
# regexes) so an escaped token like ``{{input_layer}}`` is never
# substituted, then swapped back to single braces at the end.
_L_SENT = "\x00GFO_LBRACE\x00"
_R_SENT = "\x00GFO_RBRACE\x00"


def _protect_escapes(sql: str) -> str:
    return sql.replace("{{", _L_SENT).replace("}}", _R_SENT)


def _restore_escapes(sql: str) -> str:
    return sql.replace(_L_SENT, "{").replace(_R_SENT, "}")


def _sub(sql: str, mapping: dict[str, str]) -> str:
    """Replace {placeholder}s; `{{`/`}}` escapes (already tokenized by
    ``_protect_escapes``) collapse to literal braces at the end."""
    out = sql
    for key, val in mapping.items():
        # the databasename-qualified, double-quoted form first
        out = out.replace(key, val)
    return _restore_escapes(out)


def _strip_db_qualification(sql: str, n: int, view: str) -> str:
    """`{inputN_databasename}."{inputN_layer}"` (and the unquoted / bare
    variants) -> registered view name."""
    pat = re.compile(
        r"(?:\{input%d_databasename\}\s*\.\s*)?\"?\{input%d_layer\}\"?" % (n, n)
    )
    return pat.sub(_q(view), sql)


def select(
    df: DataFrame,
    sql_stmt: str,
    columns: list[str] | None = None,
    geom_col: str = "geom_wkb",
    explodecollections: bool = False,
    gridsize: float = 0.0,
    keep_empty_geoms: bool = True,
    where_post: str | None = None,
) -> DataFrame:
    """Run a user SELECT statement against one layer.

    Placeholders (reference ``geoops.select`` notes): ``{input_layer}``,
    ``{geometrycolumn}``, ``{columns_to_select_str}`` (leading-comma
    quoted column list, honouring ``columns``), ``{batch_filter}`` (-> "").
    """
    spark = df.sparkSession
    view = _register(df, "layer")
    cols = _cols(df, columns, geom_col)
    mapping = {
        "{geometrycolumn}": _q(geom_col),
        "{columns_to_select_str}": "".join(f", {_q(c)}" for c in cols),
        "{batch_filter}": "",
    }
    sql = re.sub(r"\"?\{input_layer\}\"?", _q(view), _protect_escapes(sql_stmt))
    try:
        # spark.sql analyzes eagerly, inlining the view's resolved plan
        # into the returned DataFrame — dropping the view afterwards is
        # safe and keeps the catalog from growing per facade call
        out = spark.sql(_sub(sql, mapping))
    finally:
        spark.catalog.dropTempView(view)
    return _postprocess(
        out, geom_col, gridsize, explodecollections, where_post, keep_empty_geoms
    )


def select_two_layers(
    df1: DataFrame,
    df2: DataFrame,
    sql_stmt: str,
    input1_columns: list[str] | None = None,
    input1_columns_prefix: str = "l1_",
    input2_columns: list[str] | None = None,
    input2_columns_prefix: str = "l2_",
    geom_col: str = "geom_wkb",
    explodecollections: bool = False,
    gridsize: float = 0.0,
    keep_empty_geoms: bool = True,
    where_post: str | None = None,
) -> DataFrame:
    """Run a user SELECT statement over two layers (aliased ``layer1`` /
    ``layer2`` by convention, like the reference).

    Placeholders (reference ``geoops.select_two_layers`` notes):
    ``{input1_layer}`` / ``{input2_layer}`` (optionally qualified with
    ``{inputN_databasename}.``), ``{input1_geometrycolumn}`` /
    ``{input2_geometrycolumn}``, the column-list family
    ``{layerN_columns_prefix_str}``, ``{layerN_columns_prefix_alias_str}``,
    ``{layer2_columns_prefix_alias_null_str}``,
    ``{layer1_columns_from_subselect_str}``, and ``{batch_filter}`` (-> "").
    """
    spark = df1.sparkSession
    v1 = _register(df1, "layer1")
    v2 = _register(df2, "layer2")
    c1 = _cols(df1, input1_columns, geom_col)
    c2 = _cols(df2, input2_columns, geom_col)
    p1, p2 = input1_columns_prefix, input2_columns_prefix

    def prefix_alias(cols, alias, prefix):
        return "".join(f", {alias}.{_q(c)} AS {_q(prefix + c)}" for c in cols)

    def prefix_plain(cols, alias):
        return "".join(f", {alias}.{_q(c)}" for c in cols)

    mapping = {
        "{input1_geometrycolumn}": _q(geom_col),
        "{input2_geometrycolumn}": _q(geom_col),
        "{layer1_columns_prefix_alias_str}": prefix_alias(c1, "layer1", p1),
        "{layer2_columns_prefix_alias_str}": prefix_alias(c2, "layer2", p2),
        "{layer1_columns_prefix_str}": prefix_plain(c1, "layer1"),
        "{layer2_columns_prefix_str}": prefix_plain(c2, "layer2"),
        "{layer2_columns_prefix_alias_null_str}": "".join(
            f", NULL AS {_q(p2 + c)}" for c in c2
        ),
        "{layer1_columns_from_subselect_str}": "".join(
            f", sub.{_q(p1 + c)}" for c in c1
        ),
        "{batch_filter}": "",
    }
    sql = _strip_db_qualification(_protect_escapes(sql_stmt), 1, v1)
    sql = _strip_db_qualification(sql, 2, v2)
    try:
        out = spark.sql(_sub(sql, mapping))
    finally:
        spark.catalog.dropTempView(v1)
        spark.catalog.dropTempView(v2)
    return _postprocess(
        out, geom_col, gridsize, explodecollections, where_post, keep_empty_geoms
    )


def _postprocess(
    df: DataFrame,
    geom_col: str,
    gridsize: float,
    explodecollections: bool,
    where_post: str | None,
    keep_empty_geoms: bool,
) -> DataFrame:
    """Shared tail, only applied when the statement kept a geometry
    column (attribute-only selects pass through untouched)."""
    if geom_col not in df.columns:
        if where_post:
            df = df.where(F.expr(where_post))
        return df
    from .operators.overlay import _postprocess as _pp

    return _pp(df, geom_col, gridsize, explodecollections, where_post, keep_empty_geoms)
