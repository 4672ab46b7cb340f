"""Text-analysis / dedup / similarity / multimodal operators over the
driver testdata tables (documents, embeddings) at sf0.001."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from geofileops_spark.ml import dedup as DD
from geofileops_spark.ml import multimodal as MM
from geofileops_spark.ml import similarity as SIM
from geofileops_spark.text import analysis as TA

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_token_stats_matches_duckdb(docs):
    got = {
        r["doc_id"]: (r["n_chars"], r["n_tokens"])
        for r in TA.token_stats(docs).select("doc_id", "n_chars", "n_tokens").collect()
    }
    exp = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(
            f"""select doc_id, length(text),
                case when trim(text)='' then 0
                     else len(regexp_split_to_array(trim(text), '\\s+')) end
            from '{SF}/documents.parquet'"""
        ).fetchall()
    }
    assert got == exp


def test_fingerprint_md5_matches_duckdb(docs):
    got = {r["doc_id"]: r["fp"] for r in TA.fingerprint(docs).select("doc_id", "fp").collect()}
    exp = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""select doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
            from '{SF}/documents.parquet'"""
        ).fetchall()
    }
    assert got == exp


def test_lang_id_runs(docs):
    out = TA.lang_id(docs).groupBy("lang_pred").count().collect()
    assert sum(r["count"] for r in out) == docs.count()


def test_dedup_exact_with_planted_dups(spark, docs):
    # plant exact duplicates: copy of each doc with id + 10000
    dup = docs.withColumn("doc_id", F.col("doc_id") + 10000)
    both = docs.unionByName(dup)
    kept = DD.dedup_exact(both)
    assert kept.count() == docs.count()
    assert kept.agg(F.max("doc_id")).collect()[0][0] < 10000


def test_ngram_jaccard_finds_near_dups(spark, docs):
    # mutated copy: drop last word -> high Jaccard vs original
    base = docs.where(F.col("doc_id") < 50)
    mut = base.withColumn("doc_id", F.col("doc_id") + 10000).withColumn(
        "text", F.regexp_replace(F.col("text"), r"\s+\S+$", "")
    )
    both = base.unionByName(mut)
    pairs = DD.ngram_jaccard_pairs(both, n=3, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, i + 10000) for i in range(50) if (i,) } >= got or len(got) > 0
    # every original should pair with its mutation
    expected = {(i, i + 10000) for i in [r[0] for r in base.select("doc_id").collect()]}
    assert expected <= got


def test_minhash_lsh_finds_near_dups(spark, docs):
    base = docs.where(F.col("doc_id") < 50)
    mut = base.withColumn("doc_id", F.col("doc_id") + 10000).withColumn(
        "text", F.regexp_replace(F.col("text"), r"\s+\S+$", "")
    )
    both = base.unionByName(mut)
    pairs = DD.minhash_lsh_pairs(both, n=3, num_perm=64, bands=16, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    expected = {(i, i + 10000) for i in [r[0] for r in base.select("doc_id").collect()]}
    # banding may drop a few, but on near-identical docs recall should be full
    assert len(expected - got) == 0


def test_simhash_pairs(spark, docs):
    base = docs.where(F.col("doc_id") < 30)
    dup = base.withColumn("doc_id", F.col("doc_id") + 10000)
    both = base.unionByName(dup)
    pairs = DD.simhash_pairs(both, max_hamming=0)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    expected = {(i, i + 10000) for i in [r[0] for r in base.select("doc_id").collect()]}
    assert expected <= got


def test_cosine_topk_self_is_nearest(spark, emb):
    queries = emb.where(F.col("vec_id") % 100 == 0)
    out = SIM.cosine_topk(queries, emb, k=3, include_self=True)
    top1 = {r["query_id"]: r["neighbor_id"] for r in out.where(F.col("rank") == 1).collect()}
    assert all(q == n for q, n in top1.items())
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in counts)


def test_lsh_topk_reasonable_recall(spark, emb):
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = SIM.cosine_topk(queries, emb, k=3)
    approx = SIM.lsh_topk(queries, emb, k=3, nbits=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # same-bucket recall on random data with 4 bits should find some overlap
    assert len(e & a) >= len(e) // 4


def test_multimodal_decode_plumbing(spark):
    media = MM.synth_media(spark, 64)
    decoded = MM.decode_images(media)
    rows = decoded.select("media_id", "width", "height", F.size("features").alias("d")).collect()
    assert len(rows) == 64
    assert all(r["width"] > 0 and r["height"] > 0 and r["d"] == 32 for r in rows)
    # determinism: same input -> same features
    f1 = decoded.select("features").first()[0]
    f2 = MM.decode_images(media).select("features").first()[0]
    assert f1 == f2


def test_frame_sample(spark):
    media = MM.synth_media(spark, 8, media_type="video")
    frames = MM.frame_sample(media, every_n=1)
    assert frames.count() >= 8
    assert frames.where(F.col("frame").isNull()).count() == 0
    # exact explode arithmetic: every blob yields ceil((len//256 or 1)/n)
    # frames at indices 0, n, 2n... and frame bytes are the blob slices
    media_rows = {r["media_id"]: bytes(r["media"]) for r in media.collect()}
    got = frames.select("media_id", "frame_idx", "frame").collect()
    import math

    expected_n = sum(
        math.ceil(max(1, len(b) // 256) / 3) for b in media_rows.values()
    )
    got3 = MM.frame_sample(media, every_n=3).collect()
    assert len(got3) == expected_n
    for r in got:
        blob = media_rows[r["media_id"]]
        assert bytes(r["frame"]) == blob[r["frame_idx"] * 256 : (r["frame_idx"] + 1) * 256]


def test_fake_decode_contract(spark, monkeypatch):
    """Flipping FAKE_DECODE without a real codec backend must fail LOUDLY
    at plan time — never silently keep serving byte-histogram fakes."""
    import pytest

    media = MM.synth_media(spark, 2)
    monkeypatch.setattr(MM, "FAKE_DECODE", False)
    with pytest.raises(NotImplementedError):
        MM.decode_images(media)
    with pytest.raises(NotImplementedError):
        MM.frame_sample(media)


def test_ivf_topk_recall(spark, emb):
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = SIM.cosine_topk(queries, emb, k=5)
    approx = SIM.ivf_topk(queries, emb, k=5, n_centroids=8, nprobe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # probing half the centroids should recover a solid share of true top-5
    assert len(e & a) >= len(e) // 2
    counts = approx.groupBy("query_id").count().collect()
    assert all(r["count"] <= 5 for r in counts)


def test_dup_clusters_and_keep_canonical(spark):
    # path component {1,2,3} (diameter 2 forces >1 propagation round),
    # pair {10,11}, singleton 99 untouched
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {
        r["id"]: r["cluster_id"]
        for r in DD.dup_clusters(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 10, 11, 99)],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in DD.keep_canonical(docs, pairs, id_col="doc_id").collect()
    )
    assert kept == [1, 10, 99]

    # empty edge list: nothing dropped
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert DD.dup_clusters(empty).count() == 0
    assert DD.keep_canonical(docs, empty, id_col="doc_id").count() == 6

    # long chain exceeding max_rounds raises instead of mis-clustering
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        DD.dup_clusters(chain, max_rounds=2)
