"""Property-based tests for the pure-stdlib media codecs (no Spark):
PNG round-trips over random shapes/channel counts, decode of streams
filtered with randomly chosen per-scanline filter types, APNG frame
splits, and WAV PCM round-trips."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geofileops_spark.ml import codecs as C


def _rand_img(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, shape, dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip(h, w, ch, seed):
    img = _rand_img(h, w, ch, seed)
    out = C.decode_png(C.encode_png(img))
    assert np.array_equal(out.reshape(img.shape), img)
    gw, gh, depth, _color = C.png_header(C.encode_png(img))
    assert (gw, gh, depth) == (w, h, 8)


def _filter_scanlines(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Forward-apply PNG filters (reference implementation for tests)."""
    h = img.shape[0]
    w = img.shape[1]
    ch = 1 if img.ndim == 2 else img.shape[2]
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    out = bytearray()
    for y, f in enumerate(ftypes):
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        cur = flat[y]
        row = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            row[x] = (cur[x] - pred) & 0xFF
        out.append(f)
        out += bytes(row.astype(np.uint8).tobytes())
    return bytes(out)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31),
    data=st.data(),
)
def test_unfilter_all_filter_types(h, w, ch, seed, data):
    img = _rand_img(h, w, ch, seed)
    ftypes = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    raw = _filter_scanlines(img, ftypes)
    rec = C._unfilter(raw, w, h, ch)
    assert np.array_equal(rec.reshape(img.shape), img)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    n_frames=st.integers(1, 6),
    seed=st.integers(0, 2**31),
)
def test_apng_roundtrip(h, w, n_frames, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n_frames)]
    parts = C.apng_frames(C.encode_apng(frames))
    assert [p["frame_idx"] for p in parts] == list(range(n_frames))
    for p, fr in zip(parts, frames):
        assert np.array_equal(C.decode_png(p["png"]), fr)
        assert (p["width"], p["height"]) == (w, h)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 3000),
    chs=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip(n, chs, rate, seed):
    rng = np.random.default_rng(seed)
    sig = rng.integers(-32768, 32768, (n, chs)).astype(np.int16)
    got_rate, got = C.decode_wav(C.encode_wav(sig, rate))
    assert got_rate == rate
    assert np.array_equal(got, sig)
