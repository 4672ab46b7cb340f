"""Pure-stdlib media codecs: PNG (images), APNG (animation frames) and
PCM WAV (audio) via ``zlib``/``struct`` + numpy — no external image or
audio libraries required, so the multimodal operators can decode REAL
media in this container. JPEG/MP4/etc. stay honestly unsupported (a DCT
or H.264 codec is out of scope); ``multimodal.decode_images`` sniffs
magic bytes and routes unknown formats to its documented fallback.

Scope (documented, tested):
- PNG: bit depth 8; color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA); interlace 0; all five scanline filters on decode
  (None/Sub/Up/Average/Paeth); encoder writes filter 0.
- APNG: acTL/fcTL/fdAT parsing, frames re-wrapped as standalone PNGs
  (region frames keep their x/y offset metadata; blend/dispose composition
  is the caller's concern — frame SAMPLING needs the frames, not the
  composited canvas).
- WAV: RIFF/WAVE PCM 16-bit little-endian, any channel count.

The decoders are deliberately strict: malformed input raises ValueError
rather than returning garbage, so corrupt blobs surface as task errors.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunks(buf: bytes):
    """Yield (type, data) for each PNG chunk; validates lengths + CRC."""
    if not buf.startswith(PNG_MAGIC):
        raise ValueError("not a PNG: bad signature")
    pos = len(PNG_MAGIC)
    n = len(buf)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data_end = pos + 8 + length
        if data_end + 4 > n:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        data = buf[pos + 8 : data_end]
        (crc,) = struct.unpack(">I", buf[data_end : data_end + 4])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos = data_end + 4
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _unfilter(raw: bytes, width: int, height: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering. Sub is a per-lane cumsum (vector),
    Up is a running uint8 add (vector per row); Average/Paeth fall back
    to a per-pixel loop along x (rare in practice: most encoders emit
    0/1/2 for synthetic content, and our own encoder always writes 0)."""
    stride = width * ch
    expected = (stride + 1) * height
    if len(raw) != expected:
        raise ValueError(f"PNG data size {len(raw)} != expected {expected}")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(ftypes[y])
        cur = rows[y, 1:].copy()
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: prefix-sum per byte lane, mod 256
            lanes = cur.reshape(width, ch).astype(np.int64)
            rec = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            rec = cur + prev  # uint8 wraparound add
        elif f == 3:  # Average
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                rec[x] = (int(cur[x]) + ((a + b) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec
        prev = out[y]
    if ch == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, ch)


def png_header(buf: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR without inflating
    pixel data — the cheap metadata-only parse."""
    for ctype, data in _chunks(buf):
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            return w, h, depth, color
        break
    raise ValueError("PNG missing IHDR")


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) or (h, w, channels)."""
    width = height = None
    depth = color = interlace = 0
    idat: list[bytes] = []
    for ctype, data in _chunks(buf):
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat.append(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    raw = zlib.decompress(b"".join(idat))
    return _unfilter(raw, width, height, _CHANNELS[color])


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w[, channels in {1,2,3,4}]) -> PNG bytes
    (filter 0, single IDAT)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # prepend the filter-type byte (0) to each scanline
    scan = np.zeros((h, w * ch + 1), dtype=np.uint8)
    scan[:, 1:] = a.reshape(h, w * ch)
    idat = zlib.compress(scan.tobytes(), 6)
    return PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


# --------------------------------------------------------------- APNG
def is_apng(buf: bytes) -> bool:
    """True when the PNG carries an acTL animation-control chunk."""
    if not buf.startswith(PNG_MAGIC):
        return False
    try:
        for ctype, _ in _chunks(buf):
            if ctype == b"acTL":
                return True
            if ctype == b"IDAT":
                return False
    except ValueError:
        return False
    return False


def apng_frames(buf: bytes) -> list[dict]:
    """Split an APNG into standalone per-frame PNGs.

    Returns [{"frame_idx", "png", "width", "height", "x", "y"}] in
    presentation order. The default-image IDAT participates as frame 0
    only when an fcTL precedes it (per the APNG spec); otherwise it is
    the non-animated fallback image and is skipped.
    """
    ihdr_tail = None  # bit depth .. interlace from the canvas IHDR
    frames: list[dict] = []
    cur: dict | None = None
    saw_actl = False
    for ctype, data in _chunks(buf):
        if ctype == b"IHDR":
            ihdr_tail = data[8:]
        elif ctype == b"acTL":
            saw_actl = True
        elif ctype == b"fcTL":
            if cur is not None and cur["idat"]:
                frames.append(cur)
            _seq, w, h, x, y = struct.unpack(">IIIII", data[:20])
            cur = {"w": w, "h": h, "x": x, "y": y, "idat": []}
        elif ctype == b"IDAT":
            if cur is not None:  # fcTL before IDAT: default image IS frame 0
                cur["idat"].append(data)
        elif ctype == b"fdAT":
            if cur is None:
                raise ValueError("APNG fdAT without preceding fcTL")
            cur["idat"].append(data[4:])  # strip the sequence number
        elif ctype == b"IEND":
            if cur is not None and cur["idat"]:
                frames.append(cur)
    if not saw_actl:
        raise ValueError("not an APNG: no acTL chunk")
    if ihdr_tail is None:
        raise ValueError("APNG missing IHDR")
    out = []
    for i, fr in enumerate(frames):
        ihdr = struct.pack(">II", fr["w"], fr["h"]) + ihdr_tail
        png = (
            PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + b"".join(_chunk(b"IDAT", d) for d in fr["idat"])
            + _chunk(b"IEND", b"")
        )
        out.append(
            {
                "frame_idx": i,
                "png": png,
                "width": fr["w"],
                "height": fr["h"],
                "x": fr["x"],
                "y": fr["y"],
            }
        )
    return out


def encode_apng(frames: list[np.ndarray], delay_num: int = 1, delay_den: int = 10) -> bytes:
    """uint8 frame arrays (equal shape) -> APNG bytes. Frame 0 doubles as
    the default image (fcTL precedes its IDAT)."""
    if not frames:
        raise ValueError("need at least one frame")
    a0 = np.ascontiguousarray(frames[0], dtype=np.uint8)
    if a0.ndim == 2:
        shape_ch = 1
    else:
        shape_ch = a0.shape[2]
    h, w = a0.shape[0], a0.shape[1]
    color = {1: 0, 2: 4, 3: 2, 4: 6}[shape_ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    actl = struct.pack(">II", len(frames), 0)  # num_frames, loop forever

    def _raw(a: np.ndarray) -> bytes:
        a = np.ascontiguousarray(a, dtype=np.uint8).reshape(h, w * shape_ch)
        scan = np.zeros((h, w * shape_ch + 1), dtype=np.uint8)
        scan[:, 1:] = a
        return zlib.compress(scan.tobytes(), 6)

    seq = 0
    body = b""
    for i, fr in enumerate(frames):
        if fr.shape[:2] != (h, w):
            raise ValueError("all APNG frames must share the canvas shape")
        fctl = struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, delay_num, delay_den, 0, 0
        )
        body += _chunk(b"fcTL", fctl)
        seq += 1
        comp = _raw(fr)
        if i == 0:
            body += _chunk(b"IDAT", comp)
        else:
            body += _chunk(b"fdAT", struct.pack(">I", seq) + comp)
            seq += 1
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"acTL", actl)
        + body
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- WAV
WAV_MAGIC = b"RIFF"


def is_wav(buf: bytes) -> bool:
    return len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 samples (n,) or (n, channels) -> PCM WAV bytes."""
    a = np.ascontiguousarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV bytes -> (sample_rate, int16 array (n, channels))."""
    if not is_wav(buf):
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    data = None
    n = len(buf)
    while pos + 8 <= n:
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        cdata = buf[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", cdata[:16]
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format code {audio_fmt} (PCM only)")
        elif cid == b"data":
            data = cdata
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits} (16-bit PCM only)")
    arr = np.frombuffer(data, dtype="<i2")
    arr = arr[: (len(arr) // channels) * channels].reshape(-1, channels)
    return int(rate), arr


# ------------------------------------------------------------ features
def image_features(arr: np.ndarray, dim: int = 32) -> np.ndarray:
    """Real pixel features: L2-normalized ``dim``-bin luminance histogram
    of the decoded image (Rec.601 luma for color, identity for gray)."""
    a = arr.astype(np.float64)
    if a.ndim == 3 and a.shape[2] >= 3:
        luma = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    elif a.ndim == 3:
        luma = a[..., 0]
    else:
        luma = a
    bins = np.clip((luma * dim / 256.0).astype(np.int64), 0, dim - 1)
    hist = np.bincount(bins.ravel(), minlength=dim).astype(np.float64)
    nrm = np.linalg.norm(hist)
    return (hist / nrm if nrm > 0 else hist).astype(np.float32)


def audio_features(samples: np.ndarray, dim: int = 32) -> np.ndarray:
    """Real audio features: RMS energy over ``dim`` equal windows of the
    mono mix, L2-normalized."""
    mono = samples.astype(np.float64).mean(axis=1) if samples.ndim == 2 else samples.astype(np.float64)
    n = len(mono)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.linspace(0, n, dim + 1).astype(np.int64)
    out = np.zeros(dim, dtype=np.float64)
    sq = mono * mono
    csum = np.concatenate([[0.0], np.cumsum(sq)])
    for i in range(dim):
        lo, hi = edges[i], edges[i + 1]
        cnt = max(1, hi - lo)
        out[i] = np.sqrt((csum[hi] - csum[lo]) / cnt)
    nrm = np.linalg.norm(out)
    return (out / nrm if nrm > 0 else out).astype(np.float32)
