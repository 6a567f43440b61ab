"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema contracts, partition-parallel batch
iteration, UDF signatures, output shapes — is real and tested.  The actual
codec calls (PIL/librosa/ffmpeg) are NOT available in this container, so the
decode kernels are pluggable: ``register_codec`` installs a real decoder;
the default is a deterministic metadata-only "fake codec" that parses
lightweight container headers (PNG/JPEG/WAV) from the raw bytes — enough to
exercise the full pipeline shape end-to-end.

Scale design: one ``mapInPandas`` pass per stage (no per-row Python), binary
payloads never collected to the driver, output is columnar metadata +
optional derived binary (thumbnails, frames) that stays distributed.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# codec registry

_CODECS: dict[str, Callable] = {}


def register_codec(kind: str, fn: Callable) -> None:
    """Install a real decoder for ``kind`` ('image' | 'audio' | 'video').

    ``fn(content: bytes) -> dict`` returning the kind's metadata fields.
    """
    _CODECS[kind] = fn


def _codec(kind: str) -> Callable:
    if kind in _CODECS:
        return _CODECS[kind]
    return _HEADER_PARSERS[kind]


# -- deterministic header-only "fake codecs" (no media libs needed) ----------


def _parse_image_header(content: bytes) -> dict:
    """PNG/JPEG/GIF dimensions from container headers; raises ValueError on
    unknown formats (exercises the error path the way a real codec would)."""
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", content[16:24])
        return {"format": "png", "width": int(w), "height": int(h)}
    if content[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(content):
            if content[i] != 0xFF:
                break
            marker = content[i + 1]
            seglen = struct.unpack(">H", content[i + 2:i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack(">HH", content[i + 5:i + 9])
                return {"format": "jpeg", "width": int(w), "height": int(h)}
            i += 2 + seglen
        raise ValueError("jpeg: no SOF marker")
    if content[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", content[6:10])
        return {"format": "gif", "width": int(w), "height": int(h)}
    raise ValueError(f"unknown image format (magic={content[:4]!r})")


def _parse_audio_header(content: bytes) -> dict:
    """WAV header parse (sample rate / channels / duration)."""
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        channels, rate = struct.unpack("<HI", content[22:28])
        bits = struct.unpack("<H", content[34:36])[0]
        data_size = max(len(content) - 44, 0)
        dur = data_size / max(rate * channels * (bits // 8), 1)
        return {"format": "wav", "sample_rate": int(rate),
                "channels": int(channels), "duration_sec": float(round(dur, 6))}
    raise ValueError(f"unknown audio format (magic={content[:4]!r})")


def _parse_video_header(content: bytes) -> dict:
    raise NotImplementedError(
        "video decode requires ffmpeg — register a codec via "
        "register_codec('video', fn)")


_HEADER_PARSERS = {"image": _parse_image_header, "audio": _parse_audio_header,
                   "video": _parse_video_header}


# ---------------------------------------------------------------------------
# schema contracts

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_sha1", T.StringType()),
    T.StructField("decode_error", T.StringType()),
])

AUDIO_META_SCHEMA = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("duration_sec", T.DoubleType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("decode_error", T.StringType()),
])


VIDEO_META_SCHEMA = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_sec", T.DoubleType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("decode_error", T.StringType()),
])

META_SCHEMAS = {"image": IMAGE_META_SCHEMA, "audio": AUDIO_META_SCHEMA,
                "video": VIDEO_META_SCHEMA}


def _meta_cols(schema: T.StructType) -> list[str]:
    return [f.name for f in schema.fields]


# ---------------------------------------------------------------------------
# operators


def extract_media_metadata(df: DataFrame, kind: str = "image",
                           content_col: str = "content",
                           id_cols: Optional[list[str]] = None) -> DataFrame:
    """Decode headers of a binary media column → typed metadata columns.

    mapInPandas over Arrow batches: bytes never leave the executor, decode
    errors land in ``decode_error`` instead of failing the job (trap-style).
    """
    id_cols = id_cols if id_cols is not None else \
        [c for c in df.columns if c != content_col]
    meta_schema = META_SCHEMAS.get(kind)
    if meta_schema is None:
        raise ValueError(f"unknown media kind {kind!r}; register a schema in "
                         f"META_SCHEMAS (have: {sorted(META_SCHEMAS)})")
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + list(meta_schema.fields))
    codec = _codec(kind)
    meta_names = _meta_cols(meta_schema)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                content = row[content_col]
                rec = {c: row[c] for c in id_cols}
                rec.update({m: None for m in meta_names})
                if content is not None:
                    b = bytes(content)
                    rec["n_bytes"] = len(b)
                    if "content_sha1" in meta_names:
                        rec["content_sha1"] = hashlib.sha1(b).hexdigest()
                    try:
                        rec.update(codec(b))
                        rec["decode_error"] = None
                    except Exception as e:
                        rec["decode_error"] = f"{type(e).__name__}: {e}"
                out_rows.append(rec)
            yield pd.DataFrame(out_rows,
                               columns=[f.name for f in out_schema.fields])

    return df.select(*id_cols, content_col).mapInPandas(process, out_schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 1 << 16,
                  max_frames: int = 4, content_col: str = "content",
                  id_cols: Optional[list[str]] = None) -> DataFrame:
    """Frame-sampling plumbing: emit ≤max_frames byte-slices per media row
    (1 row in → n rows out, the video-frame extraction shape).  The slice
    step stands in for a real ffmpeg keyframe extract — swap via codec
    registration; partitioning/batching/output schema are the real thing."""
    id_cols = id_cols if id_cols is not None else \
        [c for c in df.columns if c != content_col]
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [T.StructField("frame_idx", T.IntegerType()),
           T.StructField("frame_bytes", T.BinaryType())])

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = row[content_col]
                if content is None:
                    continue
                b = bytes(content)
                for i in range(min(max_frames,
                                   max(1, len(b) // every_n_bytes))):
                    rec = {c: row[c] for c in id_cols}
                    rec["frame_idx"] = i
                    rec["frame_bytes"] = b[i * every_n_bytes:
                                           (i + 1) * every_n_bytes]
                    rows.append(rec)
            yield pd.DataFrame(rows,
                               columns=[f.name for f in out_schema.fields])

    return df.select(*id_cols, content_col).mapInPandas(process, out_schema)


def media_dedup_keys(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Exact-bytes dedup key for media: sha1 over the binary column — native
    Column expr (no Python), ready for exact_dedup()."""
    return df.withColumn("content_sha1", F.sha1(F.col(content_col)))


# ---------------------------------------------------------------------------
# perceptual near-dup (pHash)


def _fake_gray32(content: bytes):
    """Deterministic stand-in for 'decode + grayscale + resize to 32x32':
    byte values tiled/truncated into a 32x32 float matrix.  Swap in a real
    decoder via ``register_codec('image_gray', fn)`` where
    ``fn(content: bytes) -> 32x32 array-like``."""
    import numpy as np

    b = np.frombuffer(content, dtype=np.uint8)
    if b.size == 0:
        b = np.zeros(1, dtype=np.uint8)
    reps = -(-1024 // b.size)  # ceil
    return np.tile(b, reps)[:1024].astype(np.float64).reshape(32, 32)


def png_gray32(content: bytes):
    """REAL pixel decode for the pHash path, stdlib-only: parse PNG
    chunks, inflate IDAT with ``zlib``, undo the per-scanline filters
    (None/Sub/Up/Average/Paeth), convert to luma, box-resize to 32x32.
    Supports 8-bit non-interlaced grayscale and RGB PNGs — enough to run
    the perceptual hash on actual pixels with zero native media deps;
    a production deployment registers PIL/turbojpeg instead:
    ``register_codec('image_gray', fn)``.

    The filter undo walks pixels in Python for Sub/Average/Paeth rows
    (a test-scale decoder, not a throughput path — encoders typically
    emit filter 0/2 for synthetic images, which stay vectorized)."""
    import struct
    import zlib

    import numpy as np

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("png_gray32: not a PNG")
    pos, idat, hdr = 8, b"", None
    while pos + 8 <= len(content):
        ln, typ = struct.unpack(">I4s", content[pos:pos + 8])
        data = content[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if hdr is None:
        raise ValueError("png_gray32: missing IHDR")
    w, h, depth, ctype, _comp, _filt, inter = hdr
    if depth != 8 or inter != 0 or ctype not in (0, 2):
        raise ValueError("png_gray32: only 8-bit non-interlaced "
                         f"gray/RGB supported (depth={depth}, "
                         f"color_type={ctype}, interlace={inter})")
    ch = 1 if ctype == 0 else 3
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("png_gray32: truncated pixel data")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    o = 0
    for y in range(h):
        f = raw[o]
        cur = np.frombuffer(raw[o + 1:o + 1 + stride],
                            dtype=np.uint8).copy()
        o += 1 + stride
        if f == 2:                      # Up (vectorized, mod-256)
            cur += prev
        elif f in (1, 3, 4):            # Sub / Average / Paeth
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 1:
                    cur[x] = (int(cur[x]) + a) & 0xFF
                elif f == 3:
                    cur[x] = (int(cur[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    cur[x] = (int(cur[x]) + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"png_gray32: unknown filter {f}")
        img[y] = cur
        prev = cur
    px = img.reshape(h, w, ch).astype(np.float64)
    gray = px[..., 0] if ch == 1 else (
        0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2])
    # deterministic box resize to 32x32 (area mean per target cell)
    ys = (np.arange(33) * h) // 32
    xs = (np.arange(33) * w) // 32
    out = np.empty((32, 32))
    for i in range(32):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(32):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = gray[y0:y1, x0:x1].mean()
    return out


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis (the pHash transform) — plain numpy."""
    import numpy as np

    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    m[0] /= np.sqrt(2)
    return m * np.sqrt(2.0 / n)


def media_phash(df: DataFrame, content_col: str = "content",
                out_col: str = "phash") -> DataFrame:
    """64-bit PERCEPTUAL hash per media row (classic pHash): decode to a
    32x32 grayscale matrix (pluggable — the in-container default is a
    deterministic byte-tiling fake), 2-D DCT, keep the low-frequency 8x8
    block (DC dropped), threshold against its median → 64 bits.

    The hash math (DCT + median threshold) is REAL; only the decode is a
    stub.  Arrow-batched ``mapInPandas``, one matrix multiply pair per
    row, binary never leaves the executor.  Pair with
    ``dedup.hamming_near_dups`` for blocked perceptual near-dup joins —
    visually-similar media differ in a few low-frequency bits, so small
    hamming radii find re-encodes/resizes."""
    import numpy as np

    decode = _CODECS.get("image_gray", _fake_gray32)
    id_cols = [c for c in df.columns if c != content_col]
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [T.StructField(out_col, T.LongType())])
    D = _dct_matrix(32)

    def process(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                content = row[content_col]
                if content is None:
                    out.append(None)
                    continue
                g = np.asarray(decode(bytes(content)), dtype=np.float64)
                d = (D @ g @ D.T)[:8, :8].flatten()
                d = d[1:]  # drop DC — overall brightness
                bits = d > np.median(d)
                v = 0
                for bit in bits:
                    v = (v << 1) | int(bit)
                if v >= 1 << 63:
                    v -= 1 << 64
                out.append(v)
            res = pdf[id_cols].copy()
            res[out_col] = pd.Series(out, index=pdf.index, dtype="object")
            yield res

    return df.mapInPandas(process, out_schema)


def media_phash_near_dups(df: DataFrame, id_col: str,
                          content_col: str = "content",
                          max_hamming: int = 8) -> DataFrame:
    """Perceptual near-dup pairs over a binary media column: pHash +
    pigeonhole-blocked hamming join (never all-pairs)."""
    from .dedup import hamming_near_dups

    h = media_phash(df.select(id_col, content_col), content_col, "phash")
    return hamming_near_dups(h, id_col, "phash", max_hamming)
