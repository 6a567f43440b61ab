"""Multimodal binary-column plumbing: schema contracts, mapInPandas batch
shape, decode-error paths, frame sampling, dedup keys."""

import struct
import zlib

import pytest

from cascalog_spark.functions.multimodal import (extract_media_metadata,
                                                 media_dedup_keys,
                                                 register_codec,
                                                 sample_frames)
from cascalog_spark.functions import exact_dedup


def _png(w, h):
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_data = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    ihdr = (struct.pack(">I", len(ihdr_data)) + b"IHDR" + ihdr_data
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data)))
    return sig + ihdr + b"\x00" * 64


def _wav(rate=16000, channels=1, seconds=2):
    bits = 16
    data = b"\x00" * (rate * channels * (bits // 8) * seconds)
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                   rate * channels * bits // 8,
                                   channels * bits // 8, bits)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def test_image_metadata(spark):
    rows = [(1, _png(640, 480)), (2, _png(100, 200)),
            (3, b"not an image"), (4, None)]
    df = spark.createDataFrame(rows, ["media_id", "content"])
    out = extract_media_metadata(df, "image")
    got = {r.media_id: r for r in out.collect()}
    assert (got[1].format, got[1].width, got[1].height) == ("png", 640, 480)
    assert (got[2].width, got[2].height) == (100, 200)
    assert got[3].format is None and "ValueError" in got[3].decode_error
    assert got[3].n_bytes == 12 and got[3].content_sha1 is not None
    assert got[4].n_bytes is None and got[4].decode_error is None


def test_audio_metadata(spark):
    df = spark.createDataFrame([(1, _wav(16000, 1, 2))], ["media_id", "content"])
    out = extract_media_metadata(df, "audio").collect()[0]
    assert out.format == "wav" and out.sample_rate == 16000
    assert out.channels == 1 and abs(out.duration_sec - 2.0) < 0.01


def test_video_requires_registered_codec(spark):
    df = spark.createDataFrame([(1, b"\x00\x00\x00\x18ftypmp42")],
                               ["media_id", "content"])
    out = extract_media_metadata(df, "video").collect()[0]
    assert "NotImplementedError" in out.decode_error

    register_codec("video", lambda b: {"format": "mp4", "width": 1,
                                       "height": 1})
    try:
        out2 = extract_media_metadata(df, "video").collect()[0]
        assert out2.format == "mp4" and out2.decode_error is None
    finally:
        from cascalog_spark.functions import multimodal
        multimodal._CODECS.pop("video", None)


def test_frame_sampling_multiplies_rows(spark):
    big = bytes(range(256)) * 1024  # 256 KiB
    df = spark.createDataFrame([(1, big), (2, b"tiny")],
                               ["media_id", "content"])
    out = sample_frames(df, every_n_bytes=1 << 16, max_frames=3)
    got = sorted((r.media_id, r.frame_idx, len(r.frame_bytes))
                 for r in out.collect())
    assert got == [(1, 0, 65536), (1, 1, 65536), (1, 2, 65536),
                   (2, 0, 4)]


def test_media_exact_dedup(spark):
    img = _png(10, 10)
    df = spark.createDataFrame(
        [(1, img), (2, img), (3, _png(11, 11))], ["media_id", "content"])
    keyed = media_dedup_keys(df)
    out = exact_dedup(keyed.select("content_sha1", "media_id"),
                      ["content_sha1"], "media_id")
    got = sorted((r.keep_id, r.n_dups) for r in out.collect())
    assert got == [(1, 2), (3, 1)]


def test_video_codec_metadata_schema(spark):
    """kind='video' gets its own schema — registered codec dimensions are
    kept, unknown kinds are rejected."""
    from cascalog_spark.functions.multimodal import (extract_media_metadata,
                                                     register_codec)

    register_codec("video", lambda b: {"format": "mp4", "width": 640,
                                       "height": 480})
    vdf = spark.createDataFrame([(1, bytearray(b"xx"))],
                                "id long, content binary")
    row = extract_media_metadata(vdf, kind="video").collect()[0]
    assert (row["format"], row["width"], row["height"]) == ("mp4", 640, 480)
    with pytest.raises(ValueError, match="unknown media kind"):
        extract_media_metadata(vdf, kind="hologram")


def test_media_phash_perceptual_near_dup(spark):
    """pHash: identical bytes → identical hash; a small local perturbation
    (a re-encode stand-in) stays within a small hamming radius; unrelated
    content does not pair.  The DCT low-frequency math is real — only the
    decode is the deterministic fake."""
    import random

    from cascalog_spark.functions import media_phash, media_phash_near_dups

    rng = random.Random(9)
    base = bytes(rng.randrange(256) for _ in range(4096))
    near = bytearray(base)
    for _ in range(8):                       # small local corruption
        near[rng.randrange(len(near))] ^= 0x01
    other = bytes(rng.randrange(256) for _ in range(4096))
    rows = [(1, base), (2, base), (3, bytes(near)), (4, other)]
    df = spark.createDataFrame(rows, "mid long, content binary")

    h = {r.mid: r.phash for r in media_phash(df).collect()}
    assert h[1] == h[2]                      # exact copy → exact hash
    assert h[1] != h[4]

    pairs = {(r.id_a, r.id_b): r.hamming
             for r in media_phash_near_dups(df, "mid",
                                            max_hamming=12).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 12   # perturbed copy found
    assert all(4 not in p for p in pairs)            # unrelated stays out


def test_media_phash_null_and_registered_decoder(spark):
    from cascalog_spark.functions import media_phash
    from cascalog_spark.functions.multimodal import _CODECS

    df = spark.createDataFrame([(1, None), (2, b"\x00" * 64)],
                               "mid long, content binary")
    got = {r.mid: r.phash for r in media_phash(df).collect()}
    assert got[1] is None and isinstance(got[2], int)

    # a registered real decoder takes precedence over the fake
    import numpy as np
    _CODECS["image_gray"] = lambda b: np.full((32, 32), len(b), float)
    try:
        h = media_phash(df).where("mid = 2").first().phash
        assert isinstance(h, int)  # constant image → all-equal DCT tail
    finally:
        del _CODECS["image_gray"]

# -- real-pixel PNGs through the stdlib decoder (png_gray32) -----------------


def _png_real(gray):
    """Encode a uint8 grayscale matrix as a real (filter-0) PNG."""
    import numpy as np

    g = np.asarray(gray, dtype="uint8")
    h, w = g.shape
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(h))

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_gray32_decodes_real_pixels():
    """The stdlib decoder must reproduce the encoded pixel values exactly
    (filter-0 rows, no resize when the image is already 32x32), and undo
    Up/Sub filters."""
    import numpy as np

    from cascalog_spark.functions import png_gray32

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    got = png_gray32(_png_real(img))
    assert np.array_equal(got, img.astype(float))
    # resize path: a 64x64 image of 2x2 constant blocks box-means back
    # to the exact 32x32 block values
    big = np.kron(img, np.ones((2, 2), dtype=np.uint8))
    assert np.array_equal(png_gray32(_png_real(big)), img.astype(float))
    # filtered rows (Up=2 on every row after the first) decode the same:
    # re-encode with filter 2 by deltaing rows
    rows = [b"\x00" + img[0].tobytes()]
    for y in range(1, 32):
        rows.append(b"\x02" + ((img[y] - img[y - 1]) % 256)
                    .astype(np.uint8).tobytes())

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    up_png = (b"\x89PNG\r\n\x1a\n"
              + chunk(b"IHDR", struct.pack(">IIBBBBB", 32, 32, 8, 0, 0,
                                           0, 0))
              + chunk(b"IDAT", zlib.compress(b"".join(rows)))
              + chunk(b"IEND", b""))
    assert np.array_equal(png_gray32(up_png), img.astype(float))
    with pytest.raises(ValueError, match="not a PNG"):
        png_gray32(b"JUNK")


def test_media_phash_on_real_pixels(spark):
    """pHash over ACTUAL image pixels via the registered stdlib PNG
    decoder: a +40-brightness re-encode hashes identically (pHash drops
    the DC term), a downscaled re-encode stays within a small hamming
    radius, random noise does not pair."""
    import numpy as np

    from cascalog_spark.functions import (media_phash,
                                          media_phash_near_dups,
                                          png_gray32, register_codec)
    from cascalog_spark.functions.multimodal import _CODECS

    rng = np.random.default_rng(42)
    # box-blurred noise: smooth but SPECTRALLY RICH — pHash needs the
    # low-frequency coefficients spread away from their median (a pure
    # gradient scene leaves ~50/63 coefficients within rounding noise
    # of the median and the hash flips on ±0.5 resize rounding)
    raw = rng.normal(0, 1, (64, 64))
    k = np.ones(9) / 9.0
    bl = np.apply_along_axis(
        lambda r: np.convolve(r, k, mode="same"), 1, raw)
    bl = np.apply_along_axis(
        lambda c: np.convolve(c, k, mode="same"), 0, bl)
    scene = ((bl - bl.min()) / (bl.ptp() or 1) * 180 + 20
             ).astype(np.uint8)
    brighter = (scene + 40).clip(0, 255).astype(np.uint8)
    smaller = (scene.reshape(32, 2, 32, 2).mean(axis=(1, 3))
               .round().astype(np.uint8))           # 32x32 box downscale
    noise = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    rows = [(1, _png_real(scene)), (2, _png_real(brighter)),
            (3, _png_real(smaller)), (4, _png_real(noise))]
    df = spark.createDataFrame(rows, "mid long, content binary")
    register_codec("image_gray", png_gray32)
    try:
        h = {r.mid: r.phash for r in media_phash(df).collect()}
        ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
        assert ham(h[1], h[2]) == 0      # brightness shift = DC only
        assert ham(h[1], h[3]) <= 10     # resize keeps low frequencies
        assert ham(h[1], h[4]) > 16      # unrelated content far away
        pairs = {(r.id_a, r.id_b)
                 for r in media_phash_near_dups(df, "mid",
                                                max_hamming=10).collect()}
        assert (1, 2) in pairs and (1, 3) in pairs
        assert all(4 not in p for p in pairs)
    finally:
        del _CODECS["image_gray"]
