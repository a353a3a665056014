"""Multimodal (image) column operators.

Treats images as opaque ``binary`` columns with typed metadata (w, h,
fmt) per BASELINE.json ``input_hint``. The Spark-side plumbing — schema,
``mapInPandas`` batch shape, Arrow transfer, partition behavior — is
real and tested; the *codec* is the sandbox stand-in (no image libraries
in this container): header ``SGI1 | fmt u8 | w u16le | h u16le`` +
grayscale payload. ``png`` (fmt 0) is lossless; ``jpeg`` (fmt 1)
quantizes to even pixel values → decoded-pixel PSNR ≈ 51 dB, satisfying
the ≥40 dB lossy invariant. Swapping in a real codec (PIL / turbojpeg /
ffmpeg for frame sampling) only changes the two ``_codec_*`` functions —
every Spark-facing signature stays put.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HEADER = b"SGI1"
_FMTS = {0: "png", 1: "jpeg"}
_FMT_CODE = {"png": 0, "jpeg": 1}


def sgi_encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w) uint8 grayscale array. jpeg path is lossy
    (quantize-to-even)."""
    h, w = pixels.shape
    payload = pixels if fmt == "png" else (pixels & 0xFE)
    return (
        HEADER
        + bytes([_FMT_CODE[fmt]])
        + int(w).to_bytes(2, "little")
        + int(h).to_bytes(2, "little")
        + payload.astype(np.uint8).tobytes()
    )


def sgi_decode(blob: bytes) -> tuple:
    """→ ((h, w) uint8 array, fmt str). Raises on bad magic."""
    if blob[:4] != HEADER:
        raise NotImplementedError(
            "real image codecs unavailable in this container; only the "
            "SGI1 stand-in codec is decodable (see module docstring)"
        )
    fmt = _FMTS[blob[4]]
    w = int.from_bytes(blob[5:7], "little")
    h = int.from_bytes(blob[7:9], "little")
    pix = np.frombuffer(blob[9 : 9 + w * h], dtype=np.uint8).reshape(h, w)
    return pix, fmt


def sgi_try_decode(blob: bytes):
    """Total-function decode for quarantine paths: → (pixels, fmt, None)
    on success, (None, None, reason) on any malformed input —
    ``bad_magic`` (foreign/garbage header, unknown format code, or too
    short to carry one) or ``truncated`` (valid header, payload shorter
    than w*h). At the 100 TB design point some fraction of fetched blobs
    IS garbage; a scan stage must classify those rows, never throw."""
    if len(blob) < 9 or blob[:4] != HEADER or blob[4] not in _FMTS:
        return None, None, "bad_magic"
    fmt = _FMTS[blob[4]]
    w = int.from_bytes(blob[5:7], "little")
    h = int.from_bytes(blob[7:9], "little")
    if len(blob) < 9 + w * h:
        return None, None, "truncated"
    pix = np.frombuffer(blob[9 : 9 + w * h], dtype=np.uint8).reshape(h, w)
    return pix, fmt, None


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("dec_w", T.IntegerType()),
        T.StructField("dec_h", T.IntegerType()),
        T.StructField("dec_fmt", T.StringType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
    ]
)


def decode_stats(df: DataFrame) -> DataFrame:
    """Decode + per-image pixel stats via ``mapInPandas`` (one Arrow batch
    in, one out; pure per-partition work, embarrassingly parallel).

    mean/std are computed from EXACT integer pixel sums (sum and
    sum-of-squares fit well under 2^53, so ``s/n`` and
    ``sqrt((n*sq - s*s)/(n*n))`` are single correctly-rounded IEEE ops) —
    bit-identical to any engine restating the same formula, which is what
    lets the driver's DuckDB oracle hash-match this query."""

    def run(batches):
        import math

        for pdf in batches:
            out = {k: [] for k in ("image_id", "dec_w", "dec_h", "dec_fmt", "mean_px", "std_px")}
            for iid, blob in zip(pdf["image_id"], pdf["bytes"]):
                pix, fmt = sgi_decode(bytes(blob))
                n = pix.size
                s = int(pix.sum(dtype=np.int64))
                sq = int((pix.astype(np.int64) ** 2).sum(dtype=np.int64))
                out["image_id"].append(iid)
                out["dec_h"].append(pix.shape[0])
                out["dec_w"].append(pix.shape[1])
                out["dec_fmt"].append(fmt)
                out["mean_px"].append(s / n)
                out["std_px"].append(math.sqrt((n * sq - s * s) / (n * n)))
            yield pd.DataFrame(out)

    return df.select("image_id", "bytes").mapInPandas(run, _STATS_SCHEMA)


_ENCODE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)


def encode_pixels(df: DataFrame) -> DataFrame:
    """JVM-generated pixels → real binary column: (image_id,
    pixels:array<int> row-major, w, h, fmt) → (image_id, bytes) through
    the codec, via ``mapInPandas``. Lets a query synthesize images with
    SQL-expressible pixel formulas (so DuckDB can restate the expected
    decode output without ever seeing the bytes) while the Spark side
    still round-trips genuine encode → binary → Arrow → decode."""

    def run(batches):
        for pdf in batches:
            ids, blobs = [], []
            for iid, pixels, w, h, fmt in zip(
                pdf["image_id"], pdf["pixels"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                pix = np.asarray(pixels, dtype=np.int64).astype(np.uint8)
                ids.append(iid)
                blobs.append(sgi_encode(pix.reshape(int(h), int(w)), fmt))
            yield pd.DataFrame({"image_id": ids, "bytes": blobs})

    return df.select("image_id", "pixels", "w", "h", "fmt").mapInPandas(
        run, _ENCODE_SCHEMA
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
    ]
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h), re-encoded lossless.
    (A real pipeline swaps the kernel; the batch plumbing is the point.)"""

    def run(batches):
        for pdf in batches:
            ids, blobs = [], []
            for iid, blob in zip(pdf["image_id"], pdf["bytes"]):
                pix, _fmt = sgi_decode(bytes(blob))
                ys = (np.arange(out_h) * pix.shape[0] // out_h).astype(np.int64)
                xs = (np.arange(out_w) * pix.shape[1] // out_w).astype(np.int64)
                ids.append(iid)
                blobs.append(sgi_encode(pix[np.ix_(ys, xs)], "png"))
            yield pd.DataFrame(
                {"image_id": ids, "bytes": blobs, "w": out_w, "h": out_h}
            )

    return df.select("image_id", "bytes").mapInPandas(run, _RESIZE_SCHEMA)


def phash_udf_frame(df: DataFrame) -> DataFrame:
    """Recompute the 64-bit perceptual hash from decoded pixels (8x8
    block-mean thresholded at the image mean — must reproduce the
    corpus-side phash column bit-for-bit; tested)."""
    schema = T.StructType(
        [T.StructField("image_id", T.StringType()), T.StructField("phash2", T.LongType())]
    )

    def run(batches):
        for pdf in batches:
            ids, hashes = [], []
            for iid, blob in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = sgi_decode(bytes(blob))
                h, w = pix.shape
                blocks = pix.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
                bits = (blocks > pix.mean()).reshape(64)
                val = np.uint64(0)
                weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
                val = (bits.astype(np.uint64) * weights).sum(dtype=np.uint64)
                hashes.append(int(val.astype(np.int64)))
                ids.append(iid)
            yield pd.DataFrame({"image_id": ids, "phash2": hashes})

    return df.select("image_id", "bytes").mapInPandas(run, schema)


_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("dec_w", T.IntegerType()),
        T.StructField("dec_h", T.IntegerType()),
        T.StructField("dec_fmt", T.StringType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
        T.StructField("phash2", T.LongType()),
        T.StructField("byte_key", T.StringType()),
        T.StructField("err", T.StringType()),
    ]
)


def image_profile(df: DataFrame, on_error: str = "raise") -> DataFrame:
    """ONE decode pass → everything an image training-data pipeline
    gates on: dims/format, exact-integer mean/std (decode_stats's
    formulas), the 64-bit perceptual hash (phash_udf_frame's formula,
    bit-for-bit), and the exact-dup key (md5 of the raw bytes — hex
    matches ``F.md5``). At the 100 TB design point the decode is the
    dominant cost, so quality gating, exact dedup, and near-dup hashing
    must share a single scan: every later pipeline stage works on this
    slim profile row, never the bytes.

    ``on_error="quarantine"`` classifies malformed blobs instead of
    failing the task (the 100 TB posture — one corrupt row in a
    petabyte scan must become a quarantined row, not a dead job): such
    rows carry err='bad_magic'|'truncated', NULL stats/dims/phash, and
    still get their byte_key (the bytes exist; exact dedup of garbage
    is still dedup). The default ``raise`` keeps the strict contract
    for corpora that guarantee well-formed payloads."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine, got {on_error!r}")

    def run(batches):
        import hashlib

        for pdf in batches:
            cols = {k: [] for k in (
                "image_id", "dec_w", "dec_h", "dec_fmt",
                "mean_px", "std_px", "phash2", "byte_key", "err",
            )}
            for iid, blob in zip(pdf["image_id"], pdf["bytes"]):
                raw = bytes(blob)
                if on_error == "quarantine":
                    pix, fmt, err = sgi_try_decode(raw)
                    if err is not None:
                        cols["image_id"].append(iid)
                        cols["dec_w"].append(None)
                        cols["dec_h"].append(None)
                        cols["dec_fmt"].append(None)
                        cols["mean_px"].append(None)
                        cols["std_px"].append(None)
                        cols["phash2"].append(None)
                        cols["byte_key"].append(hashlib.md5(raw).hexdigest())
                        cols["err"].append(err)
                        continue
                else:
                    pix, fmt = sgi_decode(raw)
                h, w = pix.shape
                n = pix.size
                s = int(pix.sum(dtype=np.int64))
                sq = int((pix.astype(np.int64) ** 2).sum(dtype=np.int64))
                blocks = pix.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
                bits = (blocks > pix.mean()).reshape(64)
                weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
                val = (bits.astype(np.uint64) * weights).sum(dtype=np.uint64)
                cols["image_id"].append(iid)
                cols["dec_w"].append(w)
                cols["dec_h"].append(h)
                cols["dec_fmt"].append(fmt)
                cols["mean_px"].append(s / n)
                cols["std_px"].append(
                    float(np.sqrt((n * sq - s * s) / (n * n)))
                )
                cols["phash2"].append(int(val.astype(np.int64)))
                cols["byte_key"].append(hashlib.md5(raw).hexdigest())
                cols["err"].append(None)
            yield pd.DataFrame(cols)

    return df.select("image_id", "bytes").mapInPandas(run, _PROFILE_SCHEMA)


_EMBED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("img_vec", T.ArrayType(T.LongType())),
    ]
)


def block_embedding(df: DataFrame) -> DataFrame:
    """64-dim image embedding from decoded pixels: the EXACT integer sum
    of each cell of an 8×8 block grid, row-major (same grid the
    perceptual hash uses). Cosine between two of these is invariant to
    the per-image block area (all 64 blocks of one image have equal
    area), so the vector doubles as a resolution-independent content
    embedding. Exact int64 components are what let a cross-modal cosine
    over this embedding hash-match a DuckDB oracle bit-for-bit: dot and
    norms are integer sums, and only the final divide/sqrt touch floats.
    One ``mapInPandas`` decode pass, zero shuffle — the 100 TB shape is
    scan → slim (image_id, 64×int64) rows, bytes never leave the scan
    stage."""

    def run(batches):
        for pdf in batches:
            ids, vecs = [], []
            for iid, blob in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = sgi_decode(bytes(blob))
                h, w = pix.shape
                sums = (
                    pix.astype(np.int64)
                    .reshape(8, h // 8, 8, w // 8)
                    .sum(axis=(1, 3))
                    .reshape(64)
                )
                ids.append(iid)
                vecs.append([int(v) for v in sums])
            yield pd.DataFrame({"image_id": ids, "img_vec": vecs})

    return df.select("image_id", "bytes").mapInPandas(run, _EMBED_SCHEMA)


_PSNR_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_px", T.IntegerType()),
        T.StructField("err_sq", T.LongType()),
        T.StructField("mse", T.DoubleType()),
        T.StructField("psnr_db", T.DoubleType()),
        T.StructField("psnr_ok", T.BooleanType()),
    ]
)


def psnr_frame(df: DataFrame) -> DataFrame:
    """Per-row codec-fidelity audit (the input_hint invariant: decoded
    pixels within PSNR ≥ 40 dB of the source for lossy formats): decode
    the binary column, compare against the pre-encode ``pixels`` array
    carried on the same row, and emit the EXACT integer squared-error
    sum plus the derived mse/PSNR. err_sq and n_px are integers, mse is
    the single division err_sq/n_px, and psnr_db = 10*log10(255²·n/err)
    — one log10 over a correctly-rounded double, so an oracle restating
    the same formula matches to float precision. Lossless rows (err 0)
    report psnr_db NULL, psnr_ok true."""

    def run(batches):
        import math

        for pdf in batches:
            cols = {k: [] for k in (
                "image_id", "fmt", "n_px", "err_sq", "mse", "psnr_db", "psnr_ok",
            )}
            for iid, blob, pixels in zip(pdf["image_id"], pdf["bytes"], pdf["pixels"]):
                dec, fmt = sgi_decode(bytes(blob))
                src = np.asarray(pixels, dtype=np.int64).reshape(dec.shape)
                err = int(((src - dec.astype(np.int64)) ** 2).sum(dtype=np.int64))
                n = dec.size
                cols["image_id"].append(iid)
                cols["fmt"].append(fmt)
                cols["n_px"].append(n)
                cols["err_sq"].append(err)
                cols["mse"].append(err / n)
                db = None if err == 0 else 10.0 * math.log10(65025.0 * n / err)
                cols["psnr_db"].append(db)
                cols["psnr_ok"].append(err == 0 or db >= 40.0)
            yield pd.DataFrame(cols)

    return df.select("image_id", "bytes", "pixels").mapInPandas(run, _PSNR_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2, n_frames_col: str | None = None) -> DataFrame:
    """Video-style frame sampling: emit frame indices 0, every_n,
    2*every_n, ... up to the clip's frame count. Without a frame-count
    column each image row is a 1-frame clip (frame_idx 0 only — no real
    video codec in this sandbox; the partitioning/UDF/batch shape is the
    deliverable); pass n_frames_col to sample a synthetic multi-frame
    clip. Frame BYTES beyond index 0 are the index-0 bytes (documented
    stand-in for a decoder seek)."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("bytes", T.BinaryType()),
        ]
    )
    cols = ["image_id", "bytes"] + ([n_frames_col] if n_frames_col else [])

    def run(batches):
        for pdf in batches:
            rows = {"image_id": [], "frame_idx": [], "bytes": []}
            counts = pdf[n_frames_col] if n_frames_col else [1] * len(pdf)
            for iid, blob, nf in zip(pdf["image_id"], pdf["bytes"], counts):
                for idx in range(0, max(int(nf), 1), every_n):
                    rows["image_id"].append(iid)
                    rows["frame_idx"].append(idx)
                    rows["bytes"].append(bytes(blob))
            yield pd.DataFrame(rows)

    return df.select(*cols).mapInPandas(run, schema)
