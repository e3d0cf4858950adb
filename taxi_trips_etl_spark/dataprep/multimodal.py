"""Multimodal (image/audio/video) column plumbing.

Design (BASELINE.json north-star): media travels as an opaque ``binary``
payload column next to typed metadata; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages so
each Python worker sees columnar batches, never single rows.

The actual codec work (PIL/ffmpeg/torchaudio) is NOT available in this
container, so the decode kernels are stubbed: :func:`extract_meta` is a
real, deterministic kernel (byte length, sha256, magic-byte sniffing)
used by tests and the oracle; :func:`decode_image` raises
``NotImplementedError`` unless handed the deterministic fake decoder.
The Spark-side plumbing — schema, batch iteration, partitioning — is
real and is what matters at 100 TB:

- payloads stay in executor-local Arrow buffers; only the extracted
  features shuffle;
- ``spark.sql.files.maxPartitionBytes`` bounds batch memory;
- metadata predicates (media_type, n_bytes) prune *before* any decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "n_bytes long, sha256 string, magic string"
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"GIF8": "gif",
}


def _sniff_magic(payload: bytes) -> str:
    for prefix, name in _MAGIC.items():
        if payload.startswith(prefix):
            return name
    return "unknown"


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped table from any source: payload = utf-8 bytes.

    Stands in for reading real image/audio blobs; keeps the binary
    column path (Arrow BinaryType) fully exercised.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def extract_meta(media: DataFrame) -> DataFrame:
    """mapInPandas metadata kernel: n_bytes, sha256, magic sniff.

    Deterministic and container-runnable — this is the template every
    real decode kernel follows (same batch iteration, same schema
    discipline).
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            pdf = pdf[["media_id", "media_type"]].copy()
            pdf["n_bytes"] = payloads.map(len).astype("int64")
            pdf["sha256"] = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            pdf["magic"] = payloads.map(lambda b: _sniff_magic(bytes(b)))
            yield pdf

    return media.mapInPandas(
        kernel, "media_id long, media_type string, n_bytes long, sha256 string, magic string"
    )


def fake_image_decoder(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode: pretends the
    payload is a (w × h) image derived from its bytes."""
    h = hashlib.md5(payload).digest()
    return {"width": 64 + h[0] % 64, "height": 64 + h[1] % 64, "channels": 3}


def decode_image(media: DataFrame, decoder: Callable[[bytes], dict] | None = None) -> DataFrame:
    """Image decode stage (STUB — no imaging libs in this container).

    Pass ``decoder=fake_image_decoder`` for tests; in production swap in
    a PIL/turbojpeg kernel with the identical signature. Raises
    ``NotImplementedError`` if no decoder is supplied, by design.
    """
    if decoder is None:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in "
            "this container; supply decoder=fake_image_decoder for tests"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(lambda b: decoder(bytes(b)))
            out = pdf[["media_id"]].copy()
            out["width"] = decoded.map(lambda d: d["width"]).astype("int64")
            out["height"] = decoded.map(lambda d: d["height"]).astype("int64")
            out["channels"] = decoded.map(lambda d: d["channels"]).astype("int64")
            yield out

    return media.mapInPandas(kernel, "media_id long, width long, height long, channels long")


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling stub: emits one row per sampled "frame" offset.

    Real video frame extraction is ffmpeg-bound; the Spark shape — a
    mapInPandas that EXPANDS rows (one media row → many frame rows) — is
    the part worth testing, and is real here.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload)
                for off in range(0, n, every_n_bytes):
                    chunk = bytes(payload[off : off + every_n_bytes])
                    rows.append(
                        (int(mid), int(off), hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_offset", "frame_hash"])

    return media.mapInPandas(kernel, "media_id long, frame_offset long, frame_hash string")


def extract_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """REAL feature-extraction kernel (no codec required): per-payload
    byte-value histogram (``byte >> 4`` → 16 buckets) via numpy over
    Arrow batches — the shape every embedding/feature extractor follows.

    Exact integer counts (no normalization) so the DuckDB oracle can
    reproduce them bit-for-bit. At 100 TB only the (media_id, 16 ints)
    rows ever shuffle; payloads stay in executor-local Arrow buffers.
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id"]].copy()
            mats = [
                np.bincount(
                    np.frombuffer(bytes(b), dtype=np.uint8) >> 4,
                    minlength=bins,
                )[:bins]
                if len(b)
                else np.zeros(bins, dtype=np.int64)
                for b in pdf["payload"]
            ]
            m = (
                np.vstack(mats)
                if mats
                else np.zeros((0, bins), dtype=np.int64)
            )
            for i in range(bins):
                out[f"c{i}"] = m[:, i].astype("int64")
            yield out

    schema = "media_id long, " + ", ".join(f"c{i} long" for i in range(bins))
    return media.mapInPandas(kernel, schema)


def resize_image(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Resize stage (STUB — no imaging libs in this container; same
    contract as :func:`decode_image`: supply ``decoder=
    fake_image_decoder`` for tests, swap a PIL kernel in production).

    The Spark-side shape is real and is what matters: binary in, binary
    out (``resized_payload``), fixed output dims, Arrow batches. The
    fake path emits a deterministic width×height byte buffer cycled
    from the source payload.
    """
    if decoder is None:
        raise NotImplementedError(
            "image resizing requires an imaging library not present in "
            "this container; supply decoder=fake_image_decoder for tests"
        )
    target = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id"]].copy()
            out["width"] = pd.Series([width] * len(pdf), index=pdf.index, dtype="int64")
            out["height"] = pd.Series([height] * len(pdf), index=pdf.index, dtype="int64")
            out["resized_payload"] = pdf["payload"].map(
                lambda b: (bytes(b) * (target // max(len(b), 1) + 1))[:target]
                if len(b)
                else b"\x00" * target
            )
            yield out

    return media.mapInPandas(
        kernel,
        "media_id long, width long, height long, resized_payload binary",
    )
