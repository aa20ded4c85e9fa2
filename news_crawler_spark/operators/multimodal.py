"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators. The decode kernels themselves are STUBBED (this container
ships no image/audio libraries) behind ``_decode_image_stub`` — a
deterministic fake keyed on the payload hash — but the Spark-side
contract is real and tested: schemas, batch shapes, partitioning, and
the UDF signatures are exactly what a PIL/ffmpeg-backed kernel would
drop into.

The crawl pipeline's media spans (kind='image', media_ref=url) feed
this stage: media_ref → fetched bytes (corpus join, same S2/S3 replay
shape) → decode/feature/resize/frame-sample.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "doc_id string, media_ref string, format string, width int, height int, "
    "n_bytes long, digest string"
)
FRAME_SAMPLE_SCHEMA = "doc_id string, media_ref string, frame_idx int, frame_sha1 string"

try:  # real-decode slot: used when Pillow is installed AND bytes decode
    from PIL import Image as _PILImage  # pragma: no cover
except ImportError:
    _PILImage = None


def _digest(payload: bytes) -> str:
    """Payload digest over the canonical lowercase-hex form — chosen so
    the DuckDB oracle reproduces it as ``sha256(md5(text))`` when the
    payload is ``unhex(md5(text))`` (DuckDB's sha256 takes VARCHAR)."""
    return hashlib.sha256(payload.hex().encode()).hexdigest()


def _decode_image(payload: bytes) -> tuple[str, int, int]:
    """Image decode: real Pillow when available and the bytes are a valid
    image; otherwise the deterministic stub (stable metadata derived from
    the payload digest) so the plumbing stays testable — and oracle-
    checkable — without the library."""
    if _PILImage is not None:
        import io

        try:
            im = _PILImage.open(io.BytesIO(payload))
            return (im.format or "unknown").lower(), im.width, im.height
        except Exception:
            pass  # not a decodable image → deterministic stub
    h = bytes.fromhex(_digest(payload))
    fmt = ["jpeg", "png", "webp"][h[0] % 3]
    return fmt, 64 + h[1] % 192, 64 + h[2] % 192


def image_metadata(media: DataFrame) -> DataFrame:
    """media(doc_id, media_ref, payload:binary) → typed image metadata.

    Arrow batches bound by spark.sql.execution.arrow.maxRecordsPerBatch;
    binary payloads never leave the executor as Python objects row-by-row.
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for doc_id, ref, payload in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                fmt, w, h = _decode_image(b)
                rows.append((doc_id, ref, fmt, w, h, len(b), _digest(b)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "format", "width", "height",
                         "n_bytes", "digest"],
            )

    return media.select("doc_id", "media_ref", "payload").mapInPandas(
        gen, schema=IMAGE_META_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 10, max_frames: int = 3) -> DataFrame:
    """Video frame sampling contract: payload → ≤max_frames frame refs.
    Real kernel: ffmpeg keyframe extraction; stub derives deterministic
    frame hashes. 1→N output shape (UDTF-like), same as listing parse."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for doc_id, ref, payload in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n = min(max_frames, 1 + len(b) % max_frames)
                for i in range(n):
                    fh = hashlib.sha1(b + f"|frame{i * every_n}".encode()).hexdigest()
                    rows.append((doc_id, ref, i * every_n, fh))
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_ref", "frame_idx", "frame_sha1"]
            )

    return media.select("doc_id", "media_ref", "payload").mapInPandas(
        gen, schema=FRAME_SAMPLE_SCHEMA
    )


def embed_image_stub(media: DataFrame, dim: int = 16) -> DataFrame:
    """Image→embedding contract (CLIP-shaped): payload → array<float>.
    Stub emits a deterministic pseudo-embedding from the payload hash."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                d = hashlib.sha256(b).digest()
                vec = [(d[i % 32] - 128) / 128.0 for i in range(dim)]
                rows.append((doc_id, vec))
            yield pd.DataFrame(rows, columns=["doc_id", "embedding"])

    return media.select("doc_id", "payload").mapInPandas(
        gen, schema="doc_id string, embedding array<float>"
    )
