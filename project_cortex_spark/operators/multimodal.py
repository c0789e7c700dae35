"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-parity operators for the 100 TB training-data pipeline (the
reference is code/text-only): media rides in a ``binary`` column with a
typed metadata header; decode / feature-extract / resize / frame-sample
are Arrow-batched ``mapInPandas`` stages so each task streams record
batches of bytes through numpy without materializing the whole partition.

The pixel/sample CODEC is stubbed (no image/audio libs in this
container): payloads use a deterministic fake container format
``IMG:{w}x{h};<bytes>`` and "decoding" parses the header + computes real
byte-level statistics with numpy. The Spark-side plumbing — schemas,
binary handling, batch iteration, output shapes, partitioning — is real
and tested; swapping in PIL/ffmpeg happens inside one function body
(see ``decode_image_real``).

Scale notes: all stages are narrow maps — no shuffle. Binary columns
make task sizing the knob that matters: keep
``spark.sql.files.maxPartitionBytes`` at 128-256 MB so a task's Arrow
batches fit executor memory, and never collect payloads to the driver.
Feature vectors (``array<float>``) feed the knn/dedup operators
directly, which is where shuffles happen — on the small derived columns,
not the bytes.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEADER_RE = re.compile(rb"^IMG:(\d+)x(\d+);")

DECODED_SCHEMA = (
    "media_id long, kind string, width long, height long, n_bytes long, "
    "mean_byte double"
)
FEATURES_SCHEMA = "media_id long, features array<float>"
FRAMES_SCHEMA = "media_id long, frame_idx long, frame binary"
RESIZED_SCHEMA = (
    "media_id long, width long, height long, payload binary"
)


def synthesize_media(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Deterministic fake media over the documents table: a fake
    container header + the utf-8 text as payload bytes. Stands in for
    ``spark.read.format(\"binaryFile\")`` over a media lake."""
    w = (F.col(id_col) % 16 + 1) * 16
    h = (F.col(id_col) % 8 + 1) * 16
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    header = F.concat(F.lit("IMG:"), w, F.lit("x"), h, F.lit(";"))
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.concat(header, F.col(text_col)), "utf-8").alias("payload"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Parse the container header and compute byte statistics — the
    decode stage's plumbing with a stub codec (real: hand bytes to
    PIL/soundfile here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                buf = bytes(payload)
                m = HEADER_RE.match(buf)
                w, hgt = (int(m.group(1)), int(m.group(2))) if m else (0, 0)
                body = np.frombuffer(buf[m.end():] if m else buf, dtype=np.uint8)
                rows.append(
                    (
                        mid,
                        kind,
                        w,
                        hgt,
                        len(buf),
                        float(body.mean()) if body.size else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height", "n_bytes", "mean_byte",
                ],
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, *, dim: int = 32) -> DataFrame:
    """Byte-histogram feature vector (L2-normalized array<float>) — the
    feature-extract stage; output plugs straight into knn/dedup."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                body = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(body % dim, minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                if norm > 0:
                    hist /= norm
                ids.append(mid)
                feats.append(hist.astype(np.float32))
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_media(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize stub: output payload is truncated/cyclically padded to
    width*height bytes (a real resampler replaces the numpy line only)."""
    n = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                body = np.frombuffer(bytes(payload), dtype=np.uint8)
                if body.size == 0:
                    out = np.zeros(n, dtype=np.uint8)
                else:
                    out = np.resize(body, n)  # deterministic stub resample
                rows.append((mid, width, height, out.tobytes()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "payload"]
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, *, frame_size: int = 256,
                 every_n: int = 4) -> DataFrame:
    """Video frame sampling stub: treat the payload as fixed-size frames
    and keep every ``every_n``-th — one output row per kept frame (the
    explode shape a real ffmpeg-backed sampler would produce)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                n_frames = len(buf) // frame_size
                for i in range(0, n_frames, every_n):
                    rows.append((mid, i, buf[i * frame_size:(i + 1) * frame_size]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def decode_image_real(media: DataFrame) -> DataFrame:
    """Seam for a real codec-backed decode. Raises unless an imaging
    library is available in the executors' environment."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - no PIL in this container
        raise NotImplementedError(
            "real image decode requires an imaging library on executors; "
            "use decode_media (stub codec) in this environment"
        ) from e
    raise NotImplementedError("wire PIL decode here when the dependency lands")
