"""Streaming ingestion dedup — exactly-once delivery on top of an
at-least-once transport.

The reference's watcher pipeline re-indexes a file when the OS delivers
a duplicate fs event (internal/watcher semantics: redundant work, same
result). At 100 TB the analogous problem is the ingest bus: Kafka /
file-drop sources re-deliver, and every duplicate document or event
costs a full pipeline pass. The standard Spark answer is keyed
deduplication with watermark-bounded state, which this module wraps.

Scale: state is one entry per key within the watermark horizon —
O(keys per `watermark_minutes` window) per executor, evicted by event
time. Without the watermark the state grows without bound; that is why
``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``) is the
only form offered here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    *,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark_minutes: int = 120,
) -> DataFrame:
    """Collapse redelivered rows to exactly-once by ``key_cols``.

    Rows sharing a key are assumed IDENTICAL in payload (the
    at-least-once contract), so whichever copy is retained, the output
    is well-defined — which is what makes the result oracle-checkable.
    A duplicate arriving later than ``watermark_minutes`` after the
    original's event time may be re-emitted (its state was evicted);
    pick the horizon from the transport's redelivery bound, not from
    data skew.
    """
    return events.withWatermark(
        ts_col, f"{watermark_minutes} minutes"
    ).dropDuplicatesWithinWatermark(list(key_cols))
