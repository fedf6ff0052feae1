"""Streaming exact deduplication — the ingest-time form of
``operators.dedup.exact_duplicates`` for a continuously-arriving corpus
(the training-data pipeline's "drop re-crawled pages on arrival" stage).

Two state regimes:

- ``dedup_stream(..., ts_col=...)``: ``dropDuplicatesWithinWatermark``
  on the 128-bit content hash — state is bounded by the watermark
  horizon (re-crawls arriving within the horizon are dropped; a page
  re-seen after the horizon re-emits, which is the standard streaming
  trade-off). This is the 100-TB/continuous form: state size =
  |distinct hashes per horizon|, not |stream|.
- ``ts_col=None``: plain ``dropDuplicates`` — exact global dedup with
  unbounded state; only for bounded backfills drained with
  ``trigger(availableNow=True)``.

The hash is md5 (matching the batch operator and its DuckDB oracle), so
a backfill + streaming tail produce consistent keep-decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(docs: DataFrame, text_col: str = "text",
                 ts_col: str | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """First-seen-wins exact dedup over a (streaming or batch) docs
    frame. Adds ``text_hash``; emits one row per hash — with ``ts_col``
    in batch mode it is the earliest row by (ts, then the remaining
    ORDERABLE columns as tie-break). All-orderable schemas use a
    map-side-combinable min-struct aggregate (shuffles ~|unique hashes|
    partial aggregates, not rows); schemas with non-orderable columns
    (maps) fall back to a window, where rows identical on every
    orderable column may keep either representative — determinism holds
    up to orderable-column ties. Without ``ts_col`` there is no
    "first", so an arbitrary representative is the contract."""
    from pyspark.sql import Window
    from pyspark.sql.types import ArrayType, MapType, StructType

    def orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(orderable(f.dataType) for f in dt.fields)
        return True

    src = docs.withColumn("text_hash", F.md5(F.col(text_col)))
    if ts_col is None:
        return src.dropDuplicates(["text_hash"])
    src = src.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    if docs.isStreaming:
        return src.withWatermark(ts_col, watermark) \
                  .dropDuplicatesWithinWatermark(["text_hash"])
    # batch: keep the earliest row per hash. All-orderable schema → one
    # map-side-combinable min-struct aggregate (the shuffle carries
    # ~|unique hashes| partials, not rows — the 100 TB-relevant shape).
    # Any non-orderable column (map) → window fallback: the full row
    # survives (a min-struct over it would fail analysis), at the cost
    # of a full-row sort shuffle and arbitrary choice among rows tied on
    # every orderable column.
    other = [c for c in src.columns if c not in ("text_hash", ts_col)]
    if all(orderable(src.schema[c].dataType) for c in other):
        first = F.min(F.struct(F.col(ts_col),
                               *[F.col(c) for c in other])).alias("__first")
        return (
            src.groupBy("text_hash").agg(first)
            .select("text_hash", f"__first.{ts_col}",
                    *[F.col(f"__first.{c}").alias(c) for c in other])
            .select(*src.columns)
        )
    tiebreak = [F.col(c) for c in other
                if orderable(src.schema[c].dataType)]
    w = Window.partitionBy("text_hash").orderBy(F.col(ts_col), *tiebreak)
    return (
        src.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
    )
