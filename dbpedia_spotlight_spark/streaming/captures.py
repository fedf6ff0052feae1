"""Streaming recrawl dedup — the ingest-time form of
``operators.webstats.latest_capture`` for a continuously-arriving
capture log (input_hint shape: (url, warc_ts) Common-Crawl pages,
popular urls re-crawled many times).

A global "newest capture so far per url" needs unbounded state and
retractions, so the streaming contract is windowed: within each
event-time tumbling window, emit the newest capture per url once the
watermark closes the window. Downstream consumers (annotate, dedup,
model build) then see at most one capture per url per window — the
per-window refresh cadence a 10^12-doc crawl actually wants.

State size = |open windows × urls seen in them|, bounded by the
watermark horizon; the shuffle key is (window, url) with a map-side
partial max, so a url recrawled 10^4 times inside a window sends one
partial row per map task — the same no-hot-url-sort property as the
batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def latest_capture_windowed(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tiebreak_col: str | None = None,
    window_len: str = "1 hour",
    late_threshold: str = "2 hours",
) -> DataFrame:
    """Newest capture per (tumbling event-time window, url). Works on
    both batch and streaming frames (batch ignores the watermark), so
    a backfill and the streaming tail produce identical rows.

    Output: ``window_start`` + the input columns (``ts_col`` is the
    kept capture's timestamp, not the window bound). Ties on ``ts_col``
    break by ``tiebreak_col`` (largest wins) exactly as in the batch
    operator."""
    src = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    if docs.isStreaming:
        src = src.withWatermark(ts_col, late_threshold)
    payload = [c for c in src.columns
               if c not in (url_col, ts_col, tiebreak_col)]
    lead = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    kept = (
        src.groupBy(F.window(ts_col, window_len).alias("w"), url_col)
        .agg(F.max(F.struct(*lead, *payload)).alias("m"))
    )
    return kept.select(
        F.col("w.start").alias("window_start"),
        url_col,
        *[F.col(f"m.{c}").alias(c) for c in lead + payload],
    )
