"""Event sessionization — gap-based sessions over the events table.

Batch form: pure window functions (lag → gap flag → running sum →
groupBy), fully SQL-expressible and DuckDB-oracle-checked. Streaming
form: the same semantics as a custom stateful operator via
``applyInPandasWithState`` (state = last event ts + session counter per
user), demonstrating the Structured Streaming seam for stateful ops.

Scale notes: one shuffle on user_id (both forms); skewed mega-users are
bounded by session state size, not event count, in the streaming form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

SESSION_GAP_SEC = 1800


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Per-user gap sessionization:
    (user_id, session_seq, session_start, n_events, sum_value)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps load as TIMESTAMP_NTZ: cast via timestamp_ltz to
    # epoch seconds (gap *differences* are timezone-invariant)
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    prev = F.lag(epoch).over(w)
    new_sess = F.when(prev.isNull() | (epoch - prev > gap_sec), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    tagged = events.withColumn("session_seq",
                               F.sum(new_sess).over(run).cast("int"))
    return (
        tagged.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss")
             .alias("session_start"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
             .cast("double").alias("sum_value"),
        )
    )


def sql_sessionize(gap_sec: int = SESSION_GAP_SEC) -> str:
    """DuckDB oracle for sessionize() (same window algebra, independent
    engine)."""
    return f"""
  WITH o AS (
    -- floor(epoch(ts)): DuckDB's epoch() keeps sub-second fraction while
    -- the Spark side floors to whole seconds (timestamp->long cast); a
    -- fractional gap straddling the threshold would otherwise split a
    -- session in one engine only
    SELECT user_id, event_id, ts, value,
           CASE WHEN lag(floor(epoch(ts))) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR floor(epoch(ts)) - lag(floor(epoch(ts))) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) > {gap_sec}
                THEN 1 ELSE 0 END AS new_sess
    FROM events
  ),
  s AS (
    SELECT *, CAST(SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER)
      AS session_seq
    FROM o
  )
  SELECT user_id, session_seq,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM s GROUP BY user_id, session_seq"""


SESSION_STATE_SCHEMA = "last_ts long, session_seq int"
SESSION_OUT_SCHEMA = ("user_id long, session_seq int, n_events long, "
                      "sum_value double")


def sessionize_stream(events_stream: DataFrame,
                      gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState (custom
    stateful operator seam). Emits per-(user, session) partial aggregates
    each micro-batch; state carries (last_ts, session_seq) across
    batches."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts, seq = state.get
        else:
            last_ts, seq = None, 0
        rows = []
        cur = {"n": 0, "v": 0.0}

        def flush():
            if cur["n"]:
                rows.append((user_id, seq, cur["n"], cur["v"]))
                cur["n"], cur["v"] = 0, 0.0

        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, val in zip(pdf["ts"].astype("int64") // 10**9,
                               pdf["value"]):
                ts = int(ts)
                if last_ts is None or ts - last_ts > gap_sec:
                    flush()
                    seq += 1
                cur["n"] += 1
                cur["v"] += float(val)
                last_ts = ts
        flush()
        state.update((last_ts, seq))
        yield pd.DataFrame(rows, columns=["user_id", "session_seq",
                                          "n_events", "sum_value"])

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
