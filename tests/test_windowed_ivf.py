"""Watermarked streaming window ≡ batch rollup; IVF ANN recall vs brute
force; jaccard long-key join equals string-key semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    from dbpedia_spotlight_spark.streaming.windowed import windowed_event_counts
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events")
    ev.write.mode("overwrite").parquet(src)

    batch = windowed_event_counts(ev)
    stream = windowed_event_counts(
        spark.readStream.schema(ev.schema).parquet(src))
    assert stream.isStreaming
    q = (stream.writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "out"))
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    # append mode emits a window only once the watermark passes its end:
    # the final <threshold+window> of event time stays open and is
    # (correctly) withheld when the stream drains
    assert a <= b
    max_ts = ev.agg(F.max("ts")).first()[0]
    import datetime
    horizon = max_ts - datetime.timedelta(hours=3)  # 2h watermark + 1h window
    for row in b - a:
        start = datetime.datetime.strptime(row[0], "%Y-%m-%d %H:%M:%S")
        assert start >= horizon, f"non-late window withheld: {row}"
    assert len(a) >= 0.9 * len(b)


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics, not just the nothing-late drain: with
    maxFilesPerTrigger=1 the watermark advances between micro-batches,
    so an event older than (max seen ts − threshold) arriving in batch 2
    must be DROPPED from its (already finalized) window — the bounded
    state contract the 100-TB streaming story depends on."""
    import datetime as dt
    from dbpedia_spotlight_spark.streaming.windowed import (
        windowed_event_counts,
    )

    schema = "event_id long, user_id long, event_type string, " \
             "ts timestamp_ntz, value double"
    t = dt.datetime(2024, 1, 1, 0, 30)
    batch1 = spark.createDataFrame(
        [(1, 1, "click", t, 1.0),
         (2, 1, "click", t.replace(hour=6, minute=0), 1.0)], schema)
    batch2 = spark.createDataFrame(
        # ts 00:40 < watermark (06:00 − 2h = 04:00) → late, dropped;
        # 06:10 is fresh (its window stays open and is withheld at drain)
        [(3, 1, "click", t.replace(minute=40), 1.0),
         (4, 1, "click", t.replace(hour=6, minute=10), 1.0)], schema)
    src = str(tmp_path / "ev")

    def drain():
        stream = windowed_event_counts(
            spark.readStream.schema(schema).parquet(src))
        q = (stream.writeStream.format("parquet")
             .option("path", str(tmp_path / "out"))
             .option("checkpointLocation", str(tmp_path / "ck"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    # two availableNow drains over ONE checkpoint: the watermark learned
    # in drain 1 (06:00 − 2h = 04:00) persists into drain 2
    batch1.coalesce(1).write.mode("overwrite").parquet(src)
    drain()
    batch2.coalesce(1).write.mode("append").parquet(src)
    drain()
    got = {(r.hour, r.n_events)
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    # the 00:00 window was finalized with ONE event — the late 00:40 row
    # from batch 2 must not have been added
    assert ("2024-01-01 00:00:00", 1) in got
    assert ("2024-01-01 00:00:00", 2) not in got


def test_windowed_counts_match_events_hourly_oracle(spark):
    """The window() form must agree with the date_trunc batch rollup."""
    from dbpedia_spotlight_spark import queries as Q
    from dbpedia_spotlight_spark.streaming.windowed import windowed_event_counts
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = {tuple(r) for r in windowed_event_counts(ev).collect()}
    b = {tuple(r) for r in
         Q.q_events_hourly(spark, "/root/testdata/sf0.001").collect()}
    assert a == b


def test_latest_capture_windowed_stream_equals_batch(spark, tmp_path):
    """Windowed recrawl dedup: stream drain (append, availableNow) must
    produce a subset of the batch form limited to watermark-closed
    windows, newest-capture-per-(window,url) semantics identical."""
    from dbpedia_spotlight_spark.streaming.captures import (
        latest_capture_windowed,
    )
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    caps = ev.select(
        F.concat(F.lit("u"), (F.col("event_id") % 100).cast("string"))
         .alias("url"),
        F.col("ts").alias("warc_ts"), "event_id", "event_type")
    src = str(tmp_path / "caps")
    caps.write.parquet(src)

    batch = latest_capture_windowed(caps, tiebreak_col="event_id")
    stream = latest_capture_windowed(
        spark.readStream.schema(caps.schema).parquet(src),
        tiebreak_col="event_id")
    assert stream.isStreaming
    q = (stream.writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "out"))
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a <= b          # withheld rows are only still-open windows
    assert len(a) >= 0.8 * len(b)
    # exactly one emitted row per (window, url)
    assert got.groupBy("window_start", "url").count() \
              .filter("count > 1").count() == 0
    # and the kept capture per key is the true argmax(ts, event_id)
    import duckdb
    oracle = duckdb.connect().execute("""
      SELECT url, event_id FROM (
        SELECT url, event_id, row_number() OVER (
                 PARTITION BY url, time_bucket(INTERVAL 1 hour, warc_ts)
                 ORDER BY warc_ts DESC, event_id DESC) AS rn
        FROM (SELECT 'u' || (event_id % 100) AS url, ts AS warc_ts,
                     event_id
              FROM '/root/testdata/sf0.001/events.parquet'))
      WHERE rn = 1
    """).df()
    want = set(map(tuple, oracle[["url", "event_id"]].itertuples(
        index=False, name=None)))
    emitted = {(r["url"], r["event_id"]) for r in got.collect()}
    batch_keys = {(r["url"], r["event_id"]) for r in batch.collect()}
    assert batch_keys == want
    assert emitted <= want


def test_ivf_topk_recall(spark):
    from dbpedia_spotlight_spark.operators.similarity import (
        cosine_topk, ivf_topk,
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2]
    exact = cosine_topk(emb, qids, k=5)
    approx = ivf_topk(emb, qids, k=5, n_clusters=8, n_probe=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.6  # multi-probe recall floor
    # ranks are consistent: every returned row has rank 1..5 per query
    per_q = approx.groupBy("query_id").agg(F.max("rank").alias("m")).collect()
    assert all(r.m <= 5 for r in per_q)


def test_ivf_assign_partitions_all_vectors(spark):
    from dbpedia_spotlight_spark.operators.similarity import (
        ivf_assign, ivf_centroids,
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    C = ivf_centroids(emb, n_clusters=8)
    assigned = ivf_assign(emb, C)
    assert assigned.filter(F.col("cluster").isNull()).count() == 0
    n_used = assigned.select("cluster").distinct().count()
    assert 2 <= n_used <= 8


def test_jaccard_long_key_matches_string_key(spark):
    """The md5-long join key must reproduce the string-key Jaccard
    exactly (collision-free at test scale)."""
    import duckdb
    from dbpedia_spotlight_spark.operators.dedup import ngram_jaccard_pairs
    from dbpedia_spotlight_spark import queries as Q
    got = ngram_jaccard_pairs(
        Q._docs(spark, "/root/testdata/sf0.001"), k=3, threshold=0.03
    ).toPandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    want = con.execute(Q.sql_jaccard_pairs()).df()
    key = lambda df: sorted(  # noqa: E731
        (int(a), int(b), round(float(j), 9))
        for a, b, j in zip(df["a"], df["b"], df["jaccard"]))
    assert key(got) == key(want)


def test_ivf_centroids_sampling_branch_layout_independent(spark):
    """n > sample exercises the hash-Bernoulli gate + id-ordered limit:
    the trained quantizer must be identical under any partition layout
    (the reason the trainer avoids Spark's per-partition sample RNG)."""
    import numpy as np
    from dbpedia_spotlight_spark.operators.similarity import ivf_centroids

    rows = []
    x = 0xDEADBEEFCAFE1234
    for i in range(900):
        v = []
        for _ in range(8):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            v.append(((x >> 11) / float(1 << 53)) * 2.0 - 1.0)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c1 = ivf_centroids(df, n_clusters=4, sample=256)
    c2 = ivf_centroids(df.repartition(17), n_clusters=4, sample=256)
    c3 = ivf_centroids(df.orderBy(F.desc("vec_id")).repartition(3),
                       n_clusters=4, sample=256)
    assert np.array_equal(c1, c2) and np.array_equal(c1, c3)
    # and the gate really sampled (trained on a strict subset)
    full = ivf_centroids(df, n_clusters=4, sample=2048)
    assert not np.array_equal(c1, full)
