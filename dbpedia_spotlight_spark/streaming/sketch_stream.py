"""Streaming HLL maintenance: a per-key distinct-count register store
folded incrementally from a stream — the "distinct users per host, all
time, without ever recounting" rollup.

Why this is the right streaming shape: an HLL register table merges by
(key, bucket)-max (see :mod:`..operators.sketches`), which is
associative, commutative and IDEMPOTENT — so

- each micro-batch folds in one combinable aggregate over ~|batch| rows,
- a redelivered/replayed batch is a no-op (max with itself),
- state size is ≤ keys × 2^p registers forever, independent of stream
  length — no watermark needed for correctness, and
- the store equals the batch sketch of everything ever seen, exactly
  (the test pins stream-drain ≡ batch-sketch row-for-row).

The store is a plain parquet register table rewritten per micro-batch
via foreachBatch (same discipline as the KG/graph derived stores: the
fold is tiny — register-table-sized, not stream-sized). At real scale
point the store at the catalog's bucketed layout (bucket by key) so the
per-batch merge join is exchange-free on the store side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sketches import hll_count, hll_merge, hll_sketch


class SketchStore:
    """Parquet-backed HLL register store keyed (key…, bucket) → rho."""

    def __init__(self, path: str, key_cols: list[str], item_col: str,
                 p: int = 12):
        self.path = path
        self.key_cols = list(key_cols)
        self.item_col = item_col
        self.p = p

    def _read(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return spark.read.parquet(self.path)

    def fold(self, batch: DataFrame) -> None:
        """Merge one (batch) DataFrame into the store. Idempotent per
        batch content: re-folding the same rows changes nothing."""
        spark = batch.sparkSession
        delta = hll_sketch(batch, self.key_cols, self.item_col, self.p)
        cur = self._read(spark)
        merged = delta if cur is None else hll_merge(cur, delta)
        # register tables are tiny (≤ keys × 2^p rows): localCheckpoint
        # breaks the read-then-overwrite cycle on the same path
        merged.localCheckpoint(eager=True).write.mode("overwrite") \
            .parquet(self.path)

    def counts(self, spark: SparkSession) -> DataFrame:
        """Current per-key estimates (empty frame if nothing folded)."""
        cur = self._read(spark)
        if cur is None:
            raise FileNotFoundError(f"no sketch store at {self.path}")
        return hll_count(cur, self.key_cols, self.p)


def maintain_sketch_stream(stream: DataFrame, store: SketchStore,
                           checkpoint_dir: str, trigger_available_now: bool = True):
    """Attach the store to a streaming frame via foreachBatch. Returns
    the StreamingQuery (caller awaits/stops). Exactly-once is carried by
    the fold's idempotence — a replayed micro-batch maxes into the same
    registers."""
    def fold(batch_df: DataFrame, _batch_id: int) -> None:
        store.fold(batch_df)

    w = stream.writeStream.foreachBatch(fold) \
        .option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


class KmvStore:
    """Parquet-backed bottom-k (KMV) sketch store keyed (key…, item, h)
    — the same fold discipline as :class:`SketchStore` with a different
    merge law: union + re-bottom-k (idempotent — re-folding any subset
    of already-present rows is a no-op, because dropDuplicates on
    (key, h) + the k-smallest window absorb re-delivery). State is
    ≤ keys × k rows forever, and unlike HLL registers the rows ARE a
    coordinated uniform sample of each key's distinct items, so the
    store doubles as an always-fresh per-key distinct-sample feed."""

    def __init__(self, path: str, key_cols: list[str], item_col: str,
                 k: int = 256):
        self.path = path
        self.key_cols = list(key_cols)
        self.item_col = item_col
        self.k = k

    def _read(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return spark.read.parquet(self.path)

    def fold(self, batch: DataFrame) -> None:
        from ..operators.sketches import kmv_merge, kmv_sketch
        spark = batch.sparkSession
        delta = kmv_sketch(batch, self.key_cols, self.item_col, self.k)
        cur = self._read(spark)
        merged = delta if cur is None else kmv_merge(
            cur, delta, key_cols=self.key_cols, k=self.k)
        merged.localCheckpoint(eager=True).write.mode("overwrite") \
            .parquet(self.path)

    def counts(self, spark: SparkSession) -> DataFrame:
        from ..operators.sketches import kmv_count
        cur = self._read(spark)
        if cur is None:
            raise FileNotFoundError(f"no kmv store at {self.path}")
        return kmv_count(cur, self.key_cols, self.k)

    def sample(self, spark: SparkSession) -> DataFrame:
        """The current bottom-k rows per key — a deterministic uniform
        sample over each key's distinct items (coordinated: the same
        item set any other engine/day computes from the same hashes)."""
        cur = self._read(spark)
        if cur is None:
            raise FileNotFoundError(f"no kmv store at {self.path}")
        return cur
