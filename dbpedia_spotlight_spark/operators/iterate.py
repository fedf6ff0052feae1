"""Per-round lineage cutting for iterative DataFrame algorithms
(connected components, PageRank).

Iterative DataFrame loops need a materialization per round — otherwise
the logical plan (and Catalyst re-analysis cost) grows with the
iteration count and every action re-executes the whole upstream. Two
modes, one interface:

- ``local`` (default): ``localCheckpoint(eager=True)``. Fastest cut,
  but PySpark exposes no way to unpersist a localCheckpoint, so up to
  ``n_rounds`` label-frame generations accumulate in executor storage
  until the session drops them — bounded and fine for shallow graphs
  (web-dedup clusters, fixed 10-iteration PageRank).
- ``dir`` (``checkpoint_dir=...``): each round is written to
  ``<dir>/<name>-gen-N`` as parquet and read back, and the PREVIOUS
  generation is deleted once the new one is durable — storage stays
  FLAT at ~2 generations no matter how deep the iteration, and the cut
  survives executor loss (reliable storage, not executor block
  manager). This is the long-iteration / deep-chain form the
  ``localCheckpoint`` docstrings defer to.

Deletion goes through the Hadoop FileSystem API, so ``checkpoint_dir``
may be any Hadoop-supported URI (local path, hdfs://, s3a://...).

Contract: the DataFrame returned by the LAST ``cut()`` reads from the
last generation directory — consume (or copy) it before deleting the
checkpoint dir. ``close(delete_last=True)`` removes it explicitly once
results are safely elsewhere.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession


def _hadoop_delete(spark: SparkSession, path: str) -> None:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


class RoundCheckpointer:
    """One lineage cut per loop round; see module docstring for modes."""

    def __init__(self, spark: SparkSession,
                 checkpoint_dir: str | None = None,
                 name: str = "iter") -> None:
        self.spark = spark
        self.dir = checkpoint_dir.rstrip("/") if checkpoint_dir else None
        self.name = name
        # unique per-instance run token: two loops sharing a
        # checkpoint_dir (or one re-run) must not overwrite/delete each
        # other's generations while earlier results are still lazily
        # referenced — paths are (dir, name, token)-scoped, not (dir,
        # name)-scoped. Tokens only name directories; results never
        # depend on them.
        self._token = uuid.uuid4().hex[:8]
        self._gen = 0
        self._prev: str | None = None

    def cut(self, df: DataFrame) -> DataFrame:
        if self.dir is None:
            return df.localCheckpoint(eager=True)
        path = f"{self.dir}/{self.name}-{self._token}-gen-{self._gen:05d}"
        self._gen += 1
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # the new generation is durable — drop the old one so storage
        # stays flat regardless of iteration depth
        if self._prev is not None:
            _hadoop_delete(self.spark, self._prev)
        self._prev = path
        return out

    def close(self, delete_last: bool = False) -> None:
        if delete_last and self._prev is not None:
            _hadoop_delete(self.spark, self._prev)
            self._prev = None
