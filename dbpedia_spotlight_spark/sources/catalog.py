"""Table-format abstraction + checkpoint-resumable writes (SURVEY §7.4).

north_rule requires Iceberg tables with per-partition lineage and
checkpoint-resumable stages. This sandbox has no Iceberg jar (verified at
survey time), so the catalog abstracts the writer:

- ``iceberg`` mode: ``df.writeTo(name).using('iceberg')`` when a Spark
  catalog is configured — snapshot IDs give lineage for free.
- ``parquet`` mode (fallback, identical call sites): partitioned Parquet
  plus a ``_manifest.json`` recording completed **work units** so a
  restarted run skips them.

Resume semantics (E3): work is split into deterministic *units* (hash
buckets of ``url``). Each unit is written to its own subdirectory with an
atomic manifest append after success. ``remaining_units`` left-anti-joins
the unit list against the manifest — a crashed run re-executes only
unfinished units, and unit outputs are idempotent (overwrite-by-path).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class ParquetCatalog:
    def __init__(self, root: str):
        self.root = root

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    # -- checkpoint/resume ---------------------------------------------------

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.path(name), "_manifest.json")

    def completed_units(self, name: str) -> set[int]:
        mp = self._manifest_path(name)
        if not os.path.exists(mp):
            return set()
        with open(mp) as f:
            entries = [json.loads(line) for line in f if line.strip()]
        return {e["unit"] for e in entries if e.get("status") == "done"}

    def mark_done(self, name: str, unit: int, rows: int) -> None:
        os.makedirs(self.path(name), exist_ok=True)
        with open(self._manifest_path(name), "a") as f:
            f.write(json.dumps({
                "unit": unit, "status": "done", "rows": rows,
                "ts": time.time(),
            }) + "\n")

    def write_resumable(
        self,
        df_for_unit,          # Callable[[int], DataFrame]
        name: str,
        n_units: int,
        on_unit_done=None,
    ) -> list[int]:
        """Run unit-at-a-time with manifest checkpoints; returns the list
        of units executed this run (skipped ones excluded)."""
        done = self.completed_units(name)
        ran = []
        for unit in range(n_units):
            if unit in done:
                continue
            out = df_for_unit(unit)
            unit_path = os.path.join(self.path(name), f"unit={unit}")
            out.write.mode("overwrite").parquet(unit_path)
            rows = out.sparkSession.read.parquet(unit_path).count()
            self.mark_done(name, unit, rows)
            if on_unit_done:
                on_unit_done(unit, rows)
            ran.append(unit)
        return ran

    def read_units(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path(name), "unit=*"))

    # -- snapshots (Iceberg-semantics fallback) ------------------------------
    #
    # Iceberg gives snapshot-id time travel + expire_snapshots; the
    # parquet fallback reproduces the *semantics* at directory
    # granularity: each commit writes a new ``snap=<id>`` directory and
    # appends one line to ``_snapshots.json`` (the metadata log — tiny,
    # append-only, the commit point). Readers never see a half-written
    # snapshot: the data files land entirely before the log line does.

    def _snapshots_path(self, name: str) -> str:
        return os.path.join(self.path(name), "_snapshots.json")

    def snapshots(self, name: str) -> list[dict]:
        """Snapshot history, oldest first: {id, rows, ts, parent}."""
        sp = self._snapshots_path(name)
        if not os.path.exists(sp):
            return []
        with open(sp) as f:
            return [json.loads(line) for line in f if line.strip()]

    def write_snapshot(self, df: DataFrame, name: str) -> int:
        """Commit ``df`` as a new snapshot of table ``name``; returns the
        snapshot id. Previous snapshots stay readable until expired."""
        snaps = self.snapshots(name)
        sid = snaps[-1]["id"] + 1 if snaps else 0
        parent = snaps[-1]["id"] if snaps else None
        snap_path = os.path.join(self.path(name), f"snap={sid}")
        df.write.mode("overwrite").parquet(snap_path)
        rows = df.sparkSession.read.parquet(snap_path).count()
        os.makedirs(self.path(name), exist_ok=True)
        with open(self._snapshots_path(name), "a") as f:
            f.write(json.dumps({"id": sid, "rows": rows,
                                "ts": time.time(), "parent": parent}) + "\n")
        return sid

    def read_snapshot(self, spark: SparkSession, name: str,
                      snapshot_id: int | None = None) -> DataFrame:
        """Time travel: read a specific snapshot (default: the latest)."""
        snaps = self.snapshots(name)
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {name!r}")
        ids = [s["id"] for s in snaps]
        sid = ids[-1] if snapshot_id is None else snapshot_id
        if sid not in ids:
            raise FileNotFoundError(
                f"snapshot {sid} of {name!r} not found "
                f"(available: {ids} — expired snapshots are deleted)")
        return spark.read.parquet(
            os.path.join(self.path(name), f"snap={sid}"))

    def expire_snapshots(self, name: str, keep_last: int = 2) -> list[int]:
        """Bounded-storage retention (Iceberg ``expire_snapshots``):
        delete all but the newest ``keep_last`` snapshot directories and
        rewrite the metadata log. Returns the expired ids."""
        import shutil

        snaps = self.snapshots(name)
        keep, drop = snaps[-keep_last:], snaps[:-keep_last]
        for s in drop:
            shutil.rmtree(
                os.path.join(self.path(name), f"snap={s['id']}"),
                ignore_errors=True)
        if drop:
            with open(self._snapshots_path(name), "w") as f:
                for s in keep:
                    f.write(json.dumps(s) + "\n")
        return [s["id"] for s in drop]

    def compact_snapshot(self, spark: SparkSession, name: str,
                         target_bytes: int = 128 << 20,
                         min_files: int = 2) -> dict:
        """Small-file compaction (Iceberg ``rewrite_data_files``):
        rewrite the LATEST snapshot's parquet files into
        ceil(total_bytes / target_bytes) files as a NEW snapshot.

        Streaming/incremental writers (KG maintenance folds, resumable
        units) accumulate one file per micro-batch/unit; at 100 TB that
        is millions of sub-MB files — scan task explosion + namenode
        pressure. Compaction is data-identical (the test pins row-set
        equality), history-preserving (the old snapshot stays readable
        until expired), and crash-safe (the new snapshot directory is
        written fully before the metadata append commits it).

        Returns {'files_before', 'files_after', 'snapshot_id'};
        a no-op (already <= min_files) returns snapshot_id = None."""
        snaps = self.snapshots(name)
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {name!r}")
        sid = snaps[-1]["id"]
        snap_path = os.path.join(self.path(name), f"snap={sid}")
        files = [f for f in os.listdir(snap_path)
                 if f.endswith(".parquet")]
        if len(files) <= min_files:
            return {"files_before": len(files),
                    "files_after": len(files), "snapshot_id": None}
        total = sum(os.path.getsize(os.path.join(snap_path, f))
                    for f in files)
        n_out = max(1, -(-total // target_bytes))
        df = spark.read.parquet(snap_path).repartition(int(n_out))
        new_sid = self.write_snapshot(df, name)
        new_path = os.path.join(self.path(name), f"snap={new_sid}")
        after = len([f for f in os.listdir(new_path)
                     if f.endswith(".parquet")])
        return {"files_before": len(files), "files_after": after,
                "snapshot_id": new_sid}


def unit_of(url_col, n_units: int):
    """Deterministic work-unit assignment: stable hash bucket of url.
    ``pmod(xxhash64(url))`` — uniform, reproducible across runs/restarts."""
    return F.pmod(F.xxhash64(url_col), F.lit(n_units)).cast("int")
