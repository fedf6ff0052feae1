#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: ``docs_per_sec`` (flagship annotate throughput) and, with
``--scaling``, the two-parallelism scaling protocol mandated by
BASELINE.md §6 (no real cluster in the sandbox): the SAME job on the SAME
input at local[8] vs local[32], reporting throughput at both plus
``efficiency = (T_8 / T_32) / (32 / 8)`` (gate ≥ 0.8).

Usage:
    python bench.py                 # driver mode: one JSON line
    python bench.py --scaling       # adds the 8-vs-32 scaling evidence
    python bench.py --cpus 8        # explicit parallelism (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"dbpedia-spotlight-spark-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def _run(df) -> int:
    """Execute the full plan without collecting (noop sink), return rows."""
    df = df.cache()
    n = df.count()
    df.unpersist(blocking=False)
    return n


HEADLINE = [
    "annotate_generative",   # flagship fused pipeline (docs/sec metric)
    "spot_fsa",
    "annotate_prior",        # relational prior path
    "link_triples",
    "minhash_pairs",
    "simhash",
    "jaccard_pairs",
    "ann_topk",
    "lang_id",
    "quality",
    "tpch_q1",
    "tpch_q3",
    "events_hourly",
]


def run_bench(sf_dir: str, cpus: int) -> dict:
    from dbpedia_spotlight_spark import queries as Q

    spark = build_spark(cpus)
    qs = Q.queries()
    # warm up JVM + Python workers so per-query times measure the plan
    Q._docs(spark, sf_dir).limit(8).mapInPandas(
        lambda it: it, Q._docs(spark, sf_dir).schema
    ).count()

    n_docs = Q._docs(spark, sf_dir).count()
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        rows[name] = _run(qs[name](spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    docs_per_sec = round(n_docs / times["annotate_generative"], 2)
    spark.stop()
    return {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "docs_per_sec": docs_per_sec,
        "rows": rows,
    }


def run_scaling(sf_dir: str) -> dict:
    """Same job, same input, local[8] vs local[32] (subprocesses so each
    JVM is fresh) — the sandbox stand-in for N vs 4N executors."""
    out = {}
    for cpus in (8, 32):
        r = subprocess.run(
            [sys.executable, __file__, "--cpus", str(cpus), "--sf-dir", sf_dir],
            capture_output=True, text=True, check=True,
        )
        out[cpus] = json.loads(r.stdout.strip().splitlines()[-1])
    t8 = out[8]["queries"]["annotate_generative"]
    t32 = out[32]["queries"]["annotate_generative"]
    suite8, suite32 = out[8]["value"], out[32]["value"]
    return {
        "annotate_sec_local8": t8,
        "annotate_sec_local32": t32,
        "annotate_docs_per_sec_local8": out[8]["docs_per_sec"],
        "annotate_docs_per_sec_local32": out[32]["docs_per_sec"],
        "annotate_efficiency": round((t8 / t32) / 4.0, 3),
        "suite_sec_local8": suite8,
        "suite_sec_local32": suite32,
        "suite_efficiency": round((suite8 / suite32) / 4.0, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--scaling", action="store_true",
                    help="also run the local[8]-vs-local[32] protocol")
    args = ap.parse_args()

    result = run_bench(args.sf_dir, args.cpus)
    if args.scaling:
        result["scaling"] = run_scaling(args.sf_dir)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
