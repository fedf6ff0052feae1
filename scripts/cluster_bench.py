#!/usr/bin/env python
"""Real-executor scaling evidence: the flagship annotate job submitted
via ``spark-submit --py-files`` to ``local-cluster[W,4,2048]`` at two
worker counts (the closest this sandbox gets to a multi-executor
cluster — separate worker JVMs, real task serialization, a real
broadcast to each executor).

Orchestrator mode (no args): zips the package, runs the job at 1 and 4
workers, prints one JSON line with both times + efficiency.

Job mode (``--workers N`` inside spark-submit): times annotate over the
replicated scale corpus and prints ``CLUSTER_BENCH {json}``.

    python scripts/cluster_bench.py            # orchestrates both runs
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.environ.get("SPARK_GRAFT_SCALE_CORPUS",
                        "/tmp/spark_graft_scale_corpus")


def job(workers: int) -> None:
    from pyspark.sql import SparkSession
    from dbpedia_spotlight_spark import lexicon_static as LEX
    from dbpedia_spotlight_spark.pipeline import PipelineConfig, annotate

    spark = SparkSession.builder.getOrCreate()
    docs = spark.read.parquet(CORPUS)
    pages = docs.selectExpr("concat(source, '/', doc_id) AS url",
                            "text", "lang")
    bc = spark.sparkContext.broadcast(LEX.compile_static_model())
    cfg = PipelineConfig(disambiguator="generative")
    n_docs = docs.count()
    # warm: JVM + python workers + broadcast deserialization per executor
    annotate(spark, pages.limit(2048), bc, cfg).count()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        annotate(spark, pages, bc, cfg).count()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print("CLUSTER_BENCH " + json.dumps(
        {"workers": workers, "n_docs": n_docs, "sec": round(best, 3),
         "docs_per_sec": round(n_docs / best, 1)}))
    spark.stop()


def orchestrate() -> None:
    zip_path = "/tmp/dbpedia_spotlight_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        pkg = os.path.join(REPO, "dbpedia_spotlight_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    results = {}
    for workers in (1, 4):
        cmd = [
            "spark-submit",
            "--master", f"local-cluster[{workers},4,2048]",
            "--py-files", zip_path,
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=2048",
            "--conf", f"spark.sql.shuffle.partitions={workers * 4}",
            "--conf", "spark.ui.enabled=false",
            os.path.abspath(__file__), "--workers", str(workers),
        ]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=1200, cwd="/tmp")
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("CLUSTER_BENCH ")]
        if not line:
            sys.stderr.write(out.stderr[-2000:])
            raise SystemExit(f"no CLUSTER_BENCH line at workers={workers}")
        results[workers] = json.loads(line[-1][len("CLUSTER_BENCH "):])
    t1, t4 = results[1]["sec"], results[4]["sec"]
    summary = {
        "metric": "cluster_scaling_1_to_4_workers",
        "local_cluster_1x4": results[1],
        "local_cluster_4x4": results[4],
        "efficiency": round((t1 / t4) / 4.0, 3),
    }
    print(json.dumps(summary))
    # persist for bench.py to forward into the driver's BENCH JSON (the
    # real-executor form is the north_rule's literal N→4N shape)
    with open(os.path.join(REPO, ".cluster_cache.json"), "w") as f:
        json.dump({**summary, "measured_at": time.time()}, f)


if __name__ == "__main__":
    if "--workers" in sys.argv:
        job(int(sys.argv[sys.argv.index("--workers") + 1]))
    else:
        orchestrate()
