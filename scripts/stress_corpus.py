#!/usr/bin/env python
"""Regenerate the adversarial near-dup stress corpus used for the
curation-pipeline evidence in BASELINE.md: every sf0.1 document is
replicated into a 128-member clone family (same text + a distinct
trailing token per member — Jaccard ≈ 0.95 within a family), 640k rows
total. Deterministic; no external data.

    python scripts/stress_corpus.py [--out /tmp/stress_corpus] [--reps 128]

Then:

    spark-submit --master local[32] --driver-memory 16g \
        --conf spark.sql.shuffle.partitions=64 \
        --py-files /tmp/dbpedia_spotlight_spark.zip \
        dbpedia_spotlight_spark/run_curation.py \
        --corpus /tmp/stress_corpus --out /tmp/curation_stress --split ""
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1/documents.parquet")
    ap.add_argument("--out", default="/tmp/stress_corpus")
    ap.add_argument("--reps", type=int, default=128)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.ui.enabled", "false").getOrCreate())
    docs = spark.read.parquet(args.src).select("doc_id", "text", "lang")
    reps = spark.range(args.reps).select(F.col("id").alias("rep"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" v"),
                     F.col("rep").cast("string")).alias("text"),
            "lang",
        )
    )
    big.repartition(32).write.mode("overwrite").parquet(args.out)
    print(f"{spark.read.parquet(args.out).count()} rows -> {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
