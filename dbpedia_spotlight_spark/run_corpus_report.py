"""spark-submit entrypoint: one-pass-per-family corpus diagnostics as
a job — the report a 100 TB crawl publishes per snapshot before
anything downstream trusts the slice.

    spark-submit --py-files dbpedia_spotlight_spark.zip \
        dbpedia_spotlight_spark/run_corpus_report.py \
        --docs /data/documents --out /reports/snapshot_042.json

Sections (each an already-tested operator, composed — nothing here
re-implements analysis):

- ``zipf``: power-law fit of the word-frequency head
  (:mod:`operators.corpusstats`) — slope far from −1 or low R² flags
  template/spam floods;
- ``vocab_growth``: the Heaps curve — a flattening tail flags
  duplication before any pairwise dedup runs;
- ``languages`` / ``sources``: per-key doc counts with the max share
  (source skew is the mega-host early warning);
- ``quality``: Gopher-gate pass rate (:mod:`operators.textstats`);
- ``exact_dup``: duplicate-group mass from the content-hash groupBy
  (:mod:`operators.dedup`) — dup_docs / n_docs.

Everything aggregates to one small JSON (driver-side dict): the corpus
is scanned once per section, nothing corpus-sized is collected. Also
callable in-process via ``main(argv, spark=...)`` (tests)."""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession, functions as F


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="corpus diagnostics report")
    ap.add_argument("--docs", required=True,
                    help="parquet dir of documents (doc_id, text, ...)")
    ap.add_argument("--out", default="",
                    help="write the report JSON here (default: stdout)")
    ap.add_argument("--top-n", type=int, default=500,
                    help="zipf fit head size")
    ap.add_argument("--checkpoints", type=int, default=10,
                    help="heaps-curve prefix checkpoints")
    return ap


def build_report(spark: SparkSession, docs_path: str, top_n: int = 500,
                 checkpoints: int = 10) -> dict:
    from dbpedia_spotlight_spark.operators.corpusstats import (
        vocab_growth, zipf_fit)
    from dbpedia_spotlight_spark.operators.dedup import exact_duplicates
    from dbpedia_spotlight_spark.operators.textstats import gopher_quality

    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    report: dict = {"n_docs": n_docs, "docs_path": docs_path}

    z = zipf_fit(docs, top_n=top_n).first()
    report["zipf"] = {"n_ranks": z["n_ranks"], "slope": z["slope"],
                      "intercept": z["intercept"], "r2": z["r2"]}

    growth = vocab_growth(docs, n_checkpoints=checkpoints) \
        .orderBy("checkpoint").collect()
    report["vocab_growth"] = [
        {"checkpoint": r["checkpoint"], "cum_tokens": r["cum_tokens"],
         "cum_vocab": r["cum_vocab"]} for r in growth]
    if growth:
        last = growth[-1]
        report["n_tokens"] = last["cum_tokens"]
        report["n_vocab"] = last["cum_vocab"]

    for col in ("lang", "source"):
        if col in docs.columns:
            counts = (docs.groupBy(col).agg(F.count("*").alias("n"))
                      .orderBy(F.col("n").desc(), col).collect())
            report[f"{col}s"] = {r[col]: r["n"] for r in counts}
            if counts and n_docs:
                report[f"max_{col}_share"] = round(
                    counts[0]["n"] / n_docs, 6)

    gates = gopher_quality(docs).agg(
        F.count("*").alias("n"),
        F.sum(F.col("passes").cast("long")).alias("ok")).first()
    report["quality"] = {
        "n_scored": gates["n"],
        "pass_rate": round(gates["ok"] / gates["n"], 6)
        if gates["n"] else None}

    dup = exact_duplicates(docs).agg(
        F.count("*").alias("groups"),
        F.coalesce(F.sum(F.col("n_docs") - 1), F.lit(0))
        .alias("redundant")).first()
    report["exact_dup"] = {
        "dup_groups": dup["groups"],
        "redundant_docs": dup["redundant"],
        "dup_rate": round(dup["redundant"] / n_docs, 6)
        if n_docs else None}
    return report


def main(argv: list[str] | None = None,
         spark: SparkSession | None = None) -> dict:
    args = build_parser().parse_args(argv)
    own = spark is None
    if own:
        spark = (SparkSession.builder
                 .appName("corpus-report")
                 .config("spark.sql.session.timeZone", "UTC")
                 .getOrCreate())
    try:
        report = build_report(spark, args.docs, top_n=args.top_n,
                              checkpoints=args.checkpoints)
        payload = json.dumps(report, indent=1, sort_keys=True)
        if args.out:
            with open(args.out, "w") as f:
                f.write(payload + "\n")
        else:
            print(payload)
        return report
    finally:
        if own:
            spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
