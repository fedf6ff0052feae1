"""spark-submit entrypoint: the training-data CURATION pipeline as one
job — the operators this engine adds beyond the reference's annotate
path, composed the way a 100 TB pre-training corpus actually flows:

    exact dedup → near-dedup (MinHash-LSH → connected components →
    canonical keeper) → quality gates (Gopher/C4 + language) →
    PII scrub → deterministic train/val/test split → write + metrics

    spark-submit --py-files dbpedia_spotlight_spark.zip \
        dbpedia_spotlight_spark/run_curation.py \
        --corpus /data/documents --out /data/curated \
        --split train=0.9,val=0.05,test=0.05 --scrub-pii

Every keep-decision is deterministic and partition-layout independent
(content-hash min-id, min-label components, salted-md5 splits), so a
resumed or re-run job reproduces the same corpus byte-for-byte. Also
callable in-process via ``main(argv, spark=...)`` (tests).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="training-corpus curation job")
    ap.add_argument("--corpus", required=True,
                    help="parquet dir with (doc_id|url, text[, lang])")
    ap.add_argument("--out", required=True, help="output table root")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--lang", default="en",
                    help="language gate ('' disables); uses the lang "
                         "column when present, else the n-gram guesser")
    ap.add_argument("--minhash-hashes", type=int, default=16)
    # 2 hashes/band: more, coarser bands raise the per-pair co-bucket
    # probability, which star-mode clustering needs for connectivity
    # (measured on 128-clone families: bands=4 → ~4 survivors, bands=8
    # → ~3, bands=16 → 1; FP candidates cost only linear verify work
    # and are rejected there)
    ap.add_argument("--minhash-bands", type=int, default=8)
    ap.add_argument("--jaccard-threshold", type=float, default=0.8,
                    help="exact-verify threshold for LSH candidates")
    ap.add_argument("--dedup-pair-mode", default="star",
                    choices=["star", "all"],
                    help="'star' = linear founder edges (clone families "
                         "of any size; recall dips when a bucket's "
                         "min-id founder is a false positive); 'all' = "
                         "every candidate pair (highest recall, "
                         "quadratic per bucket)")
    ap.add_argument("--no-quality-gate", dest="quality_gate",
                    action="store_false", default=True)
    ap.add_argument("--scrub-pii", action="store_true")
    ap.add_argument("--canonicalize-urls", action="store_true",
                    help="rewrite --url-col to its canonical form "
                         "(fragment/tracking-param/default-port strip, "
                         "lowercase authority) BEFORE recrawl dedup, so "
                         "capture variants of one page share a key")
    ap.add_argument("--dedup-recrawls", action="store_true",
                    help="stage 0: keep only the newest capture per "
                         "--url-col (by --ts-col, tiebreak --id-col) "
                         "before any content dedup — recrawled pages "
                         "are exact/near duplicates that inflate every "
                         "later stage")
    ap.add_argument("--url-col", default="url",
                    help="capture url column (also drives host-skew "
                         "observability when present)")
    ap.add_argument("--ts-col", default="warc_ts",
                    help="capture timestamp column for --dedup-recrawls")
    ap.add_argument("--split", default="train=0.98,val=0.01,test=0.01",
                    help="name=weight[,name=weight...] (sum 1) or ''")
    ap.add_argument("--robots-gate", action="store_true",
                    help="drop pages whose <meta name=robots> declares "
                         "noindex (requires --html-col in the input)")
    ap.add_argument("--html-col", default="html")
    ap.add_argument("--robots-txt-gate", action="store_true",
                    help="honor per-host /robots.txt captures found in "
                         "the corpus itself: parse them (RFC 9309 "
                         "prefix subset), drop disallowed urls and the "
                         "robots.txt rows (requires --url-col)")
    ap.add_argument("--semantic-dedup", type=float, default=0.0,
                    metavar="COSINE",
                    help="extra near-dedup stage on feature-hashed text "
                         "embeddings (SemDeDup shape, no encoder "
                         "model): drop cosine->=COSINE neighbors via "
                         "hyperplane-LSH candidates + exact verify + "
                         "min-id keeper; 0 disables")
    ap.add_argument("--semantic-dim", type=int, default=64)
    ap.add_argument("--decontaminate", default="",
                    help="parquet dir of benchmark/eval docs (text "
                         "column): drop every corpus doc sharing a "
                         "word n-gram with them (GPT-3 recipe)")
    ap.add_argument("--decontam-ngram", type=int, default=8)
    ap.add_argument("--ppl-ref", default="",
                    help="parquet dir of reference docs to count-train "
                         "the bigram LM on (or 'self' = the corpus "
                         "itself); keeps only --ppl-keep perplexity "
                         "buckets (CCNet head/middle/tail)")
    ap.add_argument("--ppl-keep", default="head,middle")
    ap.add_argument("--ppl-mix", default="",
                    help="instead of the binary --ppl-keep gate, sample "
                         "per bucket: 'head=1.0,middle=0.5,tail=0.05' "
                         "(the CCNet mixing shape; deterministic "
                         "stratified hash sampling)")
    ap.add_argument("--stage-dir", default="",
                    help="durable stage checkpoints: each materialized "
                         "stage writes parquet + a _DONE marker here "
                         "instead of a session-local checkpoint, and "
                         "--resume skips every stage whose marker "
                         "exists — a killed 100 TB run restarts at the "
                         "first incomplete stage, not from the scan")
    ap.add_argument("--resume", action="store_true",
                    help="with --stage-dir: reuse completed stages")
    ap.add_argument("--clean-boilerplate", action="store_true",
                    help="C4-style boilerplate line filter BEFORE "
                         "content dedup (boilerplate changes content "
                         "hashes, so cleaning must precede hashing); "
                         "docs reduced to zero lines are dropped")
    ap.add_argument("--line-dedup", action="store_true",
                    help="CROSS-document line dedup (C4 kept-first "
                         "rule): syndicated footers/license blocks "
                         "survive only at their min-(doc,line) "
                         "occurrence; runs after the per-doc "
                         "boilerplate filter, before content dedup")
    ap.add_argument("--line-dedup-min-words", type=int, default=2,
                    help="lines shorter than this bypass line dedup")
    ap.add_argument("--span-dedup", type=int, default=0, metavar="K",
                    help="strip non-first occurrences of exact duplicated "
                         "word K-grams (Lee et al. ExactSubstr, kept-first; "
                         "0 = off)")
    ap.add_argument("--classifier-ref", default="",
                    help="CCNet-style model-based quality gate: parquet of "
                         "reference ('looks like this') documents used as "
                         "positives; a same-size deterministic hash sample "
                         "of the corpus is the negative class; a logistic "
                         "classifier over the quality features scores every "
                         "doc and the gate keeps p >= threshold")
    ap.add_argument("--classifier-threshold", type=float, default=0.5)
    ap.add_argument("--classifier-iters", type=int, default=50)
    ap.add_argument("--dsir-target", default="",
                    help="DSIR importance resampling (Xie et al. 2023): "
                         "parquet of target-distribution reference docs; "
                         "the corpus is cut to --dsir-k documents sampled "
                         "without replacement proportionally to the "
                         "hashed-n-gram importance weight toward the "
                         "reference (deterministic Gumbel top-k)")
    ap.add_argument("--dsir-k", type=int, default=0,
                    help="number of documents DSIR keeps (required with "
                         "--dsir-target)")
    ap.add_argument("--dsir-buckets", type=int, default=4096)
    return ap


class _StageStore:
    """Durable per-stage materialization: parquet + _DONE marker per
    stage name. The marker commits LAST, so a crash mid-write leaves an
    incomplete dir that a resumed run simply overwrites. Stage outputs
    are deterministic (every keep-decision in this job is hash/min-id
    based), so resuming composes with the determinism contract."""

    def __init__(self, spark: SparkSession, root: str, resume: bool):
        import os
        self.spark = spark
        self.root = root
        self.resume = resume
        os.makedirs(root, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        import os
        return (os.path.join(self.root, f"stage_{name}"),
                os.path.join(self.root, f"stage_{name}._DONE"))

    def check_config(self, shaping: dict) -> None:
        """Fingerprint the stage-shaping flags. A resume against a dir
        written under DIFFERENT flags raises (stale stages would
        silently drop newly-requested work); a fresh run records it."""
        import hashlib
        import os
        fp = hashlib.md5(
            json.dumps(shaping, sort_keys=True, default=str).encode()
        ).hexdigest()
        path = os.path.join(self.root, "_config.fingerprint")
        if os.path.exists(path):
            with open(path) as f:
                prior = f.read().strip()
            if prior != fp and self.resume:
                raise SystemExit(
                    "--resume: stage dir was written under different "
                    "flags — rerun without --resume or use a fresh "
                    "--stage-dir")
        with open(path, "w") as f:
            f.write(fp + "\n")

    def done(self, name: str) -> bool:
        import os
        return self.resume and os.path.exists(self._paths(name)[1])

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._paths(name)[0])

    def stats(self, name: str) -> dict:
        import os
        sidecar = self._paths(name)[1] + ".stats.json"
        if not os.path.exists(sidecar):
            return {}
        with open(sidecar) as f:
            return json.load(f)

    def write_df(self, df: DataFrame, name: str) -> DataFrame:
        data = self._paths(name)[0]
        df.write.mode("overwrite").parquet(data)
        return self.spark.read.parquet(data)

    def commit(self, name: str, stats_delta: dict) -> None:
        marker = self._paths(name)[1]
        with open(marker + ".stats.json", "w") as f:
            json.dump(stats_delta, f)
        with open(marker, "w") as f:       # marker commits LAST
            f.write("done\n")


def _exact_keep(docs: DataFrame, id_col: str) -> DataFrame:
    """Exact dedup, deterministic: keep the MIN id per content hash
    (one map-side-combinable aggregate; dropDuplicates would keep an
    arbitrary row per hash)."""
    keep = (
        docs.select(F.col(id_col), F.md5("text").alias("h"))
        .groupBy("h").agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def main(argv: list[str] | None = None,
         spark: SparkSession | None = None) -> dict:
    from dbpedia_spotlight_spark.operators.components import dedup_keep
    from dbpedia_spotlight_spark.operators.dedup import (
        minhash_candidate_pairs, ngram_jaccard_pairs,
    )
    from dbpedia_spotlight_spark.operators.pii import scrub_pii
    from dbpedia_spotlight_spark.operators.sampling import hash_split
    from dbpedia_spotlight_spark.operators.textstats import (
        gopher_quality, lang_scores,
    )
    from dbpedia_spotlight_spark.sources.catalog import ParquetCatalog

    args = build_parser().parse_args(argv)
    own_session = spark is None
    if own_session:
        spark = (
            SparkSession.builder.appName("spotlight-spark-curation")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )
    from dbpedia_spotlight_spark.operators.webstats import (
        host_skew_report, latest_capture,
    )

    docs = spark.read.parquet(args.corpus)
    id_col = args.id_col
    ck = (_StageStore(spark, args.stage_dir, args.resume)
          if args.stage_dir else None)
    if ck:
        # stage outputs are only reusable under the SAME stage-shaping
        # flags — refuse a stale stage dir instead of silently dropping
        # newly-enabled upstream stages (out/resume/stage-dir excluded)
        shaping = {k: v for k, v in sorted(vars(args).items())
                   if k not in ("out", "resume", "stage_dir")}
        ck.check_config(shaping)
    stats: dict = {}
    if ck and args.resume and ck.stats("_input"):
        stats["input_rows"] = ck.stats("_input")["input_rows"]
    else:
        stats["input_rows"] = docs.count()
        if ck:
            ck.commit("_input", {"input_rows": stats["input_rows"]})

    def _mat(frame: DataFrame, name: str) -> DataFrame:
        """Stage barrier: durable parquet under --stage-dir, else a
        session-local checkpoint (today's behavior)."""
        return (ck.write_df(frame, name) if ck
                else frame.localCheckpoint(eager=True))

    def _commit(name: str, delta: dict) -> None:
        stats.update(delta)
        if ck:
            ck.commit(name, delta)

    def _skip(name: str) -> bool:
        nonlocal docs
        if ck and ck.done(name):
            docs = ck.read(name)
            stats.update(ck.stats(name))
            return True
        return False

    # 0. recrawl dedup + host-skew observability. Newest capture per url
    # first: re-crawls are (near-)exact duplicates, so dropping them here
    # shrinks every later shuffle. The skew report is the operational
    # signal for sizing salted repartitions / AQE thresholds downstream.
    if args.canonicalize_urls:
        from dbpedia_spotlight_spark.operators.urlnorm import (
            canonicalize_urls,
        )
        docs = canonicalize_urls(docs, args.url_col)
    if args.dedup_recrawls and not _skip("recrawl"):
        docs = _mat(latest_capture(docs, args.url_col, args.ts_col, id_col),
                    "recrawl")
        _commit("recrawl", {"after_recrawl_dedup": docs.count()})
    if args.url_col in docs.columns:
        skew = (
            host_skew_report(docs, url_col=args.url_col)
            .agg(F.count("*").alias("n_hosts"),
                 F.sum(F.col("skewed").cast("long")).alias("n_skewed"),
                 F.max("n_docs").alias("max_host_docs"),
                 F.max("salt_buckets").alias("max_salt_buckets"))
            .first()
        )
        stats["host_skew"] = {k: skew[k] for k in skew.asDict()}

    # 0b. robots gate: noindex pages are the publisher's explicit
    # opt-out — they must never reach corpus emission. One mapInPandas
    # pass over (id, html); the html payload stays in the scan stage.
    if args.robots_gate and not _skip("robots_meta"):
        if args.html_col not in docs.columns:
            raise SystemExit(
                f"--robots-gate needs column '{args.html_col}'")
        from dbpedia_spotlight_spark.operators.anchors import robots_meta
        allowed = (
            robots_meta(docs, html_col=args.html_col, url_col=id_col)
            .filter(~F.col("noindex")).select(F.col("url").alias(id_col))
        )
        docs = _mat(docs.join(allowed, id_col, "left_semi"),
                    "robots_meta")
        _commit("robots_meta", {"after_robots_gate": docs.count()})

    # 0b'. robots.txt gate: same opt-out contract as the meta gate but
    # host-level — the crawl's own /robots.txt captures become the
    # broadcast rules table; the corpus side never shuffles.
    if args.robots_txt_gate and not _skip("robots_txt"):
        if args.url_col not in docs.columns:
            raise SystemExit(
                f"--robots-txt-gate needs column '{args.url_col}'")
        from dbpedia_spotlight_spark.operators.robots import apply_robots
        docs = _mat(apply_robots(docs, url_col=args.url_col),
                    "robots_txt")
        _commit("robots_txt", {"after_robots_txt_gate": docs.count()})

    # 0c. boilerplate line filter — BEFORE exact dedup: two captures
    # differing only in nav/footer noise become byte-identical once
    # cleaned, so cleaning first makes the dedup stages strictly more
    # effective. Zero-shuffle projection; empty survivors are dropped.
    if args.clean_boilerplate and not _skip("boilerplate"):
        from dbpedia_spotlight_spark.operators.boilerplate import (
            clean_boilerplate,
        )
        docs = _mat(
            clean_boilerplate(docs)
            .withColumn("text", F.col("clean_text")).drop("clean_text")
            .filter(F.col("n_lines_kept") > 0),
            "boilerplate_raw",
        )
        bp = docs.agg(F.sum("n_lines_dropped").alias("d"),
                      F.count("*").alias("n")).first()
        docs = _mat(docs.drop("n_lines_kept", "n_lines_dropped"),
                    "boilerplate")
        _commit("boilerplate", {"boilerplate_lines_dropped": bp["d"],
                                "after_boilerplate": bp["n"]})

    # 0d. cross-document line dedup — after the per-doc boilerplate
    # filter (no point globally deduplicating lines a cheap projection
    # already drops), before content dedup (removing shared chrome
    # makes true near-dups MORE similar, and re-crawl captures that
    # differ only in a syndicated footer become byte-identical).
    if args.line_dedup and not _skip("line_dedup"):
        from dbpedia_spotlight_spark.operators.boilerplate import (
            line_dedup,
        )
        docs = _mat(
            line_dedup(docs, id_col=id_col,
                       min_words=args.line_dedup_min_words)
            .withColumn("text", F.col("clean_text")).drop("clean_text"),
            "line_dedup_raw",
        )
        ld = docs.agg(F.sum("n_lines_dropped").alias("d"),
                      F.count(F.when(F.trim("text") != "", 1))
                      .alias("n")).first()
        docs = _mat(docs.filter(F.trim("text") != "")
                    .drop("n_lines_dropped"), "line_dedup")
        _commit("line_dedup", {"cross_doc_lines_dropped": ld["d"],
                               "after_line_dedup": ld["n"]})

    # 0e. exact duplicate-SPAN removal (Lee et al. ExactSubstr at word
    # k-gram granularity, kept-first) — after line dedup (whole
    # duplicated lines are already gone, so this pass only pays for
    # sub-line/syndicated-run duplication) and before content dedup for
    # the same reason as 0c/0d: stripping shared runs makes true
    # near-dups strictly more similar. Word-rebuild normalizes inner
    # whitespace (operator contract), which exact dedup downstream is
    # insensitive to.
    if args.span_dedup > 0 and not _skip("span_dedup"):
        from dbpedia_spotlight_spark.operators.spandedup import (
            mask_duplicate_spans,
        )
        docs = _mat(
            mask_duplicate_spans(docs, k=args.span_dedup, id_col=id_col)
            .withColumn("text", F.col("clean_text")).drop("clean_text"),
            "span_dedup_raw",
        )
        sd = docs.agg(F.sum("n_words_dropped").alias("d"),
                      F.count(F.when(F.trim("text") != "", 1))
                      .alias("n")).first()
        docs = _mat(docs.filter(F.trim("text") != "")
                    .drop("n_words_dropped"), "span_dedup")
        _commit("span_dedup", {"dup_span_words_dropped": sd["d"],
                               "after_span_dedup": sd["n"]})

    # 1. exact dedup. Each stage ends with localCheckpoint(eager): the
    # stage-count stats and every later stage reuse the materialized
    # frame instead of re-executing the whole upstream lineage per
    # action (at real scale: persist to storage instead)
    if not _skip("exact_dedup"):
        docs = _mat(_exact_keep(docs, id_col), "exact_dedup")
        _commit("exact_dedup", {"after_exact_dedup": docs.count()})

    # 2. near-dedup: LSH candidates → EXACT Jaccard verify → components
    # → canonical keeper. Clustering raw LSH candidates would delete
    # false positives (docs that merely share a band bucket); only
    # verified pairs may merge clusters. The default mode="star" keeps
    # the candidate count LINEAR in corpus size (bucket−1 founder edges
    # instead of C(bucket,2)) — clone families of hundreds of re-crawls
    # are normal at web scale. The recall cost: a false-positive founder
    # severs that bucket's true pairs (other bands give more chances);
    # --dedup-pair-mode all restores full-recall quadratic candidates.
    if not _skip("near_dedup"):
        cand = minhash_candidate_pairs(
            docs, n_hashes=args.minhash_hashes, bands=args.minhash_bands,
            id_col=id_col, mode=args.dedup_pair_mode)
        pairs = ngram_jaccard_pairs(
            docs, threshold=args.jaccard_threshold, id_col=id_col,
            candidates=cand)
        keep = dedup_keep(docs.select(F.col(id_col).alias("id")), pairs)
        docs = _mat(docs.join(
            keep.filter("keep").select(F.col("id").alias(id_col)),
            id_col, "left_semi"), "near_dedup")
        # dedup observability: DUPLICATE-cluster summary (size >= 2 —
        # singletons would repeat after_near_dedup). A max_cluster
        # blowup at scale usually means FP-welding or a boilerplate
        # family needing a tighter threshold.
        csizes = (
            keep.groupBy("comp").agg(F.count("*").alias("sz"))
            .filter(F.col("sz") >= 2)
            .agg(F.count("*").alias("n_dup_clusters"),
                 F.coalesce(F.max("sz"), F.lit(0)).alias("max_cluster"))
            .first()
        )
        _commit("near_dedup", {
            "after_near_dedup": docs.count(),
            "n_dup_clusters": csizes["n_dup_clusters"],
            "max_cluster": csizes["max_cluster"]})
    # 2b. semantic near-dedup (SemDeDup shape): feature-hashed text
    # embeddings → hyperplane-LSH candidate pairs → exact cosine verify
    # → min-label components → min-id keeper. Catches paraphrase-level
    # clones the shingle stages miss; every stage bucketed/capped.
    if args.semantic_dedup > 0 and not _skip("semantic_dedup"):
        from dbpedia_spotlight_spark.operators.dedup import (
            embedding_near_dup,
        )
        from dbpedia_spotlight_spark.operators.embed import text_embeddings
        emb = text_embeddings(docs, dim=args.semantic_dim, id_col=id_col) \
            .withColumnRenamed(id_col, "vec_id") \
            .localCheckpoint(eager=True)
        sem_pairs = embedding_near_dup(
            emb, threshold=args.semantic_dedup).select("a", "b")
        sem_keep = dedup_keep(docs.select(F.col(id_col).alias("id")),
                              sem_pairs)
        docs = _mat(docs.join(
            sem_keep.filter("keep").select(F.col("id").alias(id_col)),
            id_col, "left_semi"), "semantic_dedup")
        _commit("semantic_dedup",
                {"after_semantic_dedup": docs.count()})

    # 3. quality gate and language gate — independent flags (the lang
    # gate must not silently vanish under --no-quality-gate)
    gates_done = (args.quality_gate or args.lang) and _skip("gates")
    if args.quality_gate and not gates_done:
        good = gopher_quality(docs.withColumnRenamed(id_col, "doc_id")) \
            .filter("passes").select(F.col("doc_id").alias(id_col))
        docs = docs.join(good, id_col, "left_semi")
    if args.lang and not gates_done:
        if "lang" in docs.columns:
            docs = docs.filter(F.col("lang") == args.lang)
        else:
            guessed = lang_scores(
                docs.withColumnRenamed(id_col, "doc_id"))
            docs = docs.join(
                guessed.filter(F.col("lang_guess") == args.lang)
                .select(F.col("doc_id").alias(id_col)),
                id_col, "left_semi")
    if (args.quality_gate or args.lang) and not gates_done:
        docs = _mat(docs, "gates")
        _commit("gates", {"after_quality_gate": docs.count()})

    # 3b. benchmark decontamination — AFTER dedup/quality (cheapest
    # corpus), BEFORE the split (a leaked doc must not reach any split).
    # One broadcast gram probe; clean docs never shuffle.
    if args.decontaminate and not _skip("decontam"):
        from dbpedia_spotlight_spark.operators.decontam import decontaminate
        bench = spark.read.parquet(args.decontaminate)
        before = stats.get(
            "after_quality_gate",
            stats.get("after_semantic_dedup", stats["after_near_dedup"]))
        docs = _mat(decontaminate(
            docs, bench, n=args.decontam_ngram, id_col=id_col), "decontam")
        n = docs.count()
        _commit("decontam", {"after_decontam": n,
                             "n_contaminated": before - n})

    # 3c. perplexity gate (CCNet): train the bigram LM on the reference
    # slice, score every doc, bucket by the scored corpus's own
    # percentiles (at real scale: derive thresholds from a capped
    # sample once, then pass them as constants — the projection path).
    if args.ppl_ref and not _skip("ppl_gate"):
        from dbpedia_spotlight_spark.operators.lm import (
            doc_perplexity, perplexity_buckets, ppl_thresholds,
            train_bigram_lm,
        )
        ref = (docs if args.ppl_ref == "self"
               else spark.read.parquet(args.ppl_ref))
        model = train_bigram_lm(ref, id_col=id_col)
        scored = doc_perplexity(docs, model, id_col=id_col) \
            .localCheckpoint(eager=True)
        lo, hi = ppl_thresholds(scored)
        bucketed = perplexity_buckets(scored, lo, hi)
        if args.ppl_mix:
            from dbpedia_spotlight_spark.operators.sampling import (
                stratified_hash_sample,
            )
            rates = {}
            for part in args.ppl_mix.split(","):
                name, r = part.split("=")
                name = name.strip()
                if name not in ("head", "middle", "tail"):
                    raise SystemExit(
                        f"--ppl-mix: unknown bucket {name!r} "
                        "(expected head/middle/tail)")
                rates[name] = float(r)
            keep_ids = stratified_hash_sample(
                bucketed, rates, "bucket", id_col).select(id_col)
        else:
            keep_buckets = set(args.ppl_keep.split(","))
            keep_ids = (bucketed
                        .filter(F.col("bucket").isin(*keep_buckets))
                        .select(id_col))
        docs = _mat(docs.join(keep_ids, id_col, "left_semi"), "ppl_gate")
        _commit("ppl_gate", {
            "ppl_thresholds": {"head_max": lo, "middle_max": hi},
            "after_ppl_gate": docs.count()})

    # 3d. model-based quality gate (the CCNet classifier-filter shape,
    # distinct from the hand-rule gates in 3): positives = the
    # reference corpus, negatives = a same-size DETERMINISTIC hash
    # sample of the current corpus (noisy labels — some sampled docs
    # are reference-quality; the standard CCNet assumption), features =
    # the cheap quality_scores columns, fit = full-batch logistic GD
    # (one combinable aggregate per step, weights as plan literals),
    # gate = one zero-shuffle scoring pass. At 10^12 rows the fit runs
    # on the sampled slice only; the corpus pays one projection.
    if args.classifier_ref and not _skip("clf_gate"):
        from dbpedia_spotlight_spark.operators.classifier import (
            QUALITY_FEATURES, fit_logreg, score_logreg,
        )
        from dbpedia_spotlight_spark.operators.sampling import hash_sample
        from dbpedia_spotlight_spark.operators.textstats import (
            quality_scores,
        )
        ref = spark.read.parquet(args.classifier_ref)
        # reference rows only need text; key them content-hashed so the
        # feature op has its id column without assuming the ref schema
        ref_docs = ref.select(
            F.xxhash64("text").alias("doc_id"), "text")
        n_ref, n_cur = ref_docs.count(), docs.count()
        neg = hash_sample(
            docs.select(F.col(id_col).alias("doc_id"), "text"),
            min(1.0, n_ref / max(n_cur, 1)), "doc_id", salt="clf-neg")
        # hash_sample gates on int(frac * 2^20) buckets: at extreme
        # corpus/ref ratios (frac < 2^-20) the threshold truncates to 0
        # and the negative class silently vanishes — an all-positive
        # fit would saturate p→1 and the gate would keep everything
        n_neg = neg.count()
        if n_neg == 0:
            raise SystemExit(
                "--classifier-ref: negative sample is empty "
                f"(reference {n_ref} docs vs corpus {n_cur}; sample "
                "fraction truncated to zero) — use a larger reference "
                "corpus or pre-sample the corpus slice to fit on")
        train = (
            quality_scores(ref_docs).withColumn("_y", F.lit(1.0))
            .unionByName(
                quality_scores(neg).withColumn("_y", F.lit(0.0)))
            .select(*QUALITY_FEATURES, "_y"))
        model = fit_logreg(train, QUALITY_FEATURES, "_y",
                           iters=args.classifier_iters)
        keep = (score_logreg(
                    quality_scores(docs.withColumnRenamed(id_col,
                                                          "doc_id")),
                    model, QUALITY_FEATURES)
                .filter(F.col("p") >= args.classifier_threshold)
                .select(F.col("doc_id").alias(id_col)))
        docs = _mat(docs.join(keep, id_col, "left_semi"), "clf_gate")
        _commit("clf_gate", {
            "after_classifier_gate": docs.count(),
            "classifier_weights": dict(zip(QUALITY_FEATURES,
                                           model["weights"])),
            "classifier_bias": model["bias"]})

    # 3e. DSIR selection (the data-mixing shape DISTINCT from the
    # gates above: not "drop what fails a rule" but "resample toward a
    # target distribution"). Weights need two corpus scans (bucket
    # counts, then per-doc sums) against a broadcast <=B-row ratio
    # table; text never shuffles, selection is TakeOrdered (k rows at
    # the driver), and the cut is one broadcast semi-join.
    if args.dsir_target and not _skip("dsir"):
        from dbpedia_spotlight_spark.operators.dsir import dsir_select
        if args.dsir_k <= 0:
            raise SystemExit("--dsir-target requires --dsir-k > 0")
        tgt = spark.read.parquet(args.dsir_target).select("text")
        winners = dsir_select(
            docs.select(F.col(id_col).alias("doc_id"), "text"), tgt,
            args.dsir_k, n_buckets=args.dsir_buckets)
        keep = winners.select(F.col("doc_id").alias(id_col))
        docs = _mat(docs.join(F.broadcast(keep), id_col, "left_semi"),
                    "dsir")
        _commit("dsir", {"after_dsir": docs.count(),
                         "dsir_k": args.dsir_k,
                         "dsir_buckets": args.dsir_buckets})

    # 4. PII scrub (text rewrite, row count unchanged)
    if args.scrub_pii:
        docs = scrub_pii(docs)

    # 5. deterministic split
    if args.split:
        weights = {}
        for part in args.split.split(","):
            name, w = part.split("=")
            weights[name] = float(w)
        docs = hash_split(docs, weights, id_col)

    cat = ParquetCatalog(args.out)
    cat.write(docs, "curated")
    written = cat.read(spark, "curated")
    stats["output_rows"] = written.count()
    if args.split:
        stats["split_counts"] = {
            r["split"]: r["n"]
            for r in written.groupBy("split").agg(F.count("*").alias("n"))
                            .collect()}
    print(json.dumps(stats))
    if own_session:
        spark.stop()
    return stats


if __name__ == "__main__":
    main(sys.argv[1:])
