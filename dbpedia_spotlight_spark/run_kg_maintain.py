"""spark-submit entrypoint: incremental KG maintenance as a job.

    spark-submit --py-files dbpedia_spotlight_spark.zip \
        dbpedia_spotlight_spark/run_kg_maintain.py \
        --pages /data/incoming_pages --lexicon /models/en \
        --kg /data/kg --checkpoint /data/kg_ck --stream

Folds (re)crawled pages into the materialized triple store
(``streaming.kg_stream``): per batch, annotate → ``triple_delta`` vs
the live generation → ``apply_delta`` → next generation + delta_log
(per-url-replace semantics; flat ~2-generation storage; replays are
no-ops — see the module docstring). Two run shapes:

* ``--stream``: Structured Streaming ``foreachBatch`` drain with
  ``availableNow`` — processes whatever is in --pages then exits, the
  cron-able "catch up on the crawl" form; the streaming checkpoint plus
  the store's last-applied-batch_id guard make restarts effectively-once.
* default (batch): ONE ``apply_pages_batch`` fold of the whole input —
  the spark-submit form of a scheduled recrawl merge.

``--entail DIR`` additionally catches the counting-IVM entailed-type
store (``EntailStore``) up to the new KG generation — asserted types of
linked entities plus rdfs:9 inheritance through the ``--ontology``
subClassOf edges, maintained per delta, never recomputed corpus-scale.
``--graph DIR`` does the same for the co-mention entity graph
(``GraphStore``: page→entity incidence + co-occurrence edge counts,
touched-pages-only pair recomputation). ``--relations DIR`` does the
same for the open-relation table (``RelationStore``: per-doc-replace
fold; text from this run's --pages, or ``--relations-corpus`` when the
store lags by more than one run).

Also callable in-process via ``main(argv, spark=...)`` (tests).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="incremental KG maintenance")
    ap.add_argument("--pages", required=True,
                    help="parquet dir of (re)crawled web_pages")
    ap.add_argument("--lexicon", required=True,
                    help="dir of lexicon parquet tables (model plane)")
    ap.add_argument("--kg", required=True,
                    help="KG store root (generations + delta_log)")
    ap.add_argument("--checkpoint", default="",
                    help="streaming checkpoint dir (--stream; default "
                         "<kg>/_checkpoint)")
    ap.add_argument("--stream", action="store_true",
                    help="foreachBatch availableNow drain instead of one "
                         "batch fold")
    ap.add_argument("--max-files-per-trigger", type=int, default=0,
                    help=">0: bound micro-batch size by file count")
    ap.add_argument("--batch-id", type=int, default=-1,
                    help="batch mode: explicit change-log batch id "
                         "(default: last applied + 1)")
    ap.add_argument("--expire-log", type=int, default=0,
                    help=">0: after the fold, drop delta_log partitions "
                         "older than the newest N generations")
    ap.add_argument("--entail", default="",
                    help="entailed-type state store root: after the "
                         "fold, catch the counting-IVM entailment "
                         "states up to the new KG generation")
    ap.add_argument("--ontology", default="",
                    help="(sub, sup) subClassOf edges: a parquet path, "
                         "or an N-Triples dump (*.nt / *.nt.gz — "
                         "rdfs:subClassOf statements are extracted, "
                         "the form published ontologies ship in); "
                         "omitted = no hierarchy (entailed view = "
                         "asserted types of linked entities)")
    ap.add_argument("--graph", default="",
                    help="co-mention graph state store root: after the "
                         "fold, catch the counting-IVM entity graph "
                         "(incidence + edges) up to the new KG "
                         "generation")
    ap.add_argument("--relations", default="",
                    help="open-relation state store root: after the "
                         "fold, catch the per-doc relation table "
                         "(RelationStore) up to the new KG generation. "
                         "Default text source is this run's --pages "
                         "(valid when the store was caught up before "
                         "the run — the guard raises otherwise)")
    ap.add_argument("--relations-corpus", default="",
                    help="with --relations: parquet of the FULL live "
                         "corpus (url + text/html) — required when the "
                         "relation store lags the KG by more than this "
                         "run's fold, since --pages then does not cover "
                         "all touched urls")
    ap.add_argument("--shapes", default="",
                    help="JSON file of SHACL-lite shape dicts "
                         "(operators/shapes.py schema): validate the "
                         "new snapshot, write the report parquet to "
                         "<kg>/_shape_report/gen=N, record counts")
    ap.add_argument("--max-violations", type=int, default=-1,
                    help=">=0: fail the run (exit after metrics are "
                         "written) when the shape report carries more "
                         "than this many violations")
    ap.add_argument("--er-keys", default="",
                    help="comma list of quasi-key predicates: discover "
                         "owl:sameAs edges over the new snapshot "
                         "(operators/er.py) and write them to "
                         "<kg>/_sameas/gen=N for downstream "
                         "canonicalize_triples")
    ap.add_argument("--er-store", default="",
                    help="with --er-keys: maintain the sameAs edge set "
                         "INCREMENTALLY in this state-store root "
                         "(SameasStore catch-up over the delta log — "
                         "touched-block IVM) instead of re-running the "
                         "batch discovery per fold")
    ap.add_argument("--er-components", action="store_true",
                    help="with --er-store: also maintain the canonical "
                         "component map (maintain_components chained on "
                         "each generation's sameAs edge delta)")
    ap.add_argument("--er-name-pred", default="foaf:name")
    ap.add_argument("--er-max-name-dist", type=int, default=2)
    ap.add_argument("--er-min-shared", type=int, default=2)
    ap.add_argument("--er-max-block", type=int, default=64)
    ap.add_argument("--embeddings", default="",
                    help="root of a derived TransE EmbeddingStore "
                         "(requires --relations: embeddings refresh "
                         "over the corroborated relation triples, "
                         "warm-started bit-exactly from the live "
                         "generation)")
    ap.add_argument("--embed-dim", type=int, default=16)
    ap.add_argument("--embed-steps", type=int, default=2)
    ap.add_argument("--embed-lr", type=float, default=0.1)
    ap.add_argument("--embed-min-docs", type=int, default=2)
    ap.add_argument("--embed-model", default="transe",
                    choices=("transe", "distmult", "complex"))
    ap.add_argument("--verify", action="store_true",
                    help="after the fold, recompute the live "
                         "snapshot's content digest and compare with "
                         "the incrementally-maintained record "
                         "(KGStore.verify_snapshot); a mismatch "
                         "raises — the snapshot and the folded log "
                         "have diverged")
    ap.add_argument("--metrics-out", default="",
                    help="write the run stats JSON to this local path "
                         "as well as stdout")
    ap.add_argument("--confidence", type=float, default=0.0)
    ap.add_argument("--support", type=int, default=0)
    ap.add_argument("--disambiguator", default="generative",
                    choices=["generative", "tficf", "prior"])
    ap.add_argument("--lang", default="en")
    return ap


def main(argv: list[str] | None = None,
         spark: SparkSession | None = None) -> dict:
    from dbpedia_spotlight_spark.model import load_model
    from dbpedia_spotlight_spark.pipeline import PipelineConfig
    from dbpedia_spotlight_spark.streaming.kg_stream import (
        KGStore, apply_pages_batch, maintain_kg_stream,
    )

    args = build_parser().parse_args(argv)
    own_session = spark is None
    if own_session:
        spark = (
            SparkSession.builder.appName("spotlight-spark-kg-maintain")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
            .getOrCreate()
        )

    cfg = PipelineConfig(
        confidence=args.confidence,
        support=args.support,
        disambiguator=args.disambiguator,
        lang=args.lang or None,
    )
    model = load_model(spark, args.lexicon)
    bc = spark.sparkContext.broadcast(model)

    stats: dict = {"kg": args.kg, "mode": "stream" if args.stream
                   else "batch"}
    # KG generation BEFORE this run's fold — the --relations default-
    # corpus guard needs it (touched urls of gens created this run are
    # covered by --pages; earlier pending gens are not)
    pre_gen = KGStore(spark, args.kg).latest_gen()
    if args.stream:
        batches: list = []
        store = maintain_kg_stream(
            spark, args.pages, bc, args.kg,
            args.checkpoint or f"{args.kg}/_checkpoint", cfg,
            max_files_per_trigger=(args.max_files_per_trigger or None),
            metrics_log=batches)
        stats["batches"] = batches
        stats["n_changes"] = sum(b.get("n_changes", 0) for b in batches)
    else:
        store = KGStore(spark, args.kg)
        last = store.latest_batch_id()
        batch_id = args.batch_id if args.batch_id >= 0 else (
            0 if last is None else last + 1)
        pages = spark.read.parquet(args.pages)
        m: dict = {}
        n_changes = apply_pages_batch(spark, pages, bc, store, batch_id,
                                      cfg, metrics=m)
        stats["batch_id"] = batch_id
        stats["n_changes"] = n_changes
        stats["n_added"] = m.get("n_added", 0)
        stats["n_removed"] = m.get("n_removed", 0)

    if args.verify:
        v = store.verify_snapshot()
        stats["verify"] = v
        if not v["ok"]:
            raise RuntimeError(
                "KG snapshot digest mismatch: expected "
                f"({v['n_expected']}, {v['digest_expected']}), got "
                f"({v['n_actual']}, {v['digest_actual']}) — the live "
                "snapshot and the folded change log have diverged")

    if args.entail:
        from pyspark.sql import functions as F

        from dbpedia_spotlight_spark.operators.ontology import (
            subclass_closure)
        from dbpedia_spotlight_spark.streaming.kg_stream import EntailStore

        entity_types = (
            spark.read.parquet(f"{args.lexicon}/entities.parquet")
            .select("uri", F.explode("types").alias("typ")))
        if args.ontology:
            onto = args.ontology.rstrip("/")
            if onto.endswith((".nt", ".nt.gz", ".nq", ".nq.gz")):
                from dbpedia_spotlight_spark.sources.ntriples import (
                    read_ntriples, subclass_edges)
                edges = subclass_edges(read_ntriples(spark, args.ontology))
            elif onto.endswith((".ttl", ".ttl.gz")):
                from dbpedia_spotlight_spark.sources.ntriples import (
                    subclass_edges)
                from dbpedia_spotlight_spark.sources.turtle import (
                    read_turtle)
                edges = subclass_edges(read_turtle(spark, args.ontology))
            else:
                edges = spark.read.parquet(args.ontology) \
                    .select("sub", "sup")
            closure = subclass_closure(edges).localCheckpoint(eager=True)
        else:
            closure = spark.createDataFrame(
                [], "sub string, sup string, depth int")
        estore = EntailStore(spark, args.entail)
        stats["entail"] = estore.catchup(store, entity_types, closure)

    if args.graph:
        from dbpedia_spotlight_spark.streaming.kg_stream import GraphStore

        gstore = GraphStore(spark, args.graph)
        stats["graph"] = gstore.catchup(store)

    if args.relations:
        from pyspark.sql import functions as F

        from dbpedia_spotlight_spark.operators.webstats import (
            latest_capture)
        from dbpedia_spotlight_spark.pipeline import extract_text
        from dbpedia_spotlight_spark.streaming.kg_stream import (
            RelationStore)

        rstore = RelationStore(spark, args.relations)
        if args.relations_corpus:
            corpus = spark.read.parquet(args.relations_corpus)
        else:
            rg = rstore.latest_gen()
            if not (pre_gen is None
                    or (rg is not None and rg >= pre_gen)):
                raise ValueError(
                    "--relations store lags the KG by more than this "
                    "run's fold, so --pages does not cover all touched "
                    "urls; pass --relations-corpus with the full live "
                    "corpus")
            corpus = spark.read.parquet(args.pages)
        if "warc_ts" in corpus.columns:
            corpus = latest_capture(corpus, key_col="url",
                                    ts_col="warc_ts")
        # offsets in the NIF subjects refer to the EXTRACTED text —
        # slice predicate surfaces from the same bytes annotate saw
        if "html" in corpus.columns:
            corpus = extract_text(corpus).select(
                "url", F.col("extracted_text").alias("text"))
        else:
            corpus = corpus.select("url", "text")
        # metrics stay delta-sized (rel_added/rel_removed from the
        # fold's crossing frame) — a global read_relations().count()
        # would scan the corpus-sized state every incremental run
        stats["relations"] = rstore.catchup(store, corpus)

    if args.embeddings:
        if not args.relations:
            raise ValueError("--embeddings requires --relations (the "
                             "EmbeddingStore follows the relation "
                             "store's generations)")
        from dbpedia_spotlight_spark.streaming.kg_stream import (
            EmbeddingStore)
        estore = EmbeddingStore(spark, args.embeddings)
        stats["embeddings"] = estore.catchup(
            rstore, dim=args.embed_dim, steps=args.embed_steps,
            lr=args.embed_lr, min_docs=args.embed_min_docs,
            model=args.embed_model)

    if args.shapes:
        from dbpedia_spotlight_spark.operators.shapes import (
            shape_summary, validate_shapes, validate_shapes_delta)
        with open(args.shapes) as fh:
            shape_defs = json.load(fh)
        gen = store.latest_gen() or 0
        sig = json.dumps(shape_defs, sort_keys=True)
        shape_mode = "full"
        report = None
        if gen > 0:
            # incremental when the IMMEDIATELY previous generation has
            # a report built from the SAME shape definitions: fold this
            # run's delta slice into it (tracks |delta|, not |KG|);
            # any gap or shape change → full revalidation
            try:
                meta = spark.read.parquet(
                    f"{args.kg}/_shape_report/gen={gen - 1}_meta")
                if [r["sig"] for r in meta.collect()] == [sig]:
                    prev = spark.read.parquet(
                        f"{args.kg}/_shape_report/gen={gen - 1}")
                    report = validate_shapes_delta(
                        store.read(), store.read_log(since_gen=gen - 1),
                        shape_defs, prev)
                    shape_mode = "incremental"
            except Exception:
                report = None
        if report is None:
            report = validate_shapes(store.read(), shape_defs)
        out = f"{args.kg}/_shape_report/gen={gen}"
        report.write.mode("overwrite").parquet(out)
        spark.createDataFrame([(sig,)], "sig string").coalesce(1) \
            .write.mode("overwrite").parquet(f"{out}_meta")
        # summarize from the written parquet: one bounded scan, and the
        # metrics describe exactly what landed on disk
        summ = shape_summary(spark.read.parquet(out)).collect()
        stats["shapes"] = {
            "out": out,
            "mode": shape_mode,
            "n_violations": int(sum(r["n_violations"] for r in summ)),
            "by_component": {
                f'{r["shape"]}|{r["path"]}|{r["component"]}':
                    int(r["n_violations"]) for r in summ},
        }
        stats["shapes"]["gate_passed"] = (
            args.max_violations < 0
            or stats["shapes"]["n_violations"] <= args.max_violations)

    if args.er_keys and args.er_store:
        from dbpedia_spotlight_spark.streaming.kg_stream import SameasStore
        er_st = SameasStore(spark, args.er_store)
        stats["er"] = er_st.catchup(
            store, [k for k in args.er_keys.split(",") if k],
            components=args.er_components,
            name_pred=args.er_name_pred,
            max_name_dist=args.er_max_name_dist,
            min_shared=args.er_min_shared,
            max_block=args.er_max_block)
        stats["er"]["n_edges"] = er_st.read_edges().count()
    elif args.er_keys:
        from dbpedia_spotlight_spark.operators.er import er_sameas
        edges = er_sameas(
            store.read(),
            [k for k in args.er_keys.split(",") if k],
            name_pred=args.er_name_pred,
            max_name_dist=args.er_max_name_dist,
            min_shared=args.er_min_shared,
            max_block=args.er_max_block)
        out = f"{args.kg}/_sameas/gen={store.latest_gen()}"
        edges.write.mode("overwrite").parquet(out)
        stats["er"] = {"out": out,
                       "n_edges": spark.read.parquet(out).count()}

    if args.expire_log > 0:
        stats["log_partitions_dropped"] = store.expire_delta_log(
            args.expire_log)
    stats["gen"] = store.latest_gen()
    stats["last_batch_id"] = store.latest_batch_id()
    stats["kg_rows"] = store.read().count()
    print(json.dumps(stats))
    if args.metrics_out:
        with open(args.metrics_out, "w") as fh:
            json.dump(stats, fh)
    if own_session:
        spark.stop()
    if args.shapes and not stats["shapes"]["gate_passed"]:
        raise RuntimeError(
            f"shape gate failed: {stats['shapes']['n_violations']} "
            f"violations > --max-violations {args.max_violations} "
            f"(report at {stats['shapes']['out']})")
    return stats


if __name__ == "__main__":
    main(sys.argv[1:])
