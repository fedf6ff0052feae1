"""Open relation extraction (operators/relations.py).

Cross-engine value checks live in the rotated pair
(queries.q_mention_relations / sql_mention_relations — DuckDB replays
the annotate chain + pairing + normalization); these tests pin the
semantics against a from-scratch python reference and the gates
one by one.
"""

from __future__ import annotations

import re
from collections import Counter


def _python_relations(docs, mentions, max_gap=80, max_pred_tokens=4):
    """From-scratch reference: adjacent offset-sorted mention pairs,
    normalized middle span, the four gates, then (n, n_docs) counts."""
    text = dict(docs)
    per_doc = {}
    for d, b, e, u in mentions:
        per_doc.setdefault(d, []).append((b, e, u))
    occ = []
    for d, ms in per_doc.items():
        ms.sort()
        for (b1, e1, u1), (b2, e2, u2) in zip(ms, ms[1:]):
            gap = b2 - e1
            if not (0 < gap <= max_gap) or u1 == u2:
                continue
            pred = re.sub(r"\s+", " ", text[d][e1:b2].strip().lower())
            if (not pred or re.search(r"[.!?;:]", pred)
                    or len(pred.split(" ")) > max_pred_tokens):
                continue
            occ.append((u1, pred, u2, d))
    n = Counter((s, p, o) for s, p, o, _ in occ)
    nd = Counter(set(occ))
    docs_per_key = Counter(k[:3] for k in nd)
    return {k: (n[k], docs_per_key[k]) for k in n}


def _frames(spark, docs, mentions):
    d = spark.createDataFrame(docs, "doc_id long, text string")
    m = spark.createDataFrame(
        mentions, "doc_id long, begin int, end int, uri string")
    return d, m


def test_matches_python_reference(spark):
    from dbpedia_spotlight_spark.operators.relations import (
        extract_relations,
    )
    docs = [
        (1, "Berlin is the capital of Germany today"),
        (2, "Paris is the capital of France"),
        (3, "Berlin and Germany. France alone"),
        (4, "solo Berlin"),
        (5, "Berlin is the capital of Germany and Berlin hosts Germany"),
        (6, ""),
    ]
    mentions = [
        (1, 0, 6, "dbr:Berlin"), (1, 25, 32, "dbr:Germany"),
        (2, 0, 5, "dbr:Paris"), (2, 24, 30, "dbr:France"),
        (3, 0, 6, "dbr:Berlin"), (3, 11, 18, "dbr:Germany"),
        (3, 20, 26, "dbr:France"),
        (4, 5, 11, "dbr:Berlin"),
        (5, 0, 6, "dbr:Berlin"), (5, 25, 32, "dbr:Germany"),
        (5, 37, 43, "dbr:Berlin"), (5, 50, 57, "dbr:Germany"),
    ]
    d, m = _frames(spark, docs, mentions)
    got = {(r.subj_uri, r.predicate, r.obj_uri): (r.n, r.n_docs)
           for r in extract_relations(m, d).collect()}
    assert got == _python_relations(docs, mentions)
    # the cross-sentence pair was gated, the within-sentence kept
    assert ("dbr:Germany", "france", "dbr:France") not in got
    assert got[("dbr:Berlin", "is the capital of", "dbr:Germany")] == (2, 2)


def test_gap_and_token_gates(spark):
    from dbpedia_spotlight_spark.operators.relations import (
        extract_relations,
    )
    filler = " ".join(["w"] * 30)                  # 59 chars, 30 tokens
    docs = [(1, f"A {filler} B"), (2, "A near B")]
    mentions = [(1, 0, 1, "u:A"), (1, 62, 63, "u:B"),
                (2, 0, 1, "u:A"), (2, 7, 8, "u:B")]
    d, m = _frames(spark, docs, mentions)
    # default token cap (4) drops doc 1's 30-token span; doc 2 passes
    got = {(r.subj_uri, r.predicate, r.obj_uri)
           for r in extract_relations(m, d).collect()}
    assert got == {("u:A", "near", "u:B")}
    # generous token cap but tight gap cap: still only doc 2
    got2 = {(r.subj_uri, r.predicate, r.obj_uri)
            for r in extract_relations(m, d, max_gap=10,
                                       max_pred_tokens=100).collect()}
    assert got2 == {("u:A", "near", "u:B")}
    # both caps opened: doc 1's long span appears
    got3 = {(r.subj_uri, r.predicate, r.obj_uri)
            for r in extract_relations(m, d, max_gap=100,
                                       max_pred_tokens=100).collect()}
    assert ("u:A", " ".join(["w"] * 30), "u:B") in got3


def test_same_uri_and_touching_mentions_dropped(spark):
    from dbpedia_spotlight_spark.operators.relations import (
        extract_relations,
    )
    docs = [(1, "Berlin near Berlin"), (2, "AB")]
    mentions = [(1, 0, 6, "u:B"), (1, 12, 18, "u:B"),
                (2, 0, 1, "u:A"), (2, 1, 2, "u:C")]   # gap 0
    d, m = _frames(spark, docs, mentions)
    assert extract_relations(m, d).count() == 0


def test_layout_independent(spark):
    from dbpedia_spotlight_spark.operators.relations import (
        extract_relations,
    )
    docs = [(i, f"E{i} links to F{i} plus") for i in range(40)]
    mentions = []
    for i in range(40):
        mentions += [(i, 0, 2, f"u:E{i % 5}"),
                     (i, 12, 14, f"u:F{i % 3}")]
    d, m = _frames(spark, docs, mentions)
    a = {tuple(r) for r in extract_relations(m, d).collect()}
    b = {tuple(r) for r in
         extract_relations(m.repartition(13, "uri"),
                           d.repartition(7)).collect()}
    assert a == b and len(a) > 0


def _random_doc(rng, i):
    """Word-soup doc over a tiny entity/filler vocabulary; returns
    (text, mentions) with python-tracked char offsets (0-based, end
    exclusive — the repo convention)."""
    words = []
    for _ in range(rng.randint(2, 12)):
        if rng.random() < 0.5:
            words.append(f"E{rng.randint(0, 5)}")
        else:
            words.append(rng.choice(["links", "to", "near", "over."]))
    text, mentions, pos = " ".join(words), [], 0
    for w in words:
        if w.startswith("E"):
            mentions.append((i, pos, pos + len(w), f"u:{w}"))
        pos += len(w) + 1
    return text, mentions


def test_maintain_relations_matches_recompute_randomized(spark):
    """Three generations of random edits (delete / rewrite / insert):
    folding each delta through maintain_relations keeps
    rollup_relations(state) identical to a from-scratch
    extract_relations over the live corpus."""
    import random
    from dbpedia_spotlight_spark.operators.relations import (
        doc_relation_occurrences, extract_relations, maintain_relations,
        rollup_relations,
    )
    rng = random.Random(7)
    corpus = {}
    for i in range(30):
        corpus[i] = _random_doc(rng, i)

    def frames(c):
        docs = [(i, t) for i, (t, _) in c.items()]
        ms = [m for _, (_, mm) in c.items() for m in mm]
        d = spark.createDataFrame(docs, "doc_id long, text string")
        m = spark.createDataFrame(
            ms or [(0, 0, 0, "x")],
            "doc_id long, begin int, end int, uri string")
        if not ms:
            m = m.limit(0)
        return d, m

    d0, m0 = frames(corpus)
    state = doc_relation_occurrences(m0, d0).localCheckpoint(eager=True)
    next_id = 100
    for _gen in range(3):
        touched = set()
        for i in list(corpus):
            r = rng.random()
            if r < 0.15:
                del corpus[i]
                touched.add(i)
            elif r < 0.45:
                corpus[i] = _random_doc(rng, i)
                touched.add(i)
        corpus[next_id] = _random_doc(rng, next_id)
        touched.add(next_id)
        next_id += 1

        live = {i: corpus[i] for i in corpus if i in touched}
        nd, nm = frames(live)
        t = spark.createDataFrame([(i,) for i in sorted(touched)],
                                  "doc_id long")
        state, crossing = maintain_relations(state, t, nm, nd)
        state = state.localCheckpoint(eager=True)

        full_d, full_m = frames(corpus)
        got = {(r.subj_uri, r.predicate, r.obj_uri): (r.n, r.n_docs)
               for r in rollup_relations(state).collect()}
        exp = {(r.subj_uri, r.predicate, r.obj_uri): (r.n, r.n_docs)
               for r in extract_relations(full_m, full_d).collect()}
        assert got == exp
        # crossing rows only ever name touched documents
        xs = {r.doc_id for r in crossing.collect()}
        assert xs <= touched


def test_relation_signatures_typing(spark):
    """Type lift: typed endpoints use their type rows (multi-typed
    entities contribute to every type pair), untyped fall back to
    Thing, counts sum per signature."""
    from dbpedia_spotlight_spark.operators.relations import (
        relation_signatures,
    )
    rel = spark.createDataFrame(
        [("u:Berlin", "capital of", "u:Germany", 3, 2),
         ("u:Paris", "capital of", "u:France", 2, 2),
         ("u:X", "near", "u:Berlin", 1, 1)],
        "subj_uri string, predicate string, obj_uri string, "
        "n long, n_docs long")
    types = spark.createDataFrame(
        [("u:Berlin", "City"), ("u:Paris", "City"),
         ("u:Germany", "Country"), ("u:France", "Country"),
         ("u:France", "Place")],                 # multi-typed
        "uri string, type string")
    got = {(r.subj_type, r.predicate, r.obj_type): (r.n, r.n_docs)
           for r in relation_signatures(rel, types).collect()}
    assert got == {
        ("City", "capital of", "Country"): (5, 4),
        ("City", "capital of", "Place"): (2, 2),   # France's 2nd type
        ("Thing", "near", "City"): (1, 1),         # untyped subject
    }


def test_relation_triples_promotion(spark):
    from dbpedia_spotlight_spark.operators.relations import (
        extract_relations, relation_triples,
    )
    docs = [(i, "Berlin is the capital of Germany") for i in range(3)]
    docs.append((99, "Paris maybe near France"))
    mentions = []
    for i in range(3):
        mentions += [(i, 0, 6, "dbr:Berlin"), (i, 25, 32, "dbr:Germany")]
    mentions += [(99, 0, 5, "dbr:Paris"), (99, 18, 24, "dbr:France")]
    d, m = _frames(spark, docs, mentions)
    rel = extract_relations(m, d)
    t = {(r.subj, r.pred, r.obj): (r.n, r.n_docs)
         for r in relation_triples(rel, min_docs=2).collect()}
    assert t == {("dbr:Berlin", "rel:is_the_capital_of",
                  "dbr:Germany"): (3, 3)}


def test_relation_store_follows_kg_delta_log(spark, web_pages, model_bc,
                                             tmp_path):
    """RelationStore.catchup collapses the pending KG delta-log tail
    into one per-doc-replace fold and lands on exactly the relation
    table a batch extract_relations over the final crawl state gives;
    an update batch is followed incrementally (cost ∝ touched urls by
    construction of maintain_relations); a second catchup is a no-op."""
    import datetime

    from pyspark.sql import functions as F

    from dbpedia_spotlight_spark.operators.relations import (
        extract_relations)
    from dbpedia_spotlight_spark.pipeline import PipelineConfig, annotate
    from dbpedia_spotlight_spark.streaming.kg_stream import (
        KGStore, RelationStore, apply_pages_batch)

    cfg = PipelineConfig(disambiguator="generative")
    cols = ["url", "warc_ts", "text", "lang"]
    rows = web_pages.select(*cols).orderBy("url").collect()
    schema = web_pages.select(*cols).schema
    kg = KGStore(spark, str(tmp_path / "kg"))
    pages0 = spark.createDataFrame(rows[:20], schema)
    apply_pages_batch(spark, pages0, model_bc, kg, batch_id=0, cfg=cfg)

    def expected(pages):
        m = annotate(spark, pages, model_bc, cfg).select(
            "url", "begin", "end", "uri")
        return {tuple(r) for r in extract_relations(
            m, pages.select("url", "text"), id_col="url").collect()}

    rstore = RelationStore(spark, str(tmp_path / "rel"))
    s0 = rstore.catchup(kg, pages0.select("url", "text"))
    assert s0["gens_folded"] == 1 and s0["gen"] == 0
    assert s0["rel_added"] > 0 and s0["rel_removed"] == 0
    got0 = {tuple(r) for r in rstore.read_relations().collect()}
    assert got0 == expected(pages0) and got0

    # recrawl: two urls change content (text swapped from other docs,
    # strictly newer warc_ts) — only their contributions may move
    recrawl = [
        (rows[i][0], rows[i][1] + datetime.timedelta(days=1),
         rows[i + 7][2], rows[i][3])
        for i in range(2)
    ]
    apply_pages_batch(spark, spark.createDataFrame(recrawl, schema),
                      model_bc, kg, batch_id=1, cfg=cfg)
    assert kg.latest_gen() == 1

    swapped = {rows[i][0]: rows[i + 7][2] for i in range(2)}
    final_rows = [(u, ts, swapped.get(u, t), lg)
                  for (u, ts, t, lg) in rows[:20]]
    final_pages = spark.createDataFrame(final_rows, schema)
    s1 = rstore.catchup(kg, final_pages.select("url", "text"))
    assert s1["gens_folded"] == 1 and s1["gen"] == 1
    got1 = {tuple(r) for r in rstore.read_relations().collect()}
    assert got1 == expected(final_pages) and got1

    # untouched documents' per-doc state never recomputed away
    untouched = (rstore.read_doc_rel()
                 .filter(~F.col("url").isin(list(swapped))))
    assert untouched.count() > 0

    again = rstore.catchup(kg, final_pages.select("url", "text"))
    assert again["gens_folded"] == 0 and again["gen"] == 1
    assert {tuple(r) for r in rstore.read_relations().collect()} == got1


def test_canonicalize_relations(spark):
    """Alias endpoints merge (n sums), pairs collapsing to one
    canonical entity drop (the distinct-endpoint gate re-applied
    post-merge), unmapped entities pass through, and rollup over the
    canonicalized per-doc table counts a document backing TWO alias
    pre-images of one canonical pair exactly once."""
    from dbpedia_spotlight_spark.operators.relations import (
        canonicalize_relations, rollup_relations)
    doc_rel = spark.createDataFrame(
        [(1, "A1", "loves", "B", 2),
         (1, "A2", "loves", "B", 1),
         (2, "A2", "loves", "B", 1),
         (3, "A1", "hates", "A2", 4),
         (3, "B", "sees", "C", 1)],
        "doc_id long, subj_uri string, predicate string, "
        "obj_uri string, n long")
    labels = spark.createDataFrame(
        [("A1", "A1"), ("A2", "A1")], "id string, comp string")
    per_doc = canonicalize_relations(doc_rel, labels)
    assert {tuple(r) for r in per_doc.collect()} == {
        (1, "A1", "loves", "B", 3),
        (2, "A1", "loves", "B", 1),
        (3, "B", "sees", "C", 1)}
    roll = rollup_relations(per_doc)
    assert {tuple(r) for r in roll.collect()} == {
        ("A1", "loves", "B", 4, 2),
        ("B", "sees", "C", 1, 1)}


def test_embedding_store_follows_relation_store(spark, web_pages,
                                                model_bc, tmp_path):
    """EmbeddingStore.catchup trains over the relation store's live
    triples and equals a from-scratch train at the same cumulative
    step count on an UNCHANGED triple set (the bit-exact warm-start
    contract); meta tracks steps; a caught-up store no-ops; dim
    changes raise."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from dbpedia_spotlight_spark.operators.kgembed import train_transe
    from dbpedia_spotlight_spark.operators.relations import (
        relation_triples)
    from dbpedia_spotlight_spark.pipeline import PipelineConfig
    from dbpedia_spotlight_spark.streaming.kg_stream import (
        EmbeddingStore, KGStore, RelationStore, apply_pages_batch)

    cfg = PipelineConfig(disambiguator="generative")
    cols = ["url", "warc_ts", "text", "lang"]
    rows = web_pages.select(*cols).orderBy("url").collect()
    schema = web_pages.select(*cols).schema
    kg = KGStore(spark, str(tmp_path / "kg"))
    pages = spark.createDataFrame(rows[:30], schema)
    apply_pages_batch(spark, pages, model_bc, kg, batch_id=0, cfg=cfg)
    rstore = RelationStore(spark, str(tmp_path / "rel"))
    rstore.catchup(kg, pages.select("url", "text"))

    estore = EmbeddingStore(spark, str(tmp_path / "emb"))
    s1 = estore.catchup(rstore, dim=6, steps=2, lr=0.05, min_docs=1)
    assert s1["trained"] == 2 and s1["steps_done"] == 2
    assert s1["gen"] == rstore.latest_gen()
    # caught-up: no-op
    s2 = estore.catchup(rstore, dim=6, steps=2, lr=0.05, min_docs=1)
    assert s2["trained"] == 0 and s2["steps_done"] == 2
    # snapshot the gen-0 embeddings, then a REAL content change (text
    # swapped from another doc, newer warc_ts) advances KG + relation
    # store; the next catchup must equal an externally-replicated
    # resume over the NEW triple set — carried names keep trained
    # vectors, delta names enter at hash init, bit-exactly
    prev_emb = estore.read_embeddings().localCheckpoint(eager=True)
    import datetime
    r0, r1 = rows[0], rows[1]
    recrawl = spark.createDataFrame(
        [(r0.url, r0.warc_ts + datetime.timedelta(days=1), r1.text,
          r0.lang)], schema)
    apply_pages_batch(spark, recrawl, model_bc, kg, batch_id=1, cfg=cfg)
    live = spark.createDataFrame(
        [(r0.url, r1.text)] + [(r.url, r.text) for r in rows[1:30]],
        "url string, text string")
    rstore.catchup(kg, live)
    s3 = estore.catchup(rstore, dim=6, steps=2, lr=0.05, min_docs=1)
    assert s3["steps_done"] == 4 and s3["trained"] == 2
    assert s3["gen"] == rstore.latest_gen()
    got = {(r.kind, r.name): tuple(r.v)
           for r in estore.read_embeddings().collect()}
    trips = relation_triples(rstore.read_relations(), min_docs=1) \
        .select("subj", "pred", "obj")
    want = {(r.kind, r.name): tuple(r.v)
            for r in train_transe(trips, dim=6, n_steps=2, lr=0.05,
                                  resume_from=prev_emb,
                                  step_offset=2).collect()}
    assert got == want
    with _pt.raises(ValueError, match="dim"):
        estore.catchup(rstore, dim=8, steps=1)
    # fresh store on a relation store with no generation raises
    with _pt.raises(ValueError, match="no live generation"):
        EmbeddingStore(spark, str(tmp_path / "emb2")).catchup(
            RelationStore(spark, str(tmp_path / "rel2")), dim=6)


def test_embedding_store_distmult_model(spark, web_pages, model_bc,
                                        tmp_path):
    """model='distmult' trains the bilinear geometry (≠ the transe
    vectors on the same triples), pins the model in meta, and refuses
    a model switch on an existing store."""
    import pytest as _pt

    from dbpedia_spotlight_spark.operators.kgembed import train_distmult
    from dbpedia_spotlight_spark.operators.relations import (
        relation_triples)
    from dbpedia_spotlight_spark.pipeline import PipelineConfig
    from dbpedia_spotlight_spark.streaming.kg_stream import (
        EmbeddingStore, KGStore, RelationStore, apply_pages_batch)

    cfg = PipelineConfig(disambiguator="generative")
    cols = ["url", "warc_ts", "text", "lang"]
    rows = web_pages.select(*cols).orderBy("url").collect()
    schema = web_pages.select(*cols).schema
    kg = KGStore(spark, str(tmp_path / "kg"))
    pages = spark.createDataFrame(rows[:30], schema)
    apply_pages_batch(spark, pages, model_bc, kg, batch_id=0, cfg=cfg)
    rstore = RelationStore(spark, str(tmp_path / "rel"))
    rstore.catchup(kg, pages.select("url", "text"))

    dm = EmbeddingStore(spark, str(tmp_path / "dm"))
    s = dm.catchup(rstore, dim=6, steps=2, lr=0.05, min_docs=1,
                   model="distmult")
    assert s["trained"] == 2
    assert dm.read_meta()["model"] == "distmult"
    trips = relation_triples(rstore.read_relations(), min_docs=1) \
        .select("subj", "pred", "obj")
    want = {(r.kind, r.name): tuple(r.v)
            for r in train_distmult(trips, dim=6, n_steps=2,
                                    lr=0.05).collect()}
    got = {(r.kind, r.name): tuple(r.v)
           for r in dm.read_embeddings().collect()}
    assert got == want
    with _pt.raises(ValueError, match="model"):
        dm.catchup(rstore, dim=6, steps=1, model="transe")
    with _pt.raises(ValueError, match="model"):
        dm.catchup(rstore, dim=6, steps=1, model="rotate")
