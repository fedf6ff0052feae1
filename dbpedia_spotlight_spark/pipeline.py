"""The annotate pipeline (SURVEY.md §3.1) — Spark-first design.

Reference lifecycle: Annotate.java → SpotlightInterface → tokenizer →
FSASpotter → DBCandidateSearcher → DBTwoStepDisambiguator.bestK →
CombineAllAnnotationFilters → serializer (SURVEY §3.1 [U]).

Spark design decision (scale rationale): entity linking is
**embarrassingly parallel per document** — nothing in
spot→candidates→disambiguate→filter crosses document boundaries. The
reference exploits this with request threads; the idiomatic Spark
equivalent is a *single mapInPandas pass* with the model broadcast:

    read parquet/iceberg (url, html[, lang])     ← column-pruned scan
      → filter(lang = 'en')                      ← pushed to the scan
      → mapInPandas(annotate_batch)              ← ONE JVM↔Python crossing
      → write triples

Zero shuffles, no skewed groupBy: a 100 TB corpus maps straight through.
Mega-host url skew is irrelevant (work ∝ bytes per partition, set by
``spark.sql.files.maxPartitionBytes``); stopword-like surface-form skew is
killed *inside* the UDF by the annotationProbability spot gate and
candidate top-K pruning before scoring (north_star: "candidate-list
pruning before the disambiguation shuffle" — here the shuffle is removed
entirely, which is strictly better).

A relational path (explode → broadcast join → window) is kept for
transparency and as the oracle cross-check (§3.1's DAG); tests assert the
two paths agree row-for-row.
"""

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from dbpedia_spotlight_spark.functions.extraction import strip_html
from dbpedia_spotlight_spark.functions.tokenizer import tokenize
from dbpedia_spotlight_spark.functions.automaton import resolve_overlaps
from dbpedia_spotlight_spark.model import SpotlightModel, context_loglik, tficf_scores


@dataclass
class PipelineConfig:
    """The reference's REST parameter surface as config (SURVEY §2.12)."""

    confidence: float = 0.0          # F1
    support: int = 0                 # F2
    types: tuple[str, ...] = ()      # F3 whitelist/blacklist
    policy: str = "whitelist"        # 'whitelist' | 'blacklist'
    disambiguator: str = "generative"  # 'prior' (D8) | 'generative' (D2) | 'tficf' (D3)
    spotter: str = "fsa"             # P1 'fsa' | P3 'npchunk' (chunk-exact)
    k: int = 1                       # D6 bestK
    max_candidates: int = 20         # C2 pruning before scoring
    lang: str | None = "en"
    coreference: bool = False        # F5

    def __post_init__(self) -> None:
        if self.disambiguator not in ("prior", "generative", "tficf"):
            raise ValueError(f"unknown disambiguator: {self.disambiguator}")
        if self.spotter not in ("fsa", "npchunk"):
            raise ValueError(
                f"unknown spotter: {self.spotter} ('fsa' is the "
                "statistical-backend spotter P1; 'npchunk' is the "
                "chunk-exact precision spotter P3; wiki-markup input goes "
                "through sources.wikimarkup)")


ANNOTATION_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("begin", IntegerType()),
    StructField("end", IntegerType()),
    StructField("surface_form", StringType()),
    StructField("uri", StringType()),
    StructField("rank", IntegerType()),
    StructField("similarity_score", DoubleType()),
    StructField("percentage_of_second_rank", DoubleType()),
    StructField("support", LongType()),
    StructField("types", ArrayType(StringType())),
])

SPOT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("begin", IntegerType()),
    StructField("end", IntegerType()),
    StructField("surface_form", StringType()),
    StructField("sf_id", IntegerType()),
    StructField("annotation_probability", DoubleType()),
])

# per-worker broadcast-deserialization cache (SURVEY §3.1: each Python
# worker materializes the model once, not once per task)
_MODEL_CACHE: dict[int, SpotlightModel] = {}


def _get_model(bc) -> SpotlightModel:
    # key by the broadcast's unique spill path (worker-side Broadcast
    # carries no .id) — NOT id(bc): CPython reuses freed addresses, so a
    # second broadcast in the same driver can collide with a stale cache
    # entry in a reused worker and silently annotate with the WRONG model
    key = getattr(bc, "_path", None) or id(bc)
    m = _MODEL_CACHE.get(key)
    if m is None:
        m = bc.value
        _MODEL_CACHE.clear()
        _MODEL_CACHE[key] = m
    return m


def _token_lookup(model: SpotlightModel):
    """token → id lookup fn honoring the model's T2 stemmer. Identity
    models keep the raw dict.get (no per-token call overhead on the
    flagship hot loop); stemming models compose stem→lookup."""
    if model.stemmer == "identity":
        return model.token_index.get
    from dbpedia_spotlight_spark.functions.stemmer import get_stemmer
    st = get_stemmer(model.stemmer)
    tix = model.token_index.get

    def lookup(t: str, default=None):
        return tix(st(t), default)

    return lookup


def _bag(counts: dict[int, int]) -> tuple[np.ndarray, np.ndarray]:
    if counts:
        q_tokens = np.fromiter(sorted(counts), dtype=np.int64)
        q_counts = np.array([counts[t] for t in q_tokens], dtype=np.float64)
        return q_tokens, q_counts
    return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)


def _doc_spots(model: SpotlightModel, text: str, spotter: str = "fsa"):
    """Tokenize (T1/T5) + spot (P1 FSA / P3 chunk-exact) + gate (P2) +
    overlap resolve (P4) + per-paragraph context bags (D1 step 1 — the
    reference's two-step disambiguator builds ONE context query per
    *paragraph*, db/DBTwoStepDisambiguator.scala [U]; paragraphs are the
    '\\n'-separated lines of the extracted text).

    ``spotter='npchunk'`` (P3, OpenNLPChunkerSpotter semantics [U]): a
    chunk is a maximal stopword-free token run (the model-free shallow
    NP heuristic — no OpenNLP models in this stack); a spot is emitted
    only when the ENTIRE chunk is a lexicon surface form — the
    precision-oriented spotter (e.g. 'big table scan' yields no spot
    even though 'table scan' is an sf). Chunk-exact matches cannot
    overlap, so P4 resolution is a no-op on this path.

    Returns (spots, bags): spots = [(begin, end, sf_id, para_idx)] in char
    coords of ``text``; bags[para_idx] = (q_tokens sorted, q_counts)."""
    toks = tokenize(text)
    lookup = _token_lookup(model)

    # paragraph boundaries: char offset of each '\n' in the text
    bounds: list[int] = []
    pos = text.find("\n")
    while pos != -1:
        bounds.append(pos)
        pos = text.find("\n", pos + 1)

    # ONE pass over the tokens builds both the id stream (automaton
    # input) and the per-paragraph context bags: tokens arrive in char
    # order, so the paragraph index advances with a monotone pointer —
    # no per-token bisect, no second zip pass
    n_paras = len(bounds) + 1
    counts: list[dict[int, int]] = [dict() for _ in range(n_paras)]
    stop = model.stopwords
    ids: list[int] = []
    ap_ids = ids.append
    bi, nb = 0, len(bounds)
    cur = counts[0]
    for (b, _, t) in toks:
        tid = lookup(t, -1)
        ap_ids(tid)
        if tid >= 0 and t not in stop:
            if bi < nb and b > bounds[bi]:
                while bi < nb and b > bounds[bi]:
                    bi += 1
                cur = counts[bi]
            cur[tid] = cur.get(tid, 0) + 1
    matches = model.automaton.find_all(ids)
    if spotter == "npchunk":
        # chunk span per token index: runs delimited by stopwords
        chunk_of: list[tuple[int, int] | None] = [None] * len(toks)
        start = None
        for i, (_, _, t) in enumerate(toks):
            if t in model.stopwords:
                if start is not None:
                    for j in range(start, i):
                        chunk_of[j] = (start, i)
                    start = None
            elif start is None:
                start = i
        if start is not None:
            for j in range(start, len(toks)):
                chunk_of[j] = (start, len(toks))
        matches = [m for m in matches
                   if chunk_of[m[0]] == (m[0], m[1])]
    # spot gate BEFORE overlap resolution: below-gate spots must not block
    # legitimate overlapping spots (DBSpotter threshold gating [U])
    gated = [m for m in matches if model.sf_ann_prob[m[2]] >= model.spot_threshold]
    kept = resolve_overlaps(gated)

    if bounds:
        def para_of(char_begin: int) -> int:
            return bisect.bisect_right(bounds, char_begin)
    else:
        # single-paragraph fast path: skip the per-token bisect entirely
        def para_of(char_begin: int) -> int:
            return 0

    spots = [
        (toks[s][0], toks[e - 1][1], sf_id, para_of(toks[s][0]))
        for (s, e, sf_id) in kept
    ]

    # bags built in the single token pass above (two-step step 1)
    bags = [_bag(c) for c in counts]
    return spots, bags


def _score_doc(model: SpotlightModel, cfg: PipelineConfig, spots, bags):
    """Disambiguate all spots of one document (D1–D7), each against its
    paragraph's context bag. Yields rows
    (begin, end, sf_id, entity_id, rank, similarity, pct_second).

    Scores depend only on (paragraph, surface form) — repeated mentions
    of the same sf in a paragraph (Zipf-frequent in real corpora) are
    scored ONCE per doc via a memo. On the generative path, all of a
    paragraph's multi-candidate scorings run as ONE batched
    context_loglik call (per-entity math is unchanged — the function
    iterates entities — so results are bit-identical; the win is numpy
    small-array call overhead, ~25% of the hot loop)."""
    out = []
    memo: dict[tuple[int, int], list] = {}

    if cfg.disambiguator == "generative":
        # pass 1: resolve trivial cases, collect multi-candidate work
        pending: dict[int, list[int]] = {}
        for (_b, _e, sf_id, para_idx) in spots:
            key = (para_idx, sf_id)
            if key in memo:
                continue
            lo, hi = model.cand_indptr[sf_id], model.cand_indptr[sf_id + 1]
            if hi <= lo:
                memo[key] = []  # NIL (C3)
            elif hi - lo == 1:
                memo[key] = [(int(model.cand_entity[lo]), 1, 1.0, 0.0)]
            else:
                memo[key] = None
                pending.setdefault(para_idx, []).append(sf_id)
        for para_idx, sf_list in pending.items():
            q_tokens, q_counts = bags[para_idx]
            sm = (1.0 - model.lam) * np.exp(model.lm_logprob[q_tokens])
            spans = []
            parts = []
            off = 0
            for sf_id in sf_list:
                lo = int(model.cand_indptr[sf_id])
                hi = min(int(model.cand_indptr[sf_id + 1]),
                         lo + cfg.max_candidates)  # C2 prune
                spans.append((sf_id, lo, hi, off))
                parts.append(model.cand_entity[lo:hi].astype(np.int64))
                off += hi - lo
            ents_cat = np.concatenate(parts)
            ctx = context_loglik(model, ents_cat, q_tokens, q_counts, sm)
            for (sf_id, lo, hi, off), ents in zip(spans, parts):
                scores = model.cand_ln_prior[lo:hi] + ctx[off:off + hi - lo]
                memo[(para_idx, sf_id)] = _rank_scores(ents, scores, cfg.k)
    else:
        smooths: dict[int, np.ndarray] = {}
        for (_b, _e, sf_id, para_idx) in spots:
            key = (para_idx, sf_id)
            if key in memo:
                continue
            sm = smooths.get(para_idx)
            if sm is None:
                q_tokens, _ = bags[para_idx]
                sm = (1.0 - model.lam) * np.exp(model.lm_logprob[q_tokens])
                smooths[para_idx] = sm
            memo[key] = _score_mention(model, cfg, sf_id, bags[para_idx], sm)

    for (begin, end, sf_id, para_idx) in spots:
        for (eid, rank, sim, pct2) in memo[(para_idx, sf_id)]:
            out.append((begin, end, sf_id, eid, rank, sim, pct2))
    return out


def _rank_scores(ents: np.ndarray, scores: np.ndarray, k: int) -> list:
    """D5 softmax + D6 top-K + D7 second-rank margin over one mention's
    candidate scores (shared by the batched and per-mention paths).

    Candidate lists are tiny (top-K-pruned, typically 2-5), so the
    numpy call chain (argsort + fancy index + exp + sum) is pure
    per-call overhead — a plain-python sort + math.exp is ~3× faster at
    these sizes. math.exp and np.exp agree to the last ulp or so, five
    decades inside the contract's 9-dp score rounding (the same noise
    budget that already absorbs matmul summation order)."""
    n = len(scores)
    if n <= 16:
        s = scores.tolist()
        order = sorted(range(n), key=lambda i: (-s[i], i))
        m = s[order[0]]
        exp_s = [math.exp(s[i] - m) for i in order]
        tot = sum(exp_s)
        ranked = []
        for r in range(min(k, n)):
            pct2 = math.exp(s[order[r + 1]] - s[order[r]]) if r + 1 < n \
                else 0.0
            ranked.append((int(ents[order[r]]), r + 1, exp_s[r] / tot, pct2))
        return ranked
    order = np.argsort(-scores, kind="stable")
    s_sorted = scores[order]
    m = s_sorted[0]
    exp_s = np.exp(s_sorted - m)
    sim = exp_s / exp_s.sum()
    ranked = []
    for r in range(min(k, len(order))):
        pct2 = float(np.exp(s_sorted[r + 1] - s_sorted[r])) \
            if r + 1 < len(order) else 0.0
        ranked.append((int(ents[order[r]]), r + 1, float(sim[r]), pct2))
    return ranked


def _score_mention(model: SpotlightModel, cfg: PipelineConfig,
                   sf_id: int, bag, smooth=None) -> list:
    """Score one (sf, context-bag) instance → [(eid, rank, sim, pct2)]."""
    q_tokens, q_counts = bag
    lo, hi = model.cand_indptr[sf_id], model.cand_indptr[sf_id + 1]
    if hi <= lo:
        return []  # NIL: sf with no candidates (C3) — dropped
    if hi - lo == 1:
        # singleton candidate: softmax over one score is exactly 1.0 and
        # there is no second rank — context scoring cannot change the
        # output, so skip it (the bulk of mentions in a Zipf lexicon)
        return [(int(model.cand_entity[lo]), 1, 1.0, 0.0)]
    hi = min(hi, lo + cfg.max_candidates)  # C2 top-K by prior (rows are prior-desc)
    ents = model.cand_entity[lo:hi].astype(np.int64)
    ln_prior = model.cand_ln_prior[lo:hi]
    if cfg.disambiguator == "prior":
        scores = ln_prior
    elif cfg.disambiguator == "tficf":
        ctx = tficf_scores(model, [ents], q_tokens, q_counts)[0]
        scores = ln_prior + ctx
    else:  # generative (default model, Daiber 2013)
        ctx = context_loglik(model, ents, q_tokens, q_counts, smooth)
        scores = ln_prior + ctx
    return _rank_scores(ents, scores, cfg.k)


def _passes_filters(model: SpotlightModel, cfg: PipelineConfig,
                    eid: int, sim: float, pct2: float) -> bool:
    """F1 confidence + F2 support + F3 type filters (SURVEY §2.6).

    Composite confidence rule (PIN-AT-IMPLEMENTATION, frozen as spec):
    similarity_score >= confidence AND percentage_of_second_rank <=
    (1 - confidence) — ConfidenceFilter + PercentageOfSecondFilter [U].
    Both comparisons carry a 1e-12 pad so a score landing within an ulp
    of the threshold passes identically here and in every SQL mirror.
    """
    if sim < cfg.confidence - 1e-12 or pct2 > 1.0 - cfg.confidence + 1e-12:
        return False
    if model.ent_support[eid] < cfg.support:
        return False
    if cfg.types:
        hit = bool(set(model.ent_types[eid]) & set(cfg.types))
        if cfg.policy == "whitelist" and not hit:
            return False
        if cfg.policy == "blacklist" and hit:
            return False
    return True


def _coref_merge(model: SpotlightModel, scored: list) -> list:
    """F5 coreference resolution (SURVEY §2.6): a later, shorter mention
    whose token sequence is a suffix of an earlier longer mention's
    surface form (e.g. "Obama" after "Barack Obama") inherits the earlier
    mention's entity. Doc-local — runs inside the fused UDF, no shuffle.
    Only rank-1 rows are retargeted; scores are kept (the reference
    rewrites the resource on the occurrence, Annotate coreference param
    [U])."""
    out = []
    seen: list[tuple[int, tuple[str, ...], int]] = []  # (begin, sf_tokens, eid)
    for row in sorted(scored, key=lambda r: (r[0], r[4])):
        (begin, end, sf_id, eid, rank, sim, pct2) = row
        toks = tuple(model.sf_names[sf_id].split())
        if rank == 1:
            for (b0, toks0, eid0) in seen:
                if b0 < begin and len(toks0) > len(toks) \
                        and toks0[-len(toks):] == toks:
                    eid = eid0
                    break
            seen.append((begin, toks, eid))
        out.append((begin, end, sf_id, eid, rank, sim, pct2))
    return out


def _annotate_pdf(model: SpotlightModel, cfg: PipelineConfig,
                  pdf: pd.DataFrame, apply_filters: bool) -> pd.DataFrame:
    # columnar accumulation: one list per output column (a list-of-tuples
    # DataFrame build transposes row-wise — ~2× the allocation traffic,
    # which is what limits multi-worker scaling on a shared memory bus)
    cols: tuple[list, ...] = tuple([] for _ in ANNOTATION_SCHEMA.fields)
    (c_url, c_begin, c_end, c_sf, c_uri, c_rank, c_sim, c_pct2,
     c_support, c_types) = cols
    htmls = pdf["html"].tolist() if "html" in pdf.columns else None
    texts = pdf["text"].tolist() if htmls is None else None
    urls = pdf["url"].tolist()
    # vacuous filter config (the /annotate default) → skip the per-row
    # filter call entirely (it is pure overhead: everything passes)
    if apply_filters and cfg.confidence <= 0.0 and cfg.support <= 0 \
            and not cfg.types:
        apply_filters = False
    sf_names, ent_uris = model.sf_names, model.ent_uris
    ent_support, ent_types = model.ent_support, model.ent_types
    for i, url in enumerate(urls):
        text = strip_html(htmls[i]) if htmls is not None else texts[i]
        spots, bags = _doc_spots(model, text, cfg.spotter)
        scored = _score_doc(model, cfg, spots, bags)
        if cfg.coreference:
            scored = _coref_merge(model, scored)
        if apply_filters:
            scored = [row for row in scored
                      if _passes_filters(model, cfg, row[3], row[5], row[6])]
        if not scored:
            continue
        # transpose once + C-level extend/map: ~2× cheaper than a
        # 10-append python loop per output row
        begins, ends, sfs, eids, ranks, sims, pct2s = zip(*scored)
        c_url.extend([url] * len(scored))
        c_begin.extend(begins)
        c_end.extend(ends)
        c_sf.extend(map(sf_names.__getitem__, sfs))
        c_uri.extend(map(ent_uris.__getitem__, eids))
        c_rank.extend(ranks)
        c_sim.extend(sims)
        c_pct2.extend(pct2s)
        c_support.extend([int(ent_support[e]) for e in eids])
        c_types.extend([list(ent_types[e]) for e in eids])
    # types must be an object Series: with uniform-length lists pandas
    # would np.asarray the column into a 2-D ndarray, which Arrow cannot
    # convert to list<string>
    return pd.DataFrame({
        f.name: (pd.Series(c, dtype=object) if f.name == "types" else c)
        for f, c in zip(ANNOTATION_SCHEMA.fields, cols)
    })


def _lang_filtered(web_pages: DataFrame, cfg: PipelineConfig) -> DataFrame:
    # native column filter → Catalyst pushes it into the parquet scan
    return web_pages.filter(F.col("lang") == cfg.lang) if cfg.lang else web_pages


def annotate(spark: SparkSession, web_pages: DataFrame, model_bc,
             cfg: PipelineConfig | None = None) -> DataFrame:
    """/annotate (SURVEY §3.1): fused, shuffle-free mapInPandas DAG.

    ``model_bc`` is a ``spark.sparkContext.broadcast(SpotlightModel)``.
    Input needs (url, html, lang) or (url, text, lang).
    """
    cfg = cfg or PipelineConfig()
    src = _lang_filtered(web_pages, cfg)
    has_html = "html" in src.columns
    cols = ["url", "html"] if has_html else ["url", "text"]
    src = src.select(*cols)  # column pruning reaches the scan

    def run(batches):
        model = _get_model(model_bc)
        for pdf in batches:
            if len(pdf):
                yield _annotate_pdf(model, cfg, pdf, apply_filters=True)

    return src.mapInPandas(run, schema=ANNOTATION_SCHEMA)


def candidates(spark: SparkSession, web_pages: DataFrame, model_bc,
               cfg: PipelineConfig | None = None) -> DataFrame:
    """/candidates (SURVEY §3.2): bestK ranked, unfiltered."""
    cfg = cfg or PipelineConfig()
    src = _lang_filtered(web_pages, cfg).select(
        "url", "html" if "html" in web_pages.columns else "text"
    )

    def run(batches):
        model = _get_model(model_bc)
        for pdf in batches:
            if len(pdf):
                yield _annotate_pdf(model, cfg, pdf, apply_filters=False)

    return src.mapInPandas(run, schema=ANNOTATION_SCHEMA)


def spot(spark: SparkSession, web_pages: DataFrame, model_bc,
         cfg: PipelineConfig | None = None) -> DataFrame:
    """/spot (SURVEY §2.12): stop after P1–P4."""
    cfg = cfg or PipelineConfig()
    src = _lang_filtered(web_pages, cfg)
    has_html = "html" in src.columns
    src = src.select("url", "html" if has_html else "text")

    def run(batches):
        model = _get_model(model_bc)
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                url = pdf["url"].iat[i]
                text = strip_html(pdf["html"].iat[i]) if has_html else pdf["text"].iat[i]
                spots, _ = _doc_spots(model, text, cfg.spotter)
                for (b, e, sf_id, _p) in spots:
                    rows.append((url, b, e, model.sf_names[sf_id], int(sf_id),
                                 float(model.sf_ann_prob[sf_id])))
            yield pd.DataFrame(rows, columns=[f.name for f in SPOT_SCHEMA.fields])

    return src.mapInPandas(run, schema=SPOT_SCHEMA)


NIL_SPOT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("begin", IntegerType()),
    StructField("end", IntegerType()),
    StructField("surface_form", StringType()),
    StructField("context", StringType()),
])


def nil_spots(spark: SparkSession, web_pages: DataFrame, model_bc,
              cfg: PipelineConfig | None = None,
              context_chars: int = 60) -> DataFrame:
    """The C3 complement: the mentions ``annotate`` DROPS — spots that
    pass the gate (P2) and overlap resolution (P4) but whose surface
    form has an EMPTY candidate list. In a real Spotlight model store
    these are lexicon surface forms whose pairCounts rows fell to the
    build's minimum-count pruning (M-stage), so the spotter knows the
    phrase but the disambiguator has nowhere to link it — the standard
    entity-discovery input (TAC-KBP). Each row carries the
    ±``context_chars`` window of extracted text around the spot, the
    exact input shape of :func:`operators.nilcluster.nil_clusters`.

    Plan shape matches ``spot``/``annotate``: lang filter + 2-column
    projection pushed to the scan, ONE fused mapInPandas, 0 Exchange —
    the NIL extraction rides the same single pass over the corpus and
    at 10^12 docs adds no shuffle of its own."""
    cfg = cfg or PipelineConfig()
    src = _lang_filtered(web_pages, cfg)
    has_html = "html" in src.columns
    src = src.select("url", "html" if has_html else "text")

    def run(batches):
        model = _get_model(model_bc)
        indptr = model.cand_indptr
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                url = pdf["url"].iat[i]
                text = strip_html(pdf["html"].iat[i]) if has_html \
                    else pdf["text"].iat[i]
                spots, _ = _doc_spots(model, text, cfg.spotter)
                for (b, e, sf_id, _p) in spots:
                    if indptr[sf_id + 1] > indptr[sf_id]:
                        continue  # linkable: annotate()'s business
                    rows.append((url, b, e, model.sf_names[sf_id],
                                 text[max(0, b - context_chars):
                                      e + context_chars]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in NIL_SPOT_SCHEMA.fields])

    return src.mapInPandas(run, schema=NIL_SPOT_SCHEMA)


def extract_text(web_pages: DataFrame) -> DataFrame:
    """S1 standalone: html → text pandas UDF (byte-identical gate)."""
    @F.pandas_udf(StringType())
    def strip_udf(html: pd.Series) -> pd.Series:
        return html.map(strip_html)

    return web_pages.withColumn("extracted_text", strip_udf(F.col("html")))


# ---------------------------------------------------------------------------
# Relational path (SURVEY §3.1 DAG with explicit explode/join/window) —
# prior-only disambiguation (D8), used to cross-check the fused path.
# ---------------------------------------------------------------------------

def annotate_relational_prior(
    spark: SparkSession,
    web_pages: DataFrame,
    model_bc,
    candidates_df: DataFrame,
    entities_df: DataFrame,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """spots → explode → broadcast join pair_counts → window argmax by
    prior → filters. Every dimension join is an explicit broadcast hash
    join (SURVEY §2.10); the only shuffle is the per-mention window.

    candidates_df: (sf_id, entity_id, prior) — prior = P(e|s)
    entities_df:   (entity_id, uri, support, types)
    """
    from pyspark.sql import Window

    cfg = cfg or PipelineConfig()
    spots_df = spot(spark, web_pages, model_bc, cfg)

    cand = F.broadcast(candidates_df.select("sf_id", "entity_id", "prior"))
    ent = F.broadcast(
        entities_df.select("entity_id", "uri", "support", "types")
    )
    w = Window.partitionBy("url", "begin").orderBy(
        F.desc("prior"), F.asc("entity_id")
    )
    joined = (
        spots_df.join(cand, "sf_id")
        .withColumn("rank", F.row_number().over(w))
        .withColumn("ln_score", F.log(F.greatest(F.col("prior"), F.lit(1e-300))))
        .withColumn(
            "sum_exp",
            F.sum(F.exp(F.col("ln_score") - F.max("ln_score").over(
                Window.partitionBy("url", "begin")))).over(
                Window.partitionBy("url", "begin")),
        )
        .withColumn(
            "similarity_score",
            F.exp(F.col("ln_score") - F.max("ln_score").over(
                Window.partitionBy("url", "begin"))) / F.col("sum_exp"),
        )
        .withColumn(
            "percentage_of_second_rank",
            F.coalesce(
                F.exp(F.lead("ln_score").over(w) - F.col("ln_score")), F.lit(0.0)
            ),
        )
        .filter(F.col("rank") <= cfg.k)
        .join(ent, "entity_id")
    )
    out = joined.filter(
        (F.col("similarity_score") >= cfg.confidence - 1e-12)
        & (F.col("percentage_of_second_rank") <= 1.0 - cfg.confidence + 1e-12)
        & (F.col("support") >= cfg.support)
    )
    return out.select(
        "url", "begin", "end", "surface_form", "uri", "rank",
        "similarity_score", "percentage_of_second_rank", "support", "types",
    )
