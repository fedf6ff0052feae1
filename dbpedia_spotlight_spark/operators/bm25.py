"""BM25 ranked retrieval over the document corpus (Robertson/Spärck
Jones Okapi BM25 — the standard lexical relevance function; in a
training-data pipeline it drives retrieval-based decontamination
("find corpus docs that can answer this benchmark query"), targeted
quality audits, and hard-negative mining for retrieval training sets).

Relational shape (everything map-side-combinable, no UDFs):

1. ``term_postings`` — one explode of the case-folded whitespace
   tokens, ONE groupBy (term, doc) for tf. The corpus text dies at the
   scan; only (term, doc_id, tf) rows shuffle.
2. ``corpus_stats`` — doc lengths (one combinable agg) and N/avgdl
   (scalars).
3. ``bm25_scores`` — the query terms are a literal handful: the
   postings are FILTERED to them (predicate pushdown all the way to
   the postings store when materialized), df per term is a tiny agg,
   and the per-(doc, term) partial scores sum per doc in one final
   combinable agg. Top-k via ``orderBy.limit`` (Spark's TakeOrdered —
   no global sort materialization).

At 10^12 docs the postings table is the thing you materialize ONCE
(partitioned/bucketed by term — queries touch |query| buckets) and the
per-query cost is |query terms| × posting lists, exactly the inverted-
index access pattern, expressed as a join instead of a custom store.

IDF uses the standard Robertson form ln((N - df + 0.5)/(df + 0.5) + 1)
(always positive, the Lucene variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def _terms(text_col):
    """Case-folded whitespace tokens — the shared repo-wide
    tokenization (``textstats.ws_tokens``; empty text → no terms)."""
    from dbpedia_spotlight_spark.operators.textstats import ws_tokens
    return ws_tokens(text_col, fold=True)


def term_postings(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(term, id, tf) postings — the materialize-once side. One explode
    + one combinable count; text never shuffles."""
    return (docs
            .select(F.col(id_col),
                    F.explode(_terms(F.col(text_col))).alias("term"))
            .groupBy("term", id_col)
            .agg(F.count(F.lit(1)).alias("tf")))


def doc_lengths(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, dl) — word count per doc, a zero-shuffle projection."""
    return docs.select(F.col(id_col),
                       F.size(_terms(F.col(text_col))).alias("dl"))


def bm25_scores(docs: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = K1, b: float = B,
                postings: DataFrame | None = None,
                lengths: DataFrame | None = None) -> DataFrame:
    """Per-doc BM25 score for ``query_terms`` (case-folded, deduped):
    (id, score, n_hit). Docs matching no term are excluded (score 0).
    Pass pre-materialized ``postings``/``lengths`` to amortize the
    index across queries (the production path); otherwise both derive
    from ``docs`` inline."""
    q = sorted({t.strip().lower() for t in query_terms if t.strip()})
    if not q:
        raise ValueError("query_terms must contain at least one term")
    post = (postings if postings is not None
            else term_postings(docs, id_col, text_col))
    dl = (lengths if lengths is not None
          else doc_lengths(docs, id_col, text_col))
    stats = dl.agg(F.count(F.lit(1)).alias("n"),
                   F.avg("dl").alias("avgdl")).first()
    if not stats["n"]:
        raise ValueError("bm25_scores: corpus is empty")
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])
    hits = post.filter(F.col("term").isin(*q))
    df_per_term = hits.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    scored = (hits
              .join(F.broadcast(df_per_term), "term")
              .join(dl, id_col)
              .select(
                  F.col(id_col),
                  (idf * (F.col("tf") * (k1 + 1.0))
                   / (F.col("tf") + k1 * (1.0 - b
                                          + b * F.col("dl") / avgdl))
                   ).alias("_s")))
    return (scored.groupBy(id_col)
            .agg(F.sum("_s").alias("score"),
                 F.count(F.lit(1)).alias("n_hit")))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              **kw) -> DataFrame:
    """Top-k by (score desc, id asc — deterministic tiebreak), via
    TakeOrdered (no global sort materialization)."""
    return (bm25_scores(docs, query_terms, id_col, text_col, **kw)
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))
