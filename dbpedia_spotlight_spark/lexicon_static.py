"""Static lexicon over the driver corpus vocabulary.

The driver's ``documents`` table (TESTDATA.md) is synthetic text drawn
from a small database-themed vocabulary. This module pins a FIXED,
deterministic Spotlight-style lexicon over that vocabulary so that the
entity-linking pipeline can run on the driver's own tables and — for the
relational (prior-only) path — be mirrored exactly in DuckDB oracle SQL
(the lexicon is inlined as VALUES rows in the oracle).

Everything here is pure data + tiny builders; both the Spark callables in
``queries.py`` and the oracle-SQL generator consume the SAME structures,
so Spark/DuckDB can only agree if the engine's operators are correct.

Reference parity: this plays the role of the wikistats lexicon the
reference loads at startup (db/SpotlightModel.fromFolder [U], SURVEY §3.3);
surface-form → candidate priors follow P(e|s) = c(s,e)/Σc(s,·) (SURVEY
§2.9).
"""

from __future__ import annotations

import pandas as pd

DBP = "http://dbpedia.org/resource/"

# sf (lowercase, tokenized by single spaces) -> [(uri_suffix, pair_count)]
# ordered by count DESC (candidate priors derive from these counts).
# Single-token sfs feed the SQL-checkable relational path; multi-token sfs
# exercise the Aho-Corasick FSA path (value-exact via the spot_fsa and
# fused-annotate oracles since round 2).
SF_CANDIDATES: dict[str, list[tuple[str, int]]] = {
    "table": [("Table_(database)", 80), ("Table_(furniture)", 20)],
    "spark": [("Apache_Spark", 90), ("Spark_(fire)", 10)],
    "window": [("Window_function", 70), ("Window_(architecture)", 30)],
    "stream": [("Stream_processing", 85), ("Stream_(river)", 15)],
    "vector": [("Vector_(mathematics)", 60), ("Vector_database", 40)],
    "join": [("Join_(SQL)", 100)],
    "hash": [("Hash_function", 100)],
    "merge": [("Merge_algorithm", 100)],
    "sort": [("Sorting_algorithm", 100)],
    "filter": [("Filter_(software)", 100)],
    "batch": [("Batch_processing", 100)],
    "customer": [("Customer", 100)],
    "query": [("Query_language", 100)],
    "column": [("Column_(database)", 100)],
    # multi-token (FSA path; excluded from the unigram SQL oracle)
    "hash join": [("Hash_join", 50)],
    "sort merge": [("Merge_sort", 50)],
    "table scan": [("Full_table_scan", 50)],
}

# (annotated_count, total_count) per sf; annotationProbability = a/t gates
# spotting (SURVEY §2.9). "a" is the planted stopword-like sf BELOW the
# default 0.05 gate — it must never be spotted.
SF_COUNTS: dict[str, tuple[int, int]] = {
    **{sf: (90, 100) for sf in SF_CANDIDATES},
    "a": (5, 10000),
}
SF_CANDIDATES_GATED = {**SF_CANDIDATES, "a": [("A", 5)]}

# per-entity context vectors (token -> count) for the generative
# disambiguator (D2): c(t,e). Disjoint-ish subsets of the corpus vocab so
# ambiguous sfs resolve by paragraph context.
ENTITY_CONTEXT: dict[str, dict[str, int]] = {
    "Table_(database)": {"row": 40, "column": 40, "scan": 30, "query": 30},
    "Table_(furniture)": {"small": 40, "big": 40, "line": 20},
    "Apache_Spark": {"data": 40, "batch": 35, "query": 30, "agg": 25},
    "Spark_(fire)": {"slow": 40, "line": 30},
    "Window_function": {"order": 40, "group": 35, "agg": 30, "row": 25},
    "Window_(architecture)": {"big": 40, "small": 35, "line": 25},
    "Stream_processing": {"batch": 40, "data": 35, "fast": 30},
    "Stream_(river)": {"slow": 40, "line": 30, "big": 25},
    "Vector_(mathematics)": {"sort": 40, "order": 30},
    "Vector_database": {"query": 40, "data": 35, "scan": 25},
    "Join_(SQL)": {"merge": 40, "hash": 35, "key": 30},
    "Hash_function": {"key": 40, "value": 35},
    "Merge_algorithm": {"sort": 40, "fast": 25},
    "Sorting_algorithm": {"order": 40, "merge": 30},
    "Filter_(software)": {"scan": 35, "fast": 30},
    "Batch_processing": {"slow": 30, "data": 30},
    "Customer": {"order": 35, "value": 25},
    "Query_language": {"table": 35, "scan": 30},
    "Column_(database)": {"row": 40, "value": 30},
    "Hash_join": {"hash": 40, "merge": 30},
    "Merge_sort": {"sort": 40, "slow": 20},
    "Full_table_scan": {"scan": 45, "slow": 30},
    "A": {},
}

# entity types for the F3 type filter
ENTITY_TYPES: dict[str, list[str]] = {
    "Apache_Spark": ["Software"],
    "Spark_(fire)": ["Phenomenon"],
    "Customer": ["Agent"],
    "Table_(furniture)": ["Artifact"],
    "Window_(architecture)": ["Artifact"],
    "Stream_(river)": ["Place"],
}

# subClassOf edges over the entity types above — the fixture's slice of
# the DBpedia class hierarchy (depth 2, with diamond-free chains) used
# by the ontology-closure / type-inference oracle pair. Both the Spark
# callable and the DuckDB mirror inline THESE rows, so the engines can
# only agree if the closure + rdfs:9 join semantics are correct.
TYPE_HIERARCHY: list[tuple[str, str]] = [
    ("Software", "Work"),
    ("Work", "Thing"),
    ("Artifact", "Object"),
    ("Object", "Thing"),
    ("Place", "Location"),
    ("Location", "Thing"),
    ("Phenomenon", "Event"),
    ("Event", "Thing"),
    ("Agent", "Thing"),
    ("Concept", "Thing"),
]

# rdfs:domain / rdfs:range declarations for the KG's emission
# predicates — the property-schema fixture for the rdfs:2/3 entailment
# pair. Both engines inline THESE rows; 'Concept' chains into
# TYPE_HIERARCHY so the composed rdfs:2/3∘9 lift is exercised, while
# 'nif:Phrase' (not in the hierarchy) pins the no-supertype case. Both
# predicates declaring the same domain pins the cross-predicate dedup.
PRED_DOMAINS: list[tuple[str, str]] = [
    ("nif:anchorOf", "nif:Phrase"),
    ("itsrdf:taIdentRef", "nif:Phrase"),
]
PRED_RANGES: list[tuple[str, str]] = [
    ("itsrdf:taIdentRef", "Concept"),
]

# corpus vocabulary (token types); counts are nominal corpus frequencies
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window a the customer query big small data column join "
    "order group stream filter vector"
).split()

STOPWORDS = ("a", "the")


def entity_rows() -> list[tuple[str, int, int, list[str]]]:
    """(uri, entity_id, support, types) — support = Σ pair counts (c(e))."""
    support: dict[str, int] = {}
    for cands in SF_CANDIDATES_GATED.values():
        for uri_sfx, c in cands:
            support[uri_sfx] = support.get(uri_sfx, 0) + c
    uris = sorted(support)
    return [
        (DBP + u, i, support[u], ENTITY_TYPES.get(u, ["Concept"]))
        for i, u in enumerate(uris)
    ]


def surface_form_rows() -> list[tuple[str, int, int, int]]:
    """(sf, sf_id, annotated_count, total_count), sf sorted."""
    sfs = sorted(SF_CANDIDATES_GATED)
    return [(sf, i, SF_COUNTS[sf][0], SF_COUNTS[sf][1]) for i, sf in enumerate(sfs)]


def pair_count_rows() -> list[tuple[int, int, int]]:
    """(sf_id, entity_id, count)."""
    sf_id = {sf: i for i, (sf, *_rest) in enumerate(
        (r[0],) for r in surface_form_rows())}
    sf_id = {r[0]: r[1] for r in surface_form_rows()}
    ent_id = {r[0]: r[1] for r in entity_rows()}
    out = []
    for sf, cands in SF_CANDIDATES_GATED.items():
        for uri_sfx, c in cands:
            out.append((sf_id[sf], ent_id[DBP + uri_sfx], c))
    return out


def token_type_rows() -> list[tuple[str, int, int]]:
    """(token, token_id, corpus_count) over the corpus vocabulary."""
    return [(t, i, 1000) for i, t in enumerate(sorted(set(VOCAB)))]


def token_count_rows() -> list[tuple[int, int, int]]:
    """(entity_id, token_id, count) from ENTITY_CONTEXT."""
    ent_id = {r[0]: r[1] for r in entity_rows()}
    tok_id = {r[0]: r[1] for r in token_type_rows()}
    out = []
    for uri_sfx, ctx in ENTITY_CONTEXT.items():
        for tok, c in ctx.items():
            out.append((ent_id[DBP + uri_sfx], tok_id[tok], c))
    return sorted(out)


def unigram_prior_rows() -> list[tuple[str, str, float, int, int]]:
    """For the SQL-checkable relational path: one row per (single-token sf,
    candidate): (sf, uri, prior, pair_count, support) with prior =
    c(s,e)/Σc(s,·) — SURVEY §2.9."""
    support = {r[0]: r[2] for r in entity_rows()}
    out = []
    for sf, cands in SF_CANDIDATES.items():
        if " " in sf:
            continue
        tot = sum(c for _, c in cands)
        for uri_sfx, c in cands:
            uri = DBP + uri_sfx
            out.append((sf, uri, c / tot, c, support[uri]))
    return out


def compile_static_model(lam: float | None = None,
                         spot_threshold: float | None = None,
                         quantize_context: bool = False,
                         stemmer: str = "identity"):
    """Compile the static lexicon into a broadcastable SpotlightModel."""
    from dbpedia_spotlight_spark.model import compile_model

    kw = {"quantize_context": quantize_context, "stemmer": stemmer}
    if lam is not None:
        kw["lam"] = lam
    if spot_threshold is not None:
        kw["spot_threshold"] = spot_threshold
    ents = entity_rows()
    return compile_model(
        surface_forms=pd.DataFrame(
            surface_form_rows(),
            columns=["sf", "sf_id", "annotated_count", "total_count"],
        ),
        entities=pd.DataFrame(
            ents, columns=["uri", "entity_id", "support", "types"]
        ),
        pair_counts=pd.DataFrame(
            pair_count_rows(), columns=["sf_id", "entity_id", "count"]
        ),
        token_counts=pd.DataFrame(
            token_count_rows(), columns=["entity_id", "token_id", "count"]
        ),
        token_types=pd.DataFrame(
            token_type_rows(), columns=["token", "token_id", "corpus_count"]
        ),
        stopwords=list(STOPWORDS),
        **kw,
    )


def sql_values_priors() -> str:
    """The unigram candidate table as a DuckDB VALUES clause:
    (sf, uri, prior, pair_count, support). Priors are emitted as exact
    decimal ratios evaluated in SQL (c::DOUBLE / tot) so Spark and DuckDB
    compute the identical double."""
    rows = []
    support = {r[0]: r[2] for r in entity_rows()}
    for sf, cands in SF_CANDIDATES.items():
        if " " in sf:
            continue
        tot = sum(c for _, c in cands)
        for uri_sfx, c in cands:
            uri = DBP + uri_sfx
            rows.append(
                f"('{sf}', '{uri}', CAST({c} AS DOUBLE)/{tot}, {c}, {support[uri]})"
            )
    return ",\n      ".join(rows)
