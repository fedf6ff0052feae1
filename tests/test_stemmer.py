"""T2 stemming: Porter algorithm golden vectors + model integration
(stemmed vocab merge, FSA patterns over stems, request-path lookup)."""

from __future__ import annotations

import pandas as pd
import pytest

from dbpedia_spotlight_spark.functions.stemmer import (
    get_stemmer, identity_stem, porter_stem,
)

# full-pipeline outputs (steps 1a-5b), from the published algorithm's
# canonical vocabulary behavior
GOLDEN = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file", "happy": "happi",
    "sky": "sky", "relational": "relat", "conditional": "condit",
    "rational": "ration", "itemization": "item", "sensational": "sensat",
    "traditional": "tradit", "reference": "refer", "colonizer": "colon",
    "plotted": "plot", "tables": "tabl", "table": "tabl", "joins": "join",
    "joining": "join", "streams": "stream", "streaming": "stream",
    "windows": "window", "queries": "queri",
}


def test_porter_golden_vectors():
    bad = {w: (porter_stem(w), want)
           for w, want in GOLDEN.items() if porter_stem(w) != want}
    assert not bad, bad


def test_porter_idempotent_on_short_words():
    for w in ("a", "is", "be", "on", ""):
        assert porter_stem(w) == w


def test_inflected_forms_share_stems():
    for a, b in (("tables", "table"), ("joining", "joins"),
                 ("streaming", "streams")):
        assert porter_stem(a) == porter_stem(b)


def test_get_stemmer_registry():
    assert get_stemmer("identity") is identity_stem
    assert get_stemmer("porter") is porter_stem
    with pytest.raises(ValueError):
        get_stemmer("snowball-klingon")


def _tiny_model(stemmer: str):
    from dbpedia_spotlight_spark.model import compile_model

    return compile_model(
        surface_forms=pd.DataFrame(
            [("table", 0, 90, 100), ("hash join", 1, 90, 100)],
            columns=["sf", "sf_id", "annotated_count", "total_count"],
        ),
        entities=pd.DataFrame(
            [("T", 0, 100, []), ("HJ", 1, 50, [])],
            columns=["uri", "entity_id", "support", "types"],
        ),
        pair_counts=pd.DataFrame(
            [(0, 0, 100), (1, 1, 50)],
            columns=["sf_id", "entity_id", "count"],
        ),
        token_counts=pd.DataFrame(
            [(0, 0, 40), (0, 1, 30)],
            columns=["entity_id", "token_id", "count"],
        ),
        token_types=pd.DataFrame(
            [("table", 0, 100), ("tables", 1, 60), ("hash", 2, 80),
             ("join", 3, 70), ("joins", 4, 20)],
            columns=["token", "token_id", "corpus_count"],
        ),
        stopwords=["the"],
        stemmer=stemmer,
    )


def test_porter_model_spots_inflected_forms():
    """With the porter model, 'tables' and 'hash joins' in text match the
    lexicon entries 'table' / 'hash join'; the identity model misses
    them. Offsets still address the ORIGINAL text."""
    from dbpedia_spotlight_spark.pipeline import _doc_spots

    text = "the tables hold data and hash joins merge them"
    porter_spots, _ = _doc_spots(_tiny_model("porter"), text)
    ident_spots, _ = _doc_spots(_tiny_model("identity"), text)

    found = {(b, e, sf) for (b, e, sf, _p) in porter_spots}
    assert (4, 10, 0) in found          # 'tables' -> sf_id 0 ('table')
    assert (25, 35, 1) in found         # 'hash joins' -> sf_id 1
    assert ident_spots == []            # no exact-form matches exist

    exact = "the table holds data and hash join merges them"
    ident_exact, _ = _doc_spots(_tiny_model("identity"), exact)
    assert {(sf) for (_b, _e, sf, _p) in ident_exact} == {0, 1}


def test_stemmed_vocab_merges_counts():
    """'table'+'tables' merge into one stem id with summed corpus counts;
    context histograms re-aggregate onto stem ids."""
    m = _tiny_model("porter")
    assert "tabl" in m.token_index
    assert "table" not in m.token_index
    tid = m.token_index["tabl"]
    assert len(m.lm_logprob) == len(m.token_index) == 3  # tabl, hash, join
    # context: entity 0 had counts on token 0 (table=40) and 1 (tables=30)
    lo, hi = m.ctx_indptr[0], m.ctx_indptr[1]
    row = dict(zip(m.ctx_token[lo:hi].tolist(), m.ctx_count[lo:hi].tolist()))
    assert row == {tid: 70.0}
