"""Sliding-window document chunking
(operators/sampling.py::chunk_documents) vs a from-scratch python twin
of the HF overflowing-tokens rule. (DuckDB pairing: rotated
`chunk_windows` in queries.py.)"""

from __future__ import annotations

import pytest

from dbpedia_spotlight_spark.operators.sampling import chunk_documents


def _py_chunks(text: str, window: int, stride: int, min_tokens: int = 1):
    words = text.strip().split()
    out = []
    s = 0
    while s < len(words):
        if s != 0 and (s - stride) + window >= len(words):
            break
        piece = words[s:s + window]
        if len(piece) >= min_tokens:
            out.append((len(out), s, len(piece), " ".join(piece)))
        s += stride
    return out


CORPUS = [
    (0, " ".join(f"w{j}" for j in range(100))),   # many full windows
    (1, " ".join(f"x{j}" for j in range(40))),    # exactly one window
    (2, " ".join(f"y{j}" for j in range(7))),     # shorter than window
    (3, " ".join(f"z{j}" for j in range(45))),    # full + partial tail
    (4, ""),                                       # empty → no chunks
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


@pytest.mark.parametrize("window,stride", [(40, 40), (40, 30), (10, 25)])
def test_chunks_match_python_twin(docs, window, stride):
    got = {}
    for r in chunk_documents(docs, window=window, stride=stride).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start, r.n_tokens, r.chunk_text))
    for i, text in CORPUS:
        want = _py_chunks(text, window, stride)
        assert sorted(got.get(i, [])) == want, (i, window, stride)


def test_overlap_stop_rule(docs):
    """stride < window: consecutive chunks overlap by window-stride
    words, and chunking stops after the first window reaching the end
    (no fan of degenerate tails)."""
    rows = [r for r in chunk_documents(docs, 40, 30).collect()
            if r.doc_id == 0]
    rows.sort(key=lambda r: r.chunk_idx)
    assert [r.start for r in rows] == [0, 30, 60]   # NOT 90 (60+40 >= 100)
    assert rows[0].chunk_text.split()[30:] == rows[1].chunk_text.split()[:10]
    assert rows[-1].n_tokens == 40
    # doc 2 (7 words < window) still yields its single short chunk
    short = [r for r in chunk_documents(docs, 40, 30).collect()
             if r.doc_id == 2]
    assert len(short) == 1 and short[0].n_tokens == 7


def test_min_tokens_drops_short_tail(docs):
    rows = [r for r in chunk_documents(docs, 40, 40,
                                       min_tokens=10).collect()
            if r.doc_id == 3]
    # 45 words, disjoint windows → 40-word chunk + 5-word tail < 10
    assert [(r.start, r.n_tokens) for r in rows] == [(0, 40)]


def test_invalid_args(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 10, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 10, min_tokens=0)
