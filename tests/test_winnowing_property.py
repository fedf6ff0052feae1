"""Property test: the DuckDB winnowing oracle equals the python
fingerprint function on ARBITRARY text — hardens the oracle claim beyond
the fixed driver corpus (no Spark needed; the Spark side is covered by
the hash-exact contract test)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import example, given, settings, strategies as st

from dbpedia_spotlight_spark.operators.textstats import ASCII_LOWER
from dbpedia_spotlight_spark.queries import sql_winnowing


def _python_fp(text: str, k: int = 5, window: int = 4) -> list[int]:
    # reference: textstats.winnowing_fingerprints inner function
    B, M = 131, (1 << 61) - 1
    s = " ".join(text.translate(ASCII_LOWER).split())
    if len(s) < k:
        return []
    hashes = []
    h = 0
    power = pow(B, k - 1, M)
    for i, ch in enumerate(s):
        h = (h * B + ord(ch)) % M
        if i >= k:
            h = (h - ord(s[i - k]) * power * B) % M
        if i >= k - 1:
            hashes.append(h)
    out = []
    prev = -1
    for w in range(len(hashes) - window + 1):
        m = min(range(w, w + window), key=lambda j: (hashes[j], j))
        if m != prev:
            out.append(hashes[m])
            prev = m
    return out if out else ([min(hashes)] if hashes else [])


@settings(max_examples=60, deadline=None)
@given(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF,
                           blacklist_characters="'"),
    max_size=120,
))
@example(
    text='000İ',
).via('discovered failure')
def test_winnowing_oracle_matches_python_on_random_text(text):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (0, ?)", [text])
    got = sorted(r[1] for r in con.execute(sql_winnowing()).fetchall())
    want = sorted(_python_fp(text))
    assert got == want, (text, got, want)


def test_winnowing_short_text_fallbacks():
    for text in ("", "ab", "abcd", "abcde", "abcdefg", "abcdefgh"):
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.execute("INSERT INTO documents VALUES (0, ?)", [text])
        got = sorted(r[1] for r in con.execute(sql_winnowing()).fetchall())
        assert got == sorted(_python_fp(text)), text
