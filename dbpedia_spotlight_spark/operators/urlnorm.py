"""Web URL canonicalization — the subject-key hygiene step for KG
construction over a crawl (north_rule: "canonicalization"; the triple
subject is ``url#char=…``, so the same page crawled as
``HTTP://Site.org/p#frag`` and ``http://site.org/p?utm_source=x`` must
canonicalize to one subject before recrawl dedup / triple emission).

This is a DOCUMENTED SUBSET of full RFC 3986 normalization, chosen so
every rule is a plain regexp with explicit character classes — no
lookaround, no Unicode classes — and therefore evaluates identically
under Java regex (Spark, JVM-side codegen) and RE2 (DuckDB oracles):

1. trim surrounding whitespace;
2. strip the fragment (first ``#`` onward — urls are single-line);
3. lowercase the ``scheme://authority`` prefix (path/query untouched);
4. drop default ports (``http…:80``, ``https…:443``);
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``), repairing a leading ``&`` left behind;
6. drop a trailing ``?``/``&``;
7. give a bare authority an explicit ``/`` path.

NOT attempted (needs real parsing, not regexps): percent-decoding,
query-param sorting, IDN/punycode, path ``..`` collapsing. At 100 TB
the op is a pure projection-stage column expression — JVM codegen, no
shuffle, fused into whatever scan it rides on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# scheme://authority prefix, matched case-insensitively via explicit
# A-Za-z classes (RE2 has no (?i) guarantee parity with Java for
# non-ASCII, explicit classes sidestep it)
SCHEME_AUTH = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*"

# (pattern, spark_replacement) — the DuckDB mirror uses \1-style
# backreferences and a 'g' flag; patterns are shared verbatim
PORT_RULES = [
    ("^(http://[^/?:]*):80([/?])", "$1$2"),
    ("^(http://[^/?:]*):80$", "$1"),
    ("^(https://[^/?:]*):443([/?])", "$1$2"),
    ("^(https://[^/?:]*):443$", "$1"),
]
TRACKING_PARAM = "[?&](utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)=[^&#]*"
AMP_REPAIR = ("^([^?]*)&", "$1?")
TRAILING_SEP = "[?&]$"
BARE_AUTHORITY = ("^([a-z][a-z0-9+.-]*://[^/?]+)$", "$1/")


def canonical_url_col(url_col: F.Column) -> F.Column:
    """Column expression form (pure, composable)."""
    u = F.regexp_replace(F.trim(url_col), "#.*", "")
    pref = F.regexp_extract(u, f"({SCHEME_AUTH})", 1)
    u = F.concat(F.lower(pref),
                 F.substring(u, F.length(pref) + F.lit(1), F.lit(1 << 30)))
    for pat, repl in PORT_RULES:
        u = F.regexp_replace(u, pat, repl)
    u = F.regexp_replace(u, TRACKING_PARAM, "")
    u = F.regexp_replace(u, *AMP_REPAIR)
    u = F.regexp_replace(u, TRAILING_SEP, "")
    return F.regexp_replace(u, *BARE_AUTHORITY)


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str | None = None) -> DataFrame:
    """Replace (or add, with ``out_col``) the canonical form."""
    return df.withColumn(out_col or url_col,
                         canonical_url_col(F.col(url_col)))


def sql_canonical_url(expr: str) -> str:
    """DuckDB mirror of :func:`canonical_url_col` over SQL expression
    ``expr`` — same patterns, RE2 ``\\1`` replacements, explicit 'g'
    flag (DuckDB replaces only the first match by default; Spark
    replaces all)."""
    u = f"regexp_replace(trim({expr}), '#.*', '')"
    pref = f"regexp_extract({u}, '({SCHEME_AUTH})', 1)"
    u = f"(lower({pref}) || substr({u}, length({pref}) + 1))"
    for pat, repl in PORT_RULES:
        r = repl.replace("$", "\\")
        u = f"regexp_replace({u}, '{pat}', '{r}')"
    u = f"regexp_replace({u}, '{TRACKING_PARAM}', '', 'g')"
    u = f"regexp_replace({u}, '{AMP_REPAIR[0]}', '{AMP_REPAIR[1].replace('$', chr(92))}')"
    u = f"regexp_replace({u}, '{TRAILING_SEP}', '')"
    pat, repl = BARE_AUTHORITY
    return f"regexp_replace({u}, '{pat}', '{repl.replace('$', chr(92))}')"
