"""Deterministic HTML → text extraction (SURVEY.md §2.1 S1).

Reference behavior: the REST layer accepts ``url=`` requests, fetches the
page and strips HTML to plain text before annotation
(rest/.../resources/Annotate.java [U]). The rebuild's contract
(BASELINE.json input_hint) requires *byte-identical extracted text per
url*, so the stripper is a pure function over bytes with a frozen spec:

1. Parse with the stdlib ``html.parser`` (``convert_charrefs=True`` so
   character/entity references arrive unescaped in the data stream).
2. Drop all content inside <script>, <style>, <noscript>, <template>
   (nesting-aware).
3. Block-level tags (open or close) emit a line break; <br> too.
4. Normalize: within each line collapse whitespace runs to single spaces
   and trim; drop empty lines; join lines with "\n".

The synthetic corpus generator computes its ``text`` column with this
exact function, so the gate is definitionally byte-exact and the golden
tests freeze the spec against regressions.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6",
        "li", "ul", "ol", "tr", "td", "th", "table", "thead", "tbody",
        "section", "article", "header", "footer", "blockquote", "pre",
        "figure", "figcaption", "nav", "aside", "main", "form", "title",
    }
)


class _Stripper(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self._parts.append(data)

    def text(self) -> str:
        raw = "".join(self._parts)
        lines = (" ".join(line.split()) for line in raw.split("\n"))
        return "\n".join(line for line in lines if line)


# ---------------------------------------------------------------------------
# Fast path: a hand-rolled scanner that accepts a STRICT SUBSET of what
# html.parser's tolerant mode parses on its clean path, and returns None
# (→ fall back to the stock parser) on anything outside that subset. The
# subset is chosen so every accepted construct provably yields the same
# handler calls the stock parser would make, so the output is
# byte-identical by construction where the fast path answers at all:
#
# - start tags: name per a conservative sub-charset of tagfind_tolerant,
#   attributes only as `\s+ name [= "v" | 'v' | bare]` (bare excludes
#   quotes/'='/'<'/'>' — stock's attrfind consumes exactly these pairs,
#   leaving end ∈ {'>', '/>'}), optional final '/' → startendtag. Any
#   deviation (quotes in name position, '==', '= ' with empty value,
#   stray '/', incomplete tag) fails the regex → stock parser.
# - end tags: html.parser's endtagfind pattern verbatim; the tolerant
#   endtag paths (attrs in end tags, '</>') → stock parser.
# - <script>/<style>: CDATA mode — content is dropped until the first
#   position where `</\s*(script|style)` ALSO matches the strict endtag
#   regex with the same name, exactly the stock interesting_cdata +
#   parse_endtag dance; unclosed CDATA drops the rest, as stock does.
# - comments end at `--\s*>` (_markupbase._commentclose), <!doctype ..>
#   and bogus `<!x>` / `<?pi>` consume to '>', `<![` marked sections and
#   anything unterminated → stock parser.
# - a lone '<' that opens no construct is data, per goahead.
#
# Block-tag newlines are emitted even inside skip regions — that is what
# _Stripper does (only handle_data checks _skip_depth), and the frozen
# byte-identity contract pins it. Verified against the stock parser by
# tests/test_extraction.py: the full synthetic corpus, a handcrafted
# nasty battery, and a seeded 120k-case random-HTML differential fuzz.
# This halves flagship annotate cost: html.parser's per-tag Python
# overhead (attr building + entity unescape per attribute) was ~50% of
# the fused pipeline's profile, and this scanner never builds attrs.

_FAST_START = re.compile(
    r"<([a-zA-Z][-.a-zA-Z0-9:_]*)"
    r"((?:\s+[a-zA-Z_:][-.a-zA-Z0-9:_]*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^'\"=<>\s]+))?)*)"
    r"\s*(/?)>")
_FAST_END = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_COMMENT_END = re.compile(r"--\s*>")
_CDATA_CAND = {
    "script": re.compile(r"</\s*script", re.I),
    "style": re.compile(r"</\s*style", re.I),
}


def _strip_fast(html: str) -> str | None:
    """Fast strict-subset scan; None → caller must use the stock parser."""
    parts: list[str] = []
    append = parts.append
    skip = 0
    i, n = 0, len(html)
    find = html.find
    while i < n:
        j = find("<", i)
        if j < 0:
            j = n
        if i < j:
            if skip == 0:
                chunk = html[i:j]
                append(unescape(chunk) if "&" in chunk else chunk)
            i = j
        if i >= n:
            break
        c = html[i + 1] if i + 1 < n else ""
        if c == "/":
            m = _FAST_END.match(html, i)
            if not m:
                return None
            tag = m.group(1).lower()
            if tag in _SKIP_TAGS:
                skip = max(0, skip - 1)
            elif tag in _BLOCK_TAGS:
                append("\n")
            i = m.end()
        elif c.isascii() and c.isalpha():
            m = _FAST_START.match(html, i)
            if not m:
                return None
            tag = m.group(1).lower()
            i = m.end()
            if m.group(3):                    # '/>' → startendtag
                if tag in _BLOCK_TAGS:
                    append("\n")
                continue
            if tag in _SKIP_TAGS:
                skip += 1
                cand = _CDATA_CAND.get(tag)
                if cand is not None:          # script/style CDATA mode
                    pos = i
                    while True:
                        m2 = cand.search(html, pos)
                        if m2 is None:
                            i = n             # unclosed: rest is dropped
                            break
                        m3 = _FAST_END.match(html, m2.start())
                        if m3 and m3.group(1).lower() == tag:
                            skip = max(0, skip - 1)
                            i = m3.end()
                            break
                        pos = m2.end()        # stays CDATA, content dropped
            elif tag in _BLOCK_TAGS:
                append("\n")
        elif c == "!":
            if html[i:i + 4] == "<!--":
                m2 = _COMMENT_END.search(html, i + 4)
                if m2 is None:
                    return None
                i = m2.end()
            elif html[i:i + 3] == "<![":
                return None                   # marked section: stock path
            elif html[i:i + 9].lower() == "<!doctype":
                k = find(">", i + 9)
                if k < 0:
                    return None
                i = k + 1
            else:                             # bogus comment <!x>
                k = find(">", i + 2)
                if k < 0:
                    return None
                i = k + 1
        elif c == "?":
            k = find(">", i + 2)
            if k < 0:
                return None
            i = k + 1
        else:
            if skip == 0:
                append("<")
            i += 1
    raw = "".join(parts)
    lines = (" ".join(line.split()) for line in raw.split("\n"))
    return "\n".join(line for line in lines if line)


def _strip_stock(html: str) -> str:
    """The reference implementation of the frozen spec (stdlib parser)."""
    p = _Stripper()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # html.parser is tolerant, but guarantee totality anyway.
        pass
    return p.text()


def strip_html(html: bytes | str) -> str:
    """Extract plain text from HTML. Pure and deterministic; UTF-8 with
    replacement for undecodable bytes (malformed pages must not crash a
    100 TB job — they degrade deterministically). The fast scanner
    answers for the common well-formed shapes; anything outside its
    proven subset falls back to the stock parser, so the output is the
    frozen spec's either way."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    out = _strip_fast(html)
    return out if out is not None else _strip_stock(html)
