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


def strip_html(html: bytes | str) -> str:
    """Extract plain text from HTML. Pure and deterministic; UTF-8 with
    replacement for undecodable bytes (malformed pages must not crash a
    100 TB job — they degrade deterministically)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Stripper()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # html.parser is tolerant, but guarantee totality anyway.
        pass
    return p.text()
