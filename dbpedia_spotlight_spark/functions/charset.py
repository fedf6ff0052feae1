"""Charset sniffing for raw crawl bytes (input_hint: ``html:binary``).

Real Common-Crawl captures are a mix of encodings; servers lie and many
pages carry no HTTP header by the time the WARC payload reaches the
table. The sniffer is a small, **frozen** deterministic cascade
(WHATWG-encoding-flavoured, not a statistical detector):

1. Byte-order mark: UTF-8 / UTF-16 LE / UTF-16 BE.
2. ``charset=<name>`` declaration in the first ``HEAD_BYTES`` bytes,
   matched byte-literally against a fixed lowercase menu (HTML5
   serializers emit lowercase; a full attribute parser would buy little
   and cost cross-engine mirrorability).
3. Strict-UTF-8 validity probe over the whole payload.
4. Fallback ``windows-1252`` (the WHATWG default; a superset of
   iso-8859-1 on the printable range).

The cascade is pure bytes→str, so it is replayable anywhere — the
contract-query oracle derives the expected label straight from this
spec. ``strip_html``'s default UTF-8 path stays frozen (byte-identical
extraction contract); callers opt in via ``decode_html``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

HEAD_BYTES = 2048

_BOMS: tuple[tuple[bytes, str], ...] = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

# fixed lowercase menu, priority order (first hit wins)
META_MENU: tuple[str, ...] = (
    "utf-8", "windows-1252", "iso-8859-1", "utf-16",
)

# python codec + number of BOM bytes to strip before decoding
_DECODE: dict[str, tuple[str, int]] = {
    "utf-8-sig": ("utf-8-sig", 0),   # codec strips the BOM itself
    "utf-16-le": ("utf-16-le", 2),
    "utf-16-be": ("utf-16-be", 2),
    "utf-8": ("utf-8", 0),
    "windows-1252": ("windows-1252", 0),
    "iso-8859-1": ("iso-8859-1", 0),
    "utf-16": ("utf-16", 0),         # codec consumes the BOM if present
}


def sniff_charset(b: bytes | bytearray) -> str:
    """Frozen charset cascade over raw page bytes (module docstring)."""
    b = bytes(b)
    for bom, name in _BOMS:
        if b.startswith(bom):
            return name
    head = b[:HEAD_BYTES]
    for cs in META_MENU:
        if b"charset=" + cs.encode("ascii") in head:
            return cs
    try:
        b.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode_html(b: bytes | bytearray) -> str:
    """Decode page bytes via ``sniff_charset``; undecodable bytes
    degrade with U+FFFD (malformed pages must not crash a 100 TB job)."""
    b = bytes(b)
    codec, strip = _DECODE[sniff_charset(b)]
    return b[strip:].decode(codec, errors="replace")


def detect_charset(pages: DataFrame, html_col: str = "html",
                   out_col: str = "charset") -> DataFrame:
    """Add the sniffed charset per page. Arrow-batched pandas UDF over
    the binary column — bytes never shuffle (narrow projection), the
    label is the only new column."""
    @F.pandas_udf("string")
    def _sniff(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(sniff_charset)

    return pages.withColumn(out_col, _sniff(F.col(html_col)))


def decode_pages(pages: DataFrame, html_col: str = "html",
                 out_col: str = "text") -> DataFrame:
    """Decode the binary html column to a string column using the
    sniffed charset (one fused UDF pass — sniff + decode per batch)."""
    @F.pandas_udf("string")
    def _dec(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(decode_html)

    return pages.withColumn(out_col, _dec(F.col(html_col)))
