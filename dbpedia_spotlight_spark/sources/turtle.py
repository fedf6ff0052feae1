"""Turtle reader — the third RDF ingestion format after N-Triples /
N-Quads (``sources/ntriples.py``). Published ontologies and vocabulary
dumps overwhelmingly ship as ``.ttl`` (prefixes, ``a``, predicate-
object lists), so a KG-construction engine must load it.

Why this one is a Pandas-UDF source and not column algebra: Turtle is
a RECURSIVE grammar with document-scoped state — ``@prefix`` bindings
apply from their declaration onward, triple-quoted literals span
lines, blank-node property lists and collections nest — so there is no
per-line (or per-record) columnar decomposition; the parse unit is the
DOCUMENT. That matches Spark's model anyway: real dumps ship as many
shard files, and this source parallelizes per file (``wholetext``
scan → Arrow-batched ``mapInPandas``, one pure-python recursive-
descent parse per document, triples emitted in bulk per batch). A
single giant unsharded ``.ttl`` does not split — the same documented
limitation as any gzip member — reshard upstream if one file
dominates.

Output schema matches :func:`parse_ntriples` exactly
(``subj, pred, obj, obj_kind, lang, datatype``), so everything
downstream (``subclass_edges``, ``triples_from_rdf``,
``run_kg_maintain --ontology``) consumes either format unchanged.

Supported (the subset real ontology dumps use): ``@prefix``/``@base``
and their SPARQL-cased forms, prefixed names with ``PN_LOCAL_ESC``
(``ex:a\\.b``) and ``%``-escapes kept verbatim, ``a`` → ``rdf:type``,
predicate-object (``;``) and object (``,``) lists, all four literal
quote forms incl. multiline ``\"\"\"…\"\"\"``, ``@lang`` /
``^^datatype``, numeric (``xsd:integer``/``decimal``/``double`` —
lexical form kept VERBATIM) and boolean abbreviations, labeled and
anonymous blank nodes (``[ … ]`` — fresh labels ``_:b0…`` numbered in
document order, deterministic because each document parses
sequentially), and collections ``( … )`` lowered to
``rdf:first``/``rdf:rest``/``rdf:nil``. Relative IRIs resolve against
``@base`` with plain RFC-3986 merge for the absolute / rootless /
relative-path forms (no dot-segment normalization — documented
simplification; dumps in the wild publish absolute IRIs).

Escape semantics are shared with the N-Triples reader by contract:
ECHAR map, ``\\uXXXX``/``\\UXXXXXXXX`` UCHARs, legacy surrogate PAIRS
combine to the astral char, lone surrogate halves decode to U+FFFD
(tests pin cross-reader agreement on the same hazard strings).

Malformed documents degrade per-document (skipped from the parse,
surfaced by :func:`turtle_errors` with line/column/reason — the audit
side output a load job writes next to the table), mirroring the
per-line degrade of the N-Triples reader; pass ``errors='strict'`` to
fail the job instead.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
XSD = "http://www.w3.org/2001/XMLSchema#"

TURTLE_SCHEMA = ("subj string, pred string, obj string, "
                 "obj_kind string, lang string, datatype string")
ERROR_SCHEMA = "path string, line int, col int, error string"


class TurtleSyntaxError(ValueError):
    def __init__(self, msg: str, pos: int, text: str) -> None:
        line = text.count("\n", 0, pos) + 1
        col = pos - (text.rfind("\n", 0, pos) + 1) + 1
        super().__init__(f"line {line} col {col}: {msg}")
        self.line, self.col, self.reason = line, col, msg


_ECHARS = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
           '"': '"', "'": "'", "\\": "\\"}
_UCHAR_RE = re.compile(
    r"\\u[Dd][89ABab][0-9A-Fa-f]{2}\\u[Dd][C-Fc-f][0-9A-Fa-f]{2}"
    r"|\\U[0-9A-Fa-f]{8}|\\u[0-9A-Fa-f]{4}|\\.")


def _unescape(body: str, echars: bool) -> str:
    """Shared ECHAR+UCHAR decode (the python twin of the N-Triples
    reader's column algebra — same tolerant choices: surrogate pairs
    combine, lone halves → U+FFFD, unknown ``\\x`` keeps x)."""
    def sub(m: re.Match) -> str:
        t = m.group(0)
        if len(t) == 12 and t[1] in "uU" and len(t) > 2:
            hi, lo = int(t[2:6], 16), int(t[8:12], 16)
            return chr(0x10000 + ((hi - 0xD800) << 10) + (lo - 0xDC00))
        if t[1] == "U":
            cp = int(t[2:10], 16)
            return "�" if 0xD800 <= cp <= 0xDFFF else chr(cp)
        if t[1] == "u":
            cp = int(t[2:6], 16)
            return "\ufffd" if 0xD800 <= cp <= 0xDFFF else chr(cp)
        if echars and t[1] in _ECHARS:
            return _ECHARS[t[1]]
        return t[1]
    return _UCHAR_RE.sub(sub, body)


_WS_RE = re.compile(r"(?:[ \t\r\n]+|#[^\n]*)+")
# prefix part: no ':' (the grammar's PN_PREFIX), no dots at the edge
_PNAME_NS_RE = re.compile(r"(?:[^\s<>\"'()\[\]{},;.#:]"
                          r"|\.(?=[^\s,;.)\]:]))*:")
# local part: dots allowed INSIDE only (a trailing dot is the
# statement terminator), PN_LOCAL_ESC, %-escapes verbatim
_PN_LOCAL_RE = re.compile(
    r"(?:[^\s<>\"'()\[\]{},;.#\\]|\.(?=[^\s,;.)\]])"
    r"|\\[-_~.!$&'()*+,;=/?#@%]|%[0-9A-Fa-f]{2})*")
_BNODE_RE = re.compile(r"_:[^\s<>\"'()\[\]{},;]+")
# grammar order: DOUBLE (mantissa+exponent forms) | DECIMAL (digit
# required AFTER the dot — '5.' is integer 5 + statement dot) | INTEGER
_NUM_RE = re.compile(
    r"[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.\d+[eE][+-]?\d+|\d+[eE][+-]?\d+"
    r"|\d+\.\d+|\.\d+|\d+)")
_BOOL_RE = re.compile(r"(?:true|false)(?![^\s,;.)\]])")
_IRI_RE = re.compile(r"<([^<>\"{}|^`\\\x00-\x20]*)>")
_BASE_SPLIT = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*:)(//[^/?#]*)?(.*)$")


def _resolve(base: str | None, ref: str) -> str:
    """Minimal RFC-3986 merge (absolute / network / absolute-path /
    relative-path / fragment-or-query); no dot-segment removal."""
    if not base or re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", ref):
        return ref
    m = _BASE_SPLIT.match(base)
    if not m:
        return ref
    scheme, auth, rest = m.group(1), m.group(2) or "", m.group(3)
    if ref.startswith("//"):
        return scheme + ref
    if ref.startswith("/"):
        return scheme + auth + ref
    if ref.startswith("#") or ref.startswith("?"):
        return scheme + auth + rest.split("#")[0].split("?")[0] + ref
    return scheme + auth + rest[: rest.rfind("/") + 1] + ref


class _Parser:
    def __init__(self, text: str) -> None:
        self.s, self.i, self.n = text, 0, len(text)
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self.bn = 0
        self.out: list[tuple] = []

    # --- plumbing ---------------------------------------------------
    def err(self, msg: str) -> TurtleSyntaxError:
        return TurtleSyntaxError(msg, self.i, self.s)

    def ws(self) -> None:
        m = _WS_RE.match(self.s, self.i)
        if m:
            self.i = m.end()

    def eat(self, ch: str) -> None:
        if not self.s.startswith(ch, self.i):
            raise self.err(f"expected {ch!r}")
        self.i += len(ch)

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def fresh_bnode(self) -> str:
        self.bn += 1
        return f"_:b{self.bn - 1}"

    def emit(self, s, p, o, kind, lang=None, dtype=None) -> None:
        self.out.append((s, p, o, kind, lang, dtype))

    # --- document ---------------------------------------------------
    def parse(self) -> list[tuple]:
        self.ws()
        while self.i < self.n:
            if not self.directive():
                self.triples()
                self.ws()
                self.eat(".")
            self.ws()
        return self.out

    def directive(self) -> bool:
        s, i = self.s, self.i
        is_at_prefix = s.startswith("@prefix", i)
        is_sparql_prefix = (s[i:i + 6].upper() == "PREFIX"
                            and s[i + 6:i + 7] in " \t\r\n")
        if is_at_prefix or is_sparql_prefix:
            self.i += 7 if is_at_prefix else 6
            self.ws()
            pm = _PNAME_NS_RE.match(self.s, self.i)
            if not pm:
                raise self.err("expected prefix name")
            name = pm.group(0)[:-1]
            self.i = pm.end()
            self.ws()
            self.prefixes[name] = self.iri_ref()
            if is_at_prefix:
                self.ws()
                self.eat(".")
            return True
        is_at_base = s.startswith("@base", i)
        is_sparql_base = (s[i:i + 4].upper() == "BASE"
                          and s[i + 4:i + 5] in " \t\r\n")
        if is_at_base or is_sparql_base:
            self.i += 5 if is_at_base else 4
            self.ws()
            self.base = self.iri_ref()
            if is_at_base:
                self.ws()
                self.eat(".")
            return True
        return False

    # --- statements -------------------------------------------------
    def triples(self) -> None:
        c = self.peek()
        if c == "[":
            # anonymous subject: emit its property list, then an
            # OPTIONAL trailing predicate-object list
            subj = self.bnode_property_list()
            self.ws()
            if self.peek() != ".":
                self.po_list(subj)
        else:
            subj, kind = self.subject()
            self.ws()
            self.po_list(subj)

    def subject(self) -> tuple[str, str]:
        c = self.peek()
        if c == "<":
            return self.iri_ref(), "iri"
        if c == "_":
            return self.bnode_label(), "bnode"
        if c == "(":
            return self.collection(), "bnode"
        return self.pname(), "iri"

    def po_list(self, subj: str) -> None:
        while True:
            pred = self.predicate()
            self.ws()
            self.object_list(subj, pred)
            self.ws()
            if self.peek() != ";":
                return
            # the grammar allows ANY number of consecutive ';' and a
            # trailing one before '.' / ']'
            while self.peek() == ";":
                self.i += 1
                self.ws()
            if self.peek() in ".]" or self.i >= self.n:
                return

    def predicate(self) -> str:
        if self.s.startswith("a", self.i) and (
                self.i + 1 >= self.n
                or self.s[self.i + 1] in " \t\r\n<_([\"'#"):
            self.i += 1
            return RDF_TYPE
        if self.peek() == "<":
            return self.iri_ref()
        return self.pname()

    def object_list(self, subj: str, pred: str) -> None:
        while True:
            o, kind, lang, dtype = self.object_term()
            self.emit(subj, pred, o, kind, lang, dtype)
            self.ws()
            if self.peek() == ",":
                self.i += 1
                self.ws()
                continue
            return

    # --- terms ------------------------------------------------------
    def object_term(self) -> tuple[str, str, str | None, str | None]:
        c = self.peek()
        if c == "<":
            return self.iri_ref(), "iri", None, None
        if c in "\"'":
            return self.literal()
        if c == "_":
            return self.bnode_label(), "bnode", None, None
        if c == "[":
            return self.bnode_property_list(), "bnode", None, None
        if c == "(":
            return self.collection(), "bnode", None, None
        m = _NUM_RE.match(self.s, self.i)
        if m and (c.isdigit() or c in "+-."
                  and re.match(r"[+-]?\.?\d", self.s[self.i:self.i + 3])):
            lex = m.group(0)
            self.i = m.end()
            if "e" in lex or "E" in lex:
                dt = XSD + "double"
            elif "." in lex:
                dt = XSD + "decimal"
            else:
                dt = XSD + "integer"
            return lex, "literal", None, dt
        m = _BOOL_RE.match(self.s, self.i)
        if m:
            self.i = m.end()
            return m.group(0), "literal", None, XSD + "boolean"
        return self.pname(), "iri", None, None

    def iri_ref(self) -> str:
        m = _IRI_RE.match(self.s, self.i)
        if not m:
            raise self.err("expected <IRI>")
        self.i = m.end()
        return _resolve(self.base, _unescape(m.group(1), echars=False))

    def pname(self) -> str:
        m = _PNAME_NS_RE.match(self.s, self.i)
        if not m or not m.group(0).endswith(":"):
            raise self.err("expected prefixed name")
        prefix = m.group(0)[:-1]
        if prefix not in self.prefixes:
            raise self.err(f"undeclared prefix {prefix!r}")
        self.i = m.end()
        lm = _PN_LOCAL_RE.match(self.s, self.i)
        local = lm.group(0) if lm else ""
        self.i += len(local)
        # PN_LOCAL_ESC strips the backslash; %-escapes stay verbatim
        local = re.sub(r"\\([-_~.!$&'()*+,;=/?#@%])", r"\1", local)
        return self.prefixes[prefix] + local

    def bnode_label(self) -> str:
        m = _BNODE_RE.match(self.s, self.i)
        if not m:
            raise self.err("expected blank node label")
        self.i = m.end()
        lbl = m.group(0)
        if lbl.endswith("."):
            # the dot is the statement terminator, not label content
            self.i -= 1
            lbl = lbl[:-1]
        return lbl

    def bnode_property_list(self) -> str:
        self.eat("[")
        self.ws()
        node = self.fresh_bnode()
        if self.peek() != "]":
            self.po_list(node)
            self.ws()
        self.eat("]")
        return node

    def collection(self) -> str:
        self.eat("(")
        self.ws()
        items: list[tuple] = []
        while self.peek() != ")":
            if self.i >= self.n:
                raise self.err("unterminated collection")
            items.append(self.object_term())
            self.ws()
        self.eat(")")
        if not items:
            return RDF_NIL
        nodes = [self.fresh_bnode() for _ in items]
        for k, ((o, kind, lang, dtype), node) in enumerate(
                zip(items, nodes)):
            self.emit(node, RDF_FIRST, o, kind, lang, dtype)
            nxt = nodes[k + 1] if k + 1 < len(nodes) else RDF_NIL
            kind2 = "bnode" if k + 1 < len(nodes) else "iri"
            self.emit(node, RDF_REST, nxt, kind2)
        return nodes[0]

    def literal(self) -> tuple[str, str, str | None, str | None]:
        s, i = self.s, self.i
        q = s[i]
        if s.startswith(q * 3, i):
            end = s.find(q * 3, i + 3)
            while end != -1:
                # an escaped quote must not close the long literal
                k = end - 1
                while k >= i + 3 and s[k] == "\\":
                    k -= 1
                if (end - 1 - k) % 2 == 0:
                    break
                end = s.find(q * 3, end + 1)
            if end == -1:
                raise self.err("unterminated long literal")
            # tolerate up to 2 extra closing quotes belonging to body
            while end + 3 < self.n and s[end + 3] == q and \
                    s[end + 1:end + 4].count(q) == 3:
                end += 1
            body = s[i + 3:end]
            self.i = end + 3
        else:
            j = i + 1
            while True:
                if j >= self.n or s[j] in "\n\r":
                    raise self.err("unterminated literal")
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == q:
                    break
                j += 1
            body = s[i + 1:j]
            self.i = j + 1
        val = _unescape(body, echars=True)
        if self.s.startswith("@", self.i):
            m = re.match(r"@([A-Za-z]+(?:-[A-Za-z0-9]+)*)",
                         self.s[self.i:])
            if not m:
                raise self.err("bad language tag")
            self.i += m.end()
            return val, "literal", m.group(1), None
        if self.s.startswith("^^", self.i):
            self.i += 2
            dt = (self.iri_ref() if self.peek() == "<" else self.pname())
            return val, "literal", None, dt
        return val, "literal", None, None


def parse_turtle_text(text: str) -> list[tuple]:
    """Parse ONE Turtle document string → list of
    (subj, pred, obj, obj_kind, lang, datatype) tuples. Blank-node
    labels: declared ``_:x`` labels pass through; anonymous nodes get
    fresh ``_:b<n>`` labels numbered in document order."""
    return _Parser(text).parse()


def parse_turtle(docs: DataFrame, col: str = "value",
                 errors: str = "skip") -> DataFrame:
    """Parse a frame of whole Turtle DOCUMENTS (one row per file /
    shard) into the N-Triples reader's triple shape. ``errors='skip'``
    drops malformed documents (audit with :func:`turtle_errors`);
    ``'strict'`` raises and fails the job."""
    if errors not in ("skip", "strict"):
        raise ValueError("errors must be 'skip' or 'strict'")
    strict = errors == "strict"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["subj", "pred", "obj", "obj_kind", "lang", "datatype"]
        for pdf in batches:
            rows: list[tuple] = []
            for text in pdf[col]:
                try:
                    rows.extend(parse_turtle_text(text))
                except TurtleSyntaxError:
                    if strict:
                        raise
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(col).mapInPandas(run, TURTLE_SCHEMA)


def turtle_errors(docs: DataFrame, col: str = "value",
                  path_col: str | None = None) -> DataFrame:
    """Audit complement: one row per malformed document with
    line/column/reason. ``path_col`` (if present) identifies the file."""
    pcol = path_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx, text in pdf[col].items():
                try:
                    parse_turtle_text(text)
                except TurtleSyntaxError as e:
                    p = str(pdf[pcol][idx]) if pcol else None
                    rows.append((p, e.line, e.col, e.reason))
            yield pd.DataFrame(rows,
                               columns=["path", "line", "col", "error"])

    sel = [c for c in (pcol, col) if c]
    return docs.select(*sel).mapInPandas(run, ERROR_SCHEMA)


def read_turtle(spark: SparkSession, path: str,
                errors: str = "skip") -> DataFrame:
    """Load ``.ttl`` / ``.ttl.gz`` dump shards (one document per file;
    per-file parallelism, same contract as the WARC source)."""
    return parse_turtle(spark.read.text(path, wholetext=True),
                        errors=errors)
