"""SPARQL 1.1 text front-end for the KG query machinery.

``operators/ontology.py`` implements the SEMANTICS (BGP planning,
OPTIONAL/FILTER/VALUES/BIND/MINUS/EXISTS, aggregation, modifiers,
CONSTRUCT) against structured Python arguments; this module adds the
SYNTAX: ``sparql(kg, "SELECT ?e WHERE { ... }")`` parses a practical
SPARQL subset and dispatches to those operators, so a query is one
pasted string instead of hand-built pattern lists. The parser produces
arguments — every join/filter/aggregate decision stays in the planner,
so the text path and the structured path yield the SAME Spark plan.

Supported surface:

- ``PREFIX`` declarations (declared prefixes expand to their IRI;
  undeclared prefixed names pass through verbatim — matching the
  engine's plain-string term convention, e.g. ``itsrdf:taIdentRef``);
- ``SELECT [DISTINCT] * | ?v … | (expr AS ?alias) …`` — aggregate
  expressions route to ``bgp_aggregate`` (with ``GROUP BY`` /
  ``HAVING``), plain projections to ``bgp_select``;
- ``WHERE { … }`` with triple patterns ('.'-separated, ``;`` / ``,``
  predicate- and object-list abbreviations, ``a`` ≡ rdf:type, property
  paths passed through in the predicate position), ``OPTIONAL {}``,
  ``MINUS {}``, ``FILTER (expr)``, ``FILTER [NOT] EXISTS {}``,
  ``VALUES`` (single-var and row forms), ``BIND (expr AS ?v)``,
  ``{ SELECT … }`` subselects, and whole-body
  ``{ G1 } UNION { G2 }`` union groups;
- ``ORDER BY [ASC|DESC](?v) …``, ``LIMIT``, ``OFFSET``;
- ``ASK { … }`` (returns bool), ``CONSTRUCT { template } WHERE {}``,
  ``DESCRIBE <term>``, and ``DELETE {} INSERT {} WHERE {}`` updates;
- ``GRAPH ?g { … }`` / ``GRAPH <iri> { … }`` named-graph clauses over
  a QUAD snapshot (a frame with a ``graph`` column —
  ``triples.as_quads``): the group's patterns become 4-element quad
  patterns; the graph variable binds/projects like any other. GRAPH
  clauses also work INSIDE OPTIONAL / MINUS / FILTER (NOT) EXISTS
  bodies (``bgp_match`` accepts quads in every group). A GRAPH body
  may itself be a full group (nested OPTIONAL / MINUS / FILTER /
  BIND / VALUES): it is solved recursively with the graph term
  threaded onto every pattern at every depth (innermost GRAPH wins)
  and joined back on its shared variables. One scope caveat: a
  ``{ SELECT … }`` subselect nested inside a GRAPH body is evaluated
  over the full dataset, not scoped to the active graph.

FILTER / BIND / HAVING / aggregate expressions are Spark SQL over the
variable columns after ``?var`` → column substitution, with the common
SPARQL spellings mapped (``&&``/``||``/``!``, ``REGEX`` →
``regexp_like``, ``STRLEN`` → ``length``, ``LCASE``/``UCASE``,
``STRSTARTS``/``STRENDS``/``CONTAINS`` → ``startswith``/``endswith``/
``contains``, ``SUBSTR`` → ``substring`` (both 1-based), ``REPLACE``,
``BOUND(?x)`` → ``x IS NOT NULL``, ``STR()`` dropped, ``GROUP_CONCAT``
→ sorted ``array_join`` with the optional ``; SEPARATOR=".."``,
``SAMPLE`` → ``min``). Not covered (use
the structured API): federation, UNDEF in VALUES, FROM / FROM NAMED
dataset clauses (pre-filter the quad frame on its ``graph`` column
instead — one pushed isin filter expresses either dataset).
"""

from __future__ import annotations

import re
from pyspark.sql import DataFrame

_IRI, _LIT = "iri", "lit"
_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'",
            '"': '"'}


_IRIREF_RE = re.compile(r"<([^<>\"{}|^`\\\x00-\x20]*)>")


class _Env:
    def __init__(self) -> None:
        self.prefixes: dict[str, str] = {}
        self.slots: list[tuple[str, str]] = []


def _protect(text: str, env: _Env) -> str:
    """Replace <IRI>s and string literals with \\x00N\\x01 placeholders
    and strip # comments, so every later stage can split on whitespace
    and braces without tripping on quoted content."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "<":
            # IRIREF per the SPARQL grammar: no whitespace, quotes,
            # braces, or control chars between the angles. A '<' whose
            # span is not a valid IRIREF is the LESS-THAN operator
            # (e.g. FILTER(?x < 15)) and stays plain text.
            m = _IRIREF_RE.match(text, i)
            if m:
                env.slots.append((_IRI, m.group(1)))
                out.append(f"\x00{len(env.slots) - 1}\x01")
                i = m.end()
            else:
                out.append(c)
                i += 1
        elif c in "'\"":
            buf: list[str] = []
            j = i + 1
            while j < n and text[j] != c:
                if text[j] == "\\":
                    buf.append(_ESCAPES.get(text[j + 1], text[j + 1]))
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise ValueError("unterminated string literal")
            env.slots.append((_LIT, "".join(buf)))
            out.append(f"\x00{len(env.slots) - 1}\x01")
            i = j + 1
        elif c == "#":
            j = text.find("\n", i)
            i = n if j < 0 else j
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _braced(text: str, i: int) -> tuple[str, int]:
    """Content of the balanced {...} group starting at/after ``i``;
    returns (inner, index_after_close)."""
    start = text.index("{", i)
    depth = 0
    for j in range(start, len(text)):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                return text[start + 1:j], j + 1
    raise ValueError("unbalanced { } group")


def _parened(text: str, i: int) -> tuple[str, int]:
    start = text.index("(", i)
    depth = 0
    for j in range(start, len(text)):
        if text[j] == "(":
            depth += 1
        elif text[j] == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1:j], j + 1
    raise ValueError("unbalanced ( ) group")


def _term(tok: str, env: _Env, pred: bool = False) -> str:
    """One pattern term → the engine's plain-string convention.
    ``pred`` enables predicate-position-only syntax (the ``a``
    keyword)."""
    m = re.fullmatch(r"\x00(\d+)\x01([+*?]?)", tok)
    if m:
        return env.slots[int(m.group(1))][1] + m.group(2)
    if tok.startswith("?"):
        return tok
    if pred and tok == "a":
        return "rdf:type"
    if tok.startswith("^"):
        return "^" + _term(tok[1:], env, pred)
    path_suffix = ""
    if tok and tok[-1] in "+*?":
        tok, path_suffix = tok[:-1], tok[-1]
    m = re.fullmatch(r"([A-Za-z][\w-]*):(\S*)", tok)
    if m and m.group(1) in env.prefixes:
        tok = env.prefixes[m.group(1)] + m.group(2)
    return tok + path_suffix


def _group_concat_sql(m: re.Match) -> str:
    """GROUP_CONCAT(?v), with optional DISTINCT and ``; SEPARATOR=".."``
    (the literal is already a protected slot at this point). SPARQL
    leaves the concatenation order implementation-defined; this engine
    pins SORTED order — the one choice that is deterministic and
    partition-layout-independent, so results replay across engines."""
    coll = "collect_set" if m.group(1) else "collect_list"
    sep = m.group(3) if m.group(3) else "' '"
    return f"array_join(sort_array({coll}({m.group(2)})), {sep})"


_EXPR_MAP = [
    (re.compile(r"(?i)\bGROUP_CONCAT\s*\(\s*(DISTINCT\s+)?(\?\w+)\s*"
                r"(?:;\s*SEPARATOR\s*=\s*(\x00\d+\x01))?\s*\)"),
     _group_concat_sql),
    # SAMPLE is implementation-defined in SPARQL; min() is the
    # deterministic, layout-independent choice
    (re.compile(r"(?i)\bSAMPLE\s*\("), "min("),
    (re.compile(r"&&"), " AND "),
    (re.compile(r"\|\|"), " OR "),
    (re.compile(r"!(?![=])"), " NOT "),
    (re.compile(r"(?i)\bREGEX\s*\("), "regexp_like("),
    (re.compile(r"(?i)\bSTRLEN\s*\("), "length("),
    (re.compile(r"(?i)\bLCASE\s*\("), "lower("),
    (re.compile(r"(?i)\bUCASE\s*\("), "upper("),
    (re.compile(r"(?i)\bSTRSTARTS\s*\("), "startswith("),
    (re.compile(r"(?i)\bSTRENDS\s*\("), "endswith("),
    (re.compile(r"(?i)\bCONTAINS\s*\("), "contains("),
    (re.compile(r"(?i)\bSUBSTR\s*\("), "substring("),  # both 1-based
    (re.compile(r"(?i)\bREPLACE\s*\("), "replace("),
    (re.compile(r"(?i)\bBOUND\s*\(\s*(\?\w+)\s*\)"),
     r"(\1 IS NOT NULL)"),
    (re.compile(r"(?i)\bSTR\s*\(\s*(\?\w+)\s*\)"), r"\1"),
]


def _expr(expr: str, env: _Env) -> str:
    """FILTER/BIND/HAVING/aggregate expression → Spark SQL."""
    for pat, repl in _EXPR_MAP:
        expr = pat.sub(repl, expr)
    expr = re.sub(r"\?(\w+)", r"\1", expr)

    def _slot(m: re.Match) -> str:
        val = env.slots[int(m.group(1))][1]
        return "'" + val.replace("\\", "\\\\").replace("'", "\\'") + "'"

    return re.sub(r"\x00(\d+)\x01", _slot, expr).strip()


def _tokens(text: str) -> list[str]:
    """Whitespace tokens with trailing '.', ';', ',' split off (unless
    the token is a bare decimal number)."""
    out: list[str] = []
    for tok in text.split():
        # peel separators off the right, preserving their order
        tail: list[str] = []
        while (len(tok) > 1 and tok[-1] in ".;,"
               and not re.fullmatch(r"\d+\.\d*", tok)):
            tail.append(tok[-1])
            tok = tok[:-1]
        out.append(tok)
        out.extend(reversed(tail))
    return out


def _parse_patterns(body: str, env: _Env) -> list[tuple[str, str, str]]:
    """'.'-separated triple patterns with ';' predicate lists and ','
    object lists."""
    triples: list[tuple[str, str, str]] = []
    stmt: list[str] = []
    for tok in _tokens(body) + ["."]:
        if tok != ".":
            stmt.append(tok)
            continue
        if not stmt:
            continue
        subj = _term(stmt[0], env)
        i, pred = 1, None
        while i < len(stmt):
            if stmt[i] == ";":
                i += 1
                continue
            if stmt[i] == ",":
                if pred is None or not triples:
                    raise ValueError("',' before any predicate-object")
                triples.append((subj, pred, _term(stmt[i + 1], env)))
                i += 2
                continue
            if i + 1 >= len(stmt):
                raise ValueError(f"dangling term in pattern: {stmt}")
            pred = _term(stmt[i], env, pred=True)
            triples.append((subj, pred, _term(stmt[i + 1], env)))
            i += 2
        stmt = []
    return triples


def _parse_template(body: str, env: _Env) -> list[tuple]:
    """A mixed pattern block: plain triple patterns plus ``GRAPH
    <term> { … }`` groups whose patterns become 4-element quad
    patterns. Serves both the SPARQL 1.1 Update GRAPH-template form
    and the bodies of OPTIONAL / MINUS / FILTER (NOT) EXISTS groups —
    ``bgp_match`` accepts quads in every group, so the text front-end
    threads them through unchanged. A GRAPH sub-group must hold plain
    triple patterns only (the same restriction as a top-level GRAPH
    clause); any other structure inside it would tokenize into garbage
    constant patterns, so it is rejected loudly."""
    quads: list[tuple] = []
    plain: list[str] = []
    g_re = re.compile(r"(?i)(?<![:?\w\x00])GRAPH(?![\w:])")
    i = 0
    while True:
        m = g_re.search(body, i)
        if not m:
            plain.append(body[i:])
            break
        plain.append(body[i:m.start()])
        m2 = re.match(r"\s*([^\s{]+)", body[m.end():])
        if not m2:
            raise ValueError("GRAPH needs a ?var or IRI term")
        gterm = _term(m2.group(1), env)
        inner, i = _braced(body, m.end() + m2.end())
        if re.search(r"(?i)(?<![:?\w\x00])(OPTIONAL|MINUS|FILTER"
                     r"|VALUES|BIND|GRAPH)(?![\w:])|\{", inner):
            raise ValueError(
                "GRAPH groups support plain triple patterns only")
        quads.extend(p + (gterm,) for p in _parse_patterns(inner, env))
    return _parse_patterns(" ".join(plain), env) + quads


def _parse_group_body(body: str, env: _Env,
                      kg: DataFrame | None = None) -> dict | list:
    """An OPTIONAL / MINUS / FILTER (NOT) EXISTS group body is a full
    GroupGraphPattern: ``_parse_group`` recursively (triple patterns,
    GRAPH quads, group-local FILTERs, and nested OPTIONAL / MINUS /
    FILTER (NOT) EXISTS / BIND / VALUES / subselects at any depth).
    The result is the dict shape ``bgp_match`` groups accept — a bare
    pattern list when the group is plain patterns only, else
    {'patterns', ...kwargs}; ``bgp_match._group_frame`` solves nested
    structure by recursion (bottom-up SPARQL algebra). A filter naming
    an outer-only variable fails loudly at Spark analysis (unresolved
    column), never silently."""
    parts = _parse_group(body, env, kg)
    if not parts["patterns"]:
        raise ValueError(
            "OPTIONAL/MINUS/EXISTS groups need at least one triple "
            "pattern")
    kwargs = _group_kwargs(parts)
    if not kwargs:
        return parts["patterns"]
    return {"patterns": parts["patterns"], **kwargs}


def _parse_group(body: str, env: _Env, kg: DataFrame | None = None) -> dict:
    """A group graph pattern → bgp_match kwargs (+ 'patterns').
    A bare ``{ SELECT … }`` block becomes a subselect (solved to a
    DataFrame, joined on shared variables by the planner)."""
    parts: dict = {"patterns": [], "optional": [], "minus": [],
                   "exists": [], "not_exists": [], "filters": [],
                   "bind": {}, "values": None, "subqueries": []}
    plain: list[str] = []
    # keyword must stand alone: not part of a prefixed name (ex:minus),
    # a variable (?filter) or a placeholder — hence the :/?/word guards
    kw_re = re.compile(
        r"(?i)(?<![:?\w\x00])(OPTIONAL|MINUS|FILTER|VALUES|BIND|GRAPH)"
        r"(?![\w:])|\{")
    quads: list[tuple] = []
    i = 0
    while True:
        m = kw_re.search(body, i)
        if not m:
            plain.append(body[i:])
            break
        plain.append(body[i:m.start()])
        if m.group(0) == "{":
            inner, i = _braced(body, m.start())
            if not re.match(r"(?is)\s*SELECT\b", inner):
                raise ValueError(
                    "bare nested groups are supported only as "
                    "{ SELECT ... } subselects or { } UNION { } "
                    "branches")
            if kg is None:
                raise ValueError("subselect not allowed in this clause")
            parts["subqueries"].append(_select_frame(kg, inner, env))
            continue
        kw = m.group(1).upper()
        if kw == "GRAPH":
            # GRAPH <term> { plain patterns }: every pattern in the
            # group becomes a QUAD — its 4th element is the graph term
            # (variable or constant), matched against the snapshot's
            # 'graph' column by the planner. Nested keywords inside a
            # GRAPH group are not supported (wrap the GRAPH clause in
            # the outer group instead).
            m2 = re.match(r"\s*([^\s{]+)", body[m.end():])
            if not m2:
                raise ValueError("GRAPH needs a ?var or IRI term")
            gterm = _term(m2.group(1), env)
            inner, i = _braced(body, m.end() + m2.end())
            if re.search(r"(?i)(?<![:?\w\x00])(OPTIONAL|MINUS|FILTER"
                         r"|VALUES|BIND|GRAPH)(?![\w:])|\{", inner):
                raise ValueError(
                    "GRAPH groups support plain triple patterns only")
            quads.extend(p + (gterm,)
                         for p in _parse_patterns(inner, env))
            continue
        if kw in ("OPTIONAL", "MINUS"):
            # _parse_group_body: a full recursive GroupGraphPattern
            # (patterns + GRAPH quads + group-local FILTERs + nested
            # OPTIONAL/MINUS/EXISTS/BIND/VALUES at any depth)
            inner, i = _braced(body, m.end())
            parts["optional" if kw == "OPTIONAL" else "minus"].append(
                _parse_group_body(inner, env, kg))
        elif kw == "FILTER":
            m2 = re.match(r"(?is)\s*(NOT\s+)?EXISTS\b", body[m.end():])
            if m2:
                inner, i = _braced(body, m.end() + m2.end())
                key = "not_exists" if m2.group(1) else "exists"
                parts[key].append(_parse_group_body(inner, env, kg))
            else:
                # FILTER BrackettedExpression | FILTER BuiltInCall —
                # 'FILTER REGEX(?n, "^A")' is grammar-valid without the
                # wrapping parens; keep the call name in the expression
                m3 = re.match(r"\s*([A-Za-z_]\w*)\s*(?=\()",
                              body[m.end():])
                if m3:
                    args, i = _parened(body, m.end() + m3.end())
                    expr = f"{m3.group(1)}({args})"
                else:
                    expr, i = _parened(body, m.end())
                parts["filters"].append(_expr(expr, env))
        elif kw == "BIND":
            expr, i = _parened(body, m.end())
            m2 = re.match(r"(?is)^(.*)\bAS\s+(\?\w+)\s*$", expr)
            if not m2:
                raise ValueError(f"BIND needs (expr AS ?var): {expr}")
            parts["bind"][m2.group(2)] = _expr(m2.group(1), env)
        else:  # VALUES
            m2 = re.match(r"(?s)\s*(\?\w+|\([^)]*\))", body[m.end():])
            if not m2:
                raise ValueError("VALUES needs ?var or (vars)")
            spec = m2.group(1)
            inner, i = _braced(body, m.end() + m2.end())
            if spec.startswith("?"):
                vars_ = [spec]
                rows = [( _term(t, env),) for t in _tokens(inner)]
            else:
                vars_ = [v for v in spec[1:-1].split() if v]
                rows = []
                j = 0
                while True:
                    try:
                        row, j = _parened(inner, j)
                    except ValueError:
                        break
                    rows.append(tuple(_term(t, env)
                                      for t in _tokens(row)))
            parts["values"] = (vars_, rows)
    parts["patterns"] = _parse_patterns(" ".join(plain), env) + quads
    return parts


def _group_kwargs(parts: dict) -> dict:
    kw = {}
    for key in ("optional", "minus", "exists", "not_exists", "filters",
                "subqueries"):
        if parts[key]:
            kw[key] = parts[key]
    if parts["bind"]:
        kw["bind"] = parts["bind"]
    if parts["values"] is not None:
        kw["values"] = parts["values"]
    return kw


def _parse_modifiers(tail: str, env: _Env) -> dict:
    mods: dict = {"group_by": [], "having": None, "order_by": [],
                  "limit": None, "offset": 0}
    m = re.search(r"(?is)\bGROUP\s+BY\b(.*?)(?=\bHAVING\b|\bORDER\b"
                  r"|\bLIMIT\b|\bOFFSET\b|$)", tail)
    if m:
        mods["group_by"] = re.findall(r"\?\w+", m.group(1))
    m = re.search(r"(?is)\bHAVING\b\s*", tail)
    if m:
        expr, _ = _parened(tail, m.end() - 1)
        mods["having"] = _expr(expr, env)
    m = re.search(r"(?is)\bORDER\s+BY\b(.*?)(?=\bLIMIT\b|\bOFFSET\b|$)",
                  tail)
    if m:
        for d, v in re.findall(r"(?i)(?:\b(ASC|DESC)\s*\(\s*)?(\?\w+)",
                               m.group(1)):
            mods["order_by"].append(
                (v, "desc") if d.upper() == "DESC" else (v, "asc"))
    m = re.search(r"(?i)\bLIMIT\s+(\d+)", tail)
    if m:
        mods["limit"] = int(m.group(1))
    m = re.search(r"(?i)\bOFFSET\s+(\d+)", tail)
    if m:
        mods["offset"] = int(m.group(1))
    return mods


def sparql(kg: DataFrame, query: str):
    """Run a SPARQL query string over a (subj, pred, obj) snapshot.
    SELECT/CONSTRUCT return a DataFrame; ASK returns a bool."""
    from dbpedia_spotlight_spark.operators.ontology import ask, construct
    env = _Env()
    text = _protect(query, env)
    for m in re.finditer(r"(?i)\bPREFIX\s+([A-Za-z][\w-]*)?:\s*"
                         r"\x00(\d+)\x01", text):
        env.prefixes[m.group(1) or ""] = env.slots[int(m.group(2))][1]
    form = re.search(r"(?i)\b(SELECT|ASK|CONSTRUCT|DESCRIBE|DELETE"
                     r"|INSERT)\b", text)
    if not form:
        raise ValueError(
            "query must be SELECT, ASK, CONSTRUCT, DESCRIBE or "
            "DELETE/INSERT ... WHERE")
    kind = form.group(1).upper()

    if kind == "DESCRIBE":
        from dbpedia_spotlight_spark.operators.ontology import describe
        m = re.match(r"\s*(\S+)", text[form.end():])
        if not m or m.group(1).startswith("?"):
            raise ValueError("DESCRIBE needs a concrete term")
        return describe(kg, _term(m.group(1), env))

    if kind in ("DELETE", "INSERT"):
        from dbpedia_spotlight_spark.operators.ontology import update_kg
        delete = insert = None
        i = form.start()
        while True:
            m = re.match(r"(?is)\s*(DELETE|INSERT)\b", text[i:])
            if not m:
                break
            body, j = _braced(text, i + m.end())
            tmpl = _parse_template(body, env)
            if m.group(1).upper() == "DELETE":
                delete = tmpl
            else:
                insert = tmpl
            i = j
        mw = re.match(r"(?is)\s*WHERE\b", text[i:])
        if not mw:
            raise ValueError("DELETE/INSERT needs a WHERE group")
        body, _ = _braced(text, i + mw.end())
        parts = _parse_group(body, env)
        kw = _group_kwargs(parts)
        allowed = {k: v for k, v in kw.items()
                   if k in ("optional", "filters")}
        if set(kw) - set(allowed):
            raise ValueError(
                "DELETE/INSERT WHERE supports OPTIONAL and FILTER only")
        return update_kg(kg, parts["patterns"], delete=delete,
                         insert=insert, **allowed)

    if kind == "ASK":
        body, _ = _braced(text, form.end())
        parts = _parse_group(body, env, kg)
        return ask(kg, parts["patterns"], **_group_kwargs(parts))

    if kind == "CONSTRUCT":
        tmpl_body, after = _braced(text, form.end())
        template = _parse_patterns(tmpl_body, env)
        where = re.search(r"(?i)\bWHERE\b", text[after:])
        if not where:
            raise ValueError("CONSTRUCT needs a WHERE group")
        body, _ = _braced(text, after + where.end())
        parts = _parse_group(body, env)
        kw = _group_kwargs(parts)
        allowed = {k: v for k, v in kw.items()
                   if k in ("optional", "filters")}
        if set(kw) - set(allowed):
            raise ValueError(
                "CONSTRUCT supports OPTIONAL and FILTER groups only")
        return construct(kg, parts["patterns"], template, **allowed)

    # SELECT
    return _select_frame(kg, text[form.start():], env)


def _parse_projection(sel: str, env: _Env) -> list[tuple[str, str | None]]:
    """SELECT items in order: [] for '*', else (name, agg_expr|None)."""
    items: list[tuple[str, str | None]] = []
    sel = sel.strip()
    j = 0
    while j < len(sel):
        if sel[j].isspace():
            j += 1
        elif sel[j] == "*":
            return []
        elif sel[j] == "?":
            m = re.match(r"\?(\w+)", sel[j:])
            items.append((m.group(1), None))
            j += m.end()
        elif sel[j] == "(":
            inner, jn = _parened(sel, j)
            m = re.match(r"(?is)^(.*)\bAS\s+\?(\w+)\s*$", inner)
            if not m:
                raise ValueError(f"projection needs (expr AS ?v): {inner}")
            items.append((m.group(2), _expr(m.group(1), env)))
            j = jn
        else:
            raise ValueError(f"unexpected SELECT item at: {sel[j:]!r}")
    return items


def _try_union(kg: DataFrame, body: str, env: _Env) -> list[dict] | None:
    """``{ G1 } UNION { G2 } …`` as the whole group body → bgp_union
    branch dicts; None when the body is not that shape."""
    branches: list[dict] = []
    i = 0
    while True:
        m = re.match(r"(?s)\s*\{", body[i:])
        if not m:
            return None
        inner, i = _braced(body, i + m.end() - 1)
        if re.match(r"(?is)\s*SELECT\b", inner):
            return None          # a subselect block, not a union branch
        parts = _parse_group(inner, env, kg)
        branches.append({"patterns": parts["patterns"],
                         **_group_kwargs(parts)})
        m = re.match(r"(?is)\s*UNION\b", body[i:])
        if m:
            i += m.end()
            continue
        if body[i:].strip():
            return None          # trailing patterns → not a pure union
        break
    return branches if len(branches) >= 2 else None


def _finish_select(sols: DataFrame, items: list[tuple[str, str | None]],
                   distinct: bool, mods: dict) -> DataFrame:
    """Apply projection/aggregation + solution modifiers to an
    already-solved frame (the UNION path; single-group queries go
    through bgp_select/bgp_aggregate instead)."""
    from pyspark.sql import functions as F
    aggs = [(n, e) for n, e in items if e is not None]
    if aggs or mods["group_by"]:
        if not aggs:
            raise ValueError("GROUP BY without aggregate projections")
        keys = [v[1:] for v in mods["group_by"]]
        cols = [F.expr(e).alias(n) for n, e in aggs]
        sols = sols.groupBy(*keys).agg(*cols) if keys else sols.agg(*cols)
        if mods["having"]:
            sols = sols.filter(F.expr(mods["having"]))
        sols = sols.select(*[n for n, _ in items])
    elif items:
        sols = sols.select(*[n for n, _ in items])
    if distinct:
        sols = sols.dropDuplicates()
    if mods["order_by"]:
        cols = [F.col(v[1:]).desc() if d == "desc" else F.col(v[1:])
                for v, d in mods["order_by"]]
        sols = sols.orderBy(*cols)
    if mods["offset"]:
        sols = sols.offset(mods["offset"])
    if mods["limit"] is not None:
        sols = sols.limit(mods["limit"])
    return sols


def _select_frame(kg: DataFrame, text: str, env: _Env) -> DataFrame:
    """``SELECT … WHERE { … } modifiers`` → solved DataFrame (used for
    the top-level query and recursively for subselects)."""
    from dbpedia_spotlight_spark.operators.ontology import (
        bgp_aggregate, bgp_select, bgp_union,
    )
    form = re.search(r"(?i)\bSELECT\b", text)
    where = re.search(r"(?i)\bWHERE\b", text)
    if not form or not where or where.start() < form.end():
        raise ValueError("SELECT needs a WHERE group")
    sel = text[form.end():where.start()]
    distinct = bool(re.match(r"(?is)\s*DISTINCT\b", sel))
    if distinct:
        sel = re.sub(r"(?is)^\s*DISTINCT\b", "", sel)
    items = _parse_projection(sel, env)
    body, after = _braced(text, where.end())
    mods = _parse_modifiers(text[after:], env)

    union_groups = _try_union(kg, body, env)
    if union_groups is not None:
        return _finish_select(bgp_union(kg, union_groups), items,
                              distinct, mods)

    parts = _parse_group(body, env, kg)
    kw = _group_kwargs(parts)
    aggs = {name: expr for name, expr in items if expr is not None}
    if aggs or mods["group_by"]:
        if not aggs:
            raise ValueError("GROUP BY without aggregate projections")
        out = bgp_aggregate(kg, parts["patterns"],
                            group_by=mods["group_by"], aggregates=aggs,
                            having=mods["having"], **kw)
        return _finish_select(
            out.select(*[name for name, _ in items]), [],
            distinct, {**mods, "group_by": [], "having": None})

    select_vars = ["?" + name for name, _ in items] or None
    return bgp_select(kg, parts["patterns"], select_vars=select_vars,
                      distinct=distinct, order_by=mods["order_by"],
                      limit=mods["limit"], offset=mods["offset"], **kw)
