"""SHACL-core-lite shape validation over the materialized KG.

A KG construction pipeline needs a *quality gate* on its own output the
same way the text side has Gopher/C4 gates: published KGs ship with
shape constraints (SHACL node shapes — W3C SHACL core) and CI rejects a
build whose validation report regresses. This module implements the
useful core as one relational pass: focus-node targeting
(``sh:targetClass``, ``sh:targetSubjectsOf``) and per-path constraint
components ``sh:minCount`` / ``sh:maxCount`` / ``sh:pattern`` /
``sh:nodeKind`` / ``sh:class`` / ``sh:in`` / ``sh:hasValue``, plus
SHACL's inverse paths. The output is the validation report as data —
one row per violation, shaped like SHACL's ``sh:ValidationResult``
(focusNode, sourceShape, resultPath, sourceConstraintComponent, value).

Scale shape (10^9-entity KG): the shapes themselves are tiny (schema
side); every constraint compiles to scans of the triple store with the
predicate filter pushed down. Cardinality checks are one map-side-
combinable ``count(distinct)`` per (focus, path); value checks are pure
projections; ``sh:class`` is an anti-join against the (entity, type)
slice keyed on the VALUE side (bounded by |typed entities|, never
|triples|). Nothing collects; the per-constraint branches union into
one plan so AQE sizes each exchange independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "rdf:type"

# sh:nodeKind heuristic over a plain string store: an IRI is a term
# with a URI scheme prefix (RFC 3986 scheme = ALPHA *(ALPHA/DIGIT/+/-/.)
# followed by ':'); everything else is a literal. A production store
# with a real term dictionary would carry the kind as a column.
_IRI_RE = "^[A-Za-z][A-Za-z0-9+.-]*:"

_REPORT_COLS = ("shape", "focus", "path", "component", "value", "got")

# sh:datatype lexical spaces (XSD 1.1 canonical-ish forms) — anchored
# full-match regexes evaluated JVM-side. A plain string store has no
# ^^tags, so datatype validation here = "the value parses".
_DATATYPE_RE = {
    "integer": r"^[+-]?\d+$",
    "decimal": r"^[+-]?(\d+(\.\d*)?|\.\d+)$",
    "boolean": r"^(true|false|0|1)$",
    "dateTime": (r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"
                 r"(\.\d+)?(Z|[+-]\d{2}:\d{2})?$"),
}


def _focus(kg: DataFrame, types: DataFrame, shape: dict) -> DataFrame:
    """Focus-node set of one shape: distinct single-column ``focus``."""
    if "target_class" in shape:
        return (types.filter(F.col("obj") == shape["target_class"])
                .select(F.col("subj").alias("focus")).dropDuplicates())
    if "target_subjects_of" in shape:
        return (kg.filter(F.col("pred") == shape["target_subjects_of"])
                .select(F.col("subj").alias("focus")).dropDuplicates())
    raise ValueError(
        f"shape {shape.get('shape')!r} needs target_class or "
        "target_subjects_of")


def _values(kg: DataFrame, path: str, inverse: bool) -> DataFrame:
    """(focus, value) pairs reachable over ``path`` (inverse: focus is
    the statement object). Predicate filter pushes to the scan."""
    stmts = kg.filter(F.col("pred") == path)
    if inverse:
        return stmts.select(F.col("obj").alias("focus"),
                            F.col("subj").alias("value"))
    return stmts.select(F.col("subj").alias("focus"),
                        F.col("obj").alias("value"))


def _report(shape: str, path: str, component: str, rows: DataFrame,
            value: bool) -> DataFrame:
    sel = [F.lit(shape).alias("shape"), F.col("focus"),
           F.lit(path).alias("path"), F.lit(component).alias("component")]
    if value:
        sel += [F.col("value"), F.lit(None).cast("long").alias("got")]
    else:
        sel += [F.lit(None).cast("string").alias("value"),
                F.col("got").cast("long")]
    return rows.select(*sel)


def validate_shapes(kg: DataFrame, shapes: list[dict],
                    types: DataFrame | None = None,
                    focus_filter: DataFrame | None = None) -> DataFrame:
    """Validate ``kg`` (subj, pred, obj) against SHACL-lite ``shapes``;
    return the violation report (shape, focus, path, component, value,
    got) — empty means conformant.

    Each shape dict: ``shape`` (name), one of ``target_class`` /
    ``target_subjects_of``, and ``constraints`` — a list of dicts with
    ``path`` (+ ``inverse: True`` for ``^path``) and any of:

    - ``min_count`` / ``max_count`` — distinct-value cardinality per
      focus node (SHACL counts value nodes; set semantics);
    - ``pattern`` — every value must match the regex;
    - ``node_kind`` — ``"IRI"`` or ``"Literal"`` (scheme-prefix
      heuristic, see ``_IRI_RE``);
    - ``cls`` — every value must carry ``rdf:type cls`` (sh:class);
    - ``in_set`` — every value must be one of the listed terms;
    - ``has_value`` — at least one value equals the term (violation
      row carries the MISSING term with got=NULL);
    - ``min_length`` / ``max_length`` — sh:minLength/maxLength over the
      value's string form;
    - ``datatype`` — ``"integer"`` / ``"decimal"`` / ``"boolean"`` /
      ``"dateTime"`` lexical-form check (sh:datatype over a plain
      string store: the VALUE must parse in the datatype's lexical
      space — the useful half of datatype validation when terms don't
      carry explicit ``^^`` tags).

    ``types`` defaults to the kg's own asserted rdf:type statements;
    pass ``infer_types(...)`` output to validate against the RDFS
    closure instead (entailed validation).

    ``focus_filter`` (single-column ``focus`` frame) restricts
    validation to those focus nodes — the incremental hook
    ``validate_shapes_delta`` uses; every constraint scan then prunes
    early on the (usually small, broadcastable) filter semi-join.
    """
    if types is None:
        types = kg.filter(F.col("pred") == RDF_TYPE)
    types = types.select("subj", "obj")
    spark = kg.sparkSession
    reports: list[DataFrame] = []
    for shape in shapes:
        name = shape["shape"]
        focus = _focus(kg, types, shape)
        if focus_filter is not None:
            focus = focus.join(focus_filter.select("focus"), "focus",
                               "left_semi")
        for con in shape.get("constraints", ()):
            path, inverse = con["path"], bool(con.get("inverse"))
            disp = ("^" + path) if inverse else path
            vals = _values(kg, path, inverse)
            fvals = focus.join(vals, "focus")
            if "min_count" in con or "max_count" in con:
                counts = (fvals.groupBy("focus")
                          .agg(F.countDistinct("value").alias("got")))
                # focus nodes with ZERO values only exist on the focus
                # frame — left join, coalesce to 0
                counted = (focus.join(counts, "focus", "left")
                           .withColumn("got", F.coalesce("got", F.lit(0))))
                if "min_count" in con:
                    reports.append(_report(
                        name, disp, "minCount",
                        counted.filter(F.col("got") < con["min_count"]),
                        value=False))
                if "max_count" in con:
                    reports.append(_report(
                        name, disp, "maxCount",
                        counted.filter(F.col("got") > con["max_count"]),
                        value=False))
            if "pattern" in con:
                reports.append(_report(
                    name, disp, "pattern",
                    fvals.filter(~F.col("value").rlike(con["pattern"])),
                    value=True))
            if "node_kind" in con:
                is_iri = F.col("value").rlike(_IRI_RE)
                bad = ~is_iri if con["node_kind"] == "IRI" else is_iri
                reports.append(_report(
                    name, disp, "nodeKind", fvals.filter(bad), value=True))
            if "cls" in con:
                typed = (types.filter(F.col("obj") == con["cls"])
                         .select(F.col("subj").alias("value")))
                reports.append(_report(
                    name, disp, "class",
                    fvals.join(typed, "value", "left_anti"), value=True))
            if "in_set" in con:
                reports.append(_report(
                    name, disp, "in",
                    fvals.filter(~F.col("value").isin(*con["in_set"])),
                    value=True))
            if "min_length" in con:
                reports.append(_report(
                    name, disp, "minLength",
                    fvals.filter(F.length("value") < con["min_length"]),
                    value=True))
            if "max_length" in con:
                reports.append(_report(
                    name, disp, "maxLength",
                    fvals.filter(F.length("value") > con["max_length"]),
                    value=True))
            if "datatype" in con:
                dt = con["datatype"]
                if dt not in _DATATYPE_RE:
                    raise ValueError(
                        f"unsupported sh:datatype {dt!r} "
                        f"(one of {sorted(_DATATYPE_RE)})")
                reports.append(_report(
                    name, disp, "datatype",
                    fvals.filter(~F.col("value").rlike(_DATATYPE_RE[dt])),
                    value=True))
            if "has_value" in con:
                holders = (fvals.filter(F.col("value") == con["has_value"])
                           .select("focus").dropDuplicates())
                missing = (focus.join(holders, "focus", "left_anti")
                           .withColumn("value", F.lit(con["has_value"])))
                reports.append(_report(
                    name, disp, "hasValue", missing, value=True))
    if not reports:
        return spark.createDataFrame(
            [], "shape string, focus string, path string, "
                "component string, value string, got long")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.dropDuplicates(list(_REPORT_COLS))


def _affected_focus(kg: DataFrame, delta: DataFrame,
                    shapes: list[dict]) -> DataFrame:
    """Conservative superset of focus nodes whose report rows can
    change under ``delta`` (added+removed triples): every delta subject
    and object (own-triple constraints, focus membership, inverse
    paths), plus — for sh:class constraints — every focus whose
    constraint-path VALUE had an rdf:type change (the one cross-node
    dependency in SHACL core)."""
    d = delta.select("subj", "pred", "obj")
    touched = (d.select(F.col("subj").alias("focus"))
               .unionByName(d.select(F.col("obj").alias("focus"))))
    typed_changed = (d.filter(F.col("pred") == RDF_TYPE)
                     .select(F.col("subj").alias("value"))
                     .dropDuplicates())
    for shape in shapes:
        for con in shape.get("constraints", ()):
            if "cls" not in con:
                continue
            vals = _values(kg, con["path"], bool(con.get("inverse")))
            touched = touched.unionByName(
                vals.join(F.broadcast(typed_changed), "value",
                          "left_semi").select("focus"))
    return touched.dropDuplicates()


def validate_shapes_delta(kg: DataFrame, delta: DataFrame,
                          shapes: list[dict], old_report: DataFrame,
                          types: DataFrame | None = None) -> DataFrame:
    """Incremental validation: fold a triple delta into an existing
    validation report WITHOUT revalidating the whole snapshot — the
    report-side twin of the counting-IVM entailment maintenance.
    ``kg`` is the POST-delta snapshot, ``delta`` the change log
    (subj, pred, obj [, change, url] — both added and removed rows),
    ``old_report`` the previous generation's report (same ``shapes``).

    Affected focus nodes are recomputed exactly (``focus_filter``
    prunes every constraint scan); untouched report rows carry over via
    one anti-join. Result ≡ ``validate_shapes(kg, shapes)`` — the
    equivalence is pytest-pinned. At 10^12-document scale a recrawl
    delta touches a vanishing fraction of focus nodes, so per-gen
    validation cost tracks |delta|, not |KG|."""
    aff = _affected_focus(kg, delta, shapes)
    fresh = validate_shapes(kg, shapes, types=types, focus_filter=aff)
    kept = old_report.join(aff, "focus", "left_anti")
    return kept.select(*_REPORT_COLS).unionByName(
        fresh.select(*_REPORT_COLS))


def drop_nonconforming(kg: DataFrame, report: DataFrame) -> DataFrame:
    """Gate application: the conforming snapshot — every triple whose
    SUBJECT is a violating focus node is dropped (the KG-side analogue
    of the text side's Gopher gate dropping whole documents, not
    sentences). One anti-join against the distinct focus set; violating
    entities may still appear as OBJECTS — dangling references are a
    reporting concern (``kg_stats``), not a validity one."""
    bad = report.select(F.col("focus").alias("subj")).dropDuplicates()
    return kg.join(bad, "subj", "left_anti")


def shape_summary(report: DataFrame) -> DataFrame:
    """CI rollup of a validation report: violation count and distinct
    violating focus nodes per (shape, path, component) — the number a
    build gate compares against the previous snapshot's. Map-side-
    combinable aggregates only."""
    return (report.groupBy("shape", "path", "component")
            .agg(F.count("*").alias("n_violations"),
                 F.countDistinct("focus").alias("n_focus"))
            .orderBy("shape", "path", "component"))
