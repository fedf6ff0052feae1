"""robots.txt interpretation over a crawl corpus (webtext curation).

A Common-Crawl-style corpus carries each host's ``/robots.txt`` as just
another capture; respecting it is a per-host gate on every other url of
that host. This module implements the deterministic RFC 9309 subset:

- ``User-agent`` lines open a group (several consecutive UA lines share
  one group); a group applies when it names ``*`` or the configured
  agent token (case-insensitive). If any group names the agent exactly,
  the ``*`` groups are ignored for that host (most-specific-group rule).
- ``Allow`` / ``Disallow`` give path *prefixes*; the longest matching
  prefix decides, ``Allow`` winning length ties. An empty ``Disallow:``
  matches nothing (historical "allow all").
- ``$`` / ``*`` wildcards are NOT interpreted (documented subset — a
  wildcard rule is treated as a literal prefix and thus usually inert).
- No rule matches → allowed (and hosts with no robots.txt allow all).

Scale notes: the rules table is O(hosts × rules/host) — millions of
rows at web scale but tiny next to the corpus, and it is the build
product of a filter + parse over the corpus itself. The gate is a
broadcast join on host followed by a per-url max over matching rules
(native exprs; the corpus side never shuffles when the rules broadcast).
"""

from __future__ import annotations

from typing import Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BooleanType, IntegerType, StringType,
                               StructField, StructType)

RULES_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("allow", BooleanType()),
    StructField("prefix", StringType()),
    StructField("prefix_len", IntegerType()),
])


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """[(allow, path_prefix)] applicable to ``agent`` (module docstring
    semantics). Pure and total: malformed lines are skipped."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agent_run = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if key == "disallow" and not val:
                continue  # "Disallow:" = allow all (matches nothing)
            if val:
                cur_rules.append((key == "allow", val))
        else:
            in_agent_run = False
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    exact = [r for agents, rules in groups if agent in agents
             for r in rules]
    if agent != "*" and any(agent in agents for agents, _ in groups):
        return exact
    return exact + [r for agents, rules in groups
                    if "*" in agents and agent not in agents
                    for r in rules]


def robots_rules(corpus: DataFrame, url_col: str = "url",
                 text_col: str = "text", agent: str = "*") -> DataFrame:
    """Extract every ``/robots.txt`` capture from the corpus and parse
    it into the (host, allow, prefix, prefix_len) rules table. The
    filter prunes the scan to robots rows before the parse UDF runs."""
    rob = corpus.filter(
        F.col(url_col).rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+/robots\\.txt$"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for u, t in zip(b[url_col], b[text_col]):
                host = urlsplit(u).netloc.lower()
                for allow, prefix in parse_robots(t or "", agent=agent):
                    rows.append((host, allow, prefix, len(prefix)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RULES_SCHEMA.fields])

    return rob.select(url_col, text_col).mapInPandas(run, RULES_SCHEMA)


def robots_allowed(docs: DataFrame, rules: DataFrame,
                   url_col: str = "url",
                   out_col: str = "robots_allowed") -> DataFrame:
    """Gate column: longest-matching rule per url decides (Allow wins
    length ties); no matching rule or no rules for the host → allowed.
    Rules broadcast; the verdict is one groupBy over matched rules
    joined back — the corpus url set, never the payload, shuffles."""
    ns = F.regexp_replace(
        F.col(url_col), "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    host = F.lower(F.substring_index(ns, "/", 1))
    slash = F.locate("/", ns)
    path = F.when(slash > 0, ns.substr(slash, F.length(ns))) \
        .otherwise(F.lit("/"))
    keyed = docs.withColumn("_host", host).withColumn("_path", path)
    matched = (
        keyed.select(url_col, "_host", "_path").dropDuplicates([url_col])
        .join(F.broadcast(rules), F.col("_host") == rules["host"], "left")
        .withColumn(
            "_hit",
            F.col("prefix").isNotNull()
            & F.col("_path").startswith(F.col("prefix")))
        .groupBy(url_col)
        .agg(F.max(F.when(
            F.col("_hit"),
            F.struct(F.col("prefix_len"),
                     F.col("allow").cast("int").alias("allow_i"))))
             .alias("best"))
        .select(url_col,
                F.coalesce(F.col("best.allow_i") == 1, F.lit(True))
                .alias(out_col))
    )
    return keyed.drop("_host", "_path").join(matched, url_col, "left") \
        .fillna({out_col: True})


def apply_robots(docs: DataFrame, url_col: str = "url",
                 text_col: str = "text", agent: str = "*",
                 drop_robots_rows: bool = True) -> DataFrame:
    """One-call curation form: build the rules from the corpus's own
    robots.txt captures, gate every url, drop the disallowed rows (and,
    by default, the robots.txt rows themselves — they are directives,
    not content)."""
    rules = robots_rules(docs, url_col=url_col, text_col=text_col,
                         agent=agent)
    gated = robots_allowed(docs, rules, url_col=url_col)
    out = gated.filter(F.col("robots_allowed")).drop("robots_allowed")
    if drop_robots_rows:
        out = out.filter(~F.col(url_col).rlike(
            "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+/robots\\.txt$"))
    return out
