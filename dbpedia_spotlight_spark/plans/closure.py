"""URI canonicalization closure (SURVEY.md §2.7 K1–K3).

Reference behavior: ``db/WikipediaToDBpediaClosure.scala`` [U] transitively
resolves redirect chains to final targets, drops disambiguation pages, and
encodes Wikipedia titles as DBpedia URIs.

Spark mapping: redirect chains in Wikipedia are short (<5 hops), so the
closure is an iterative **broadcast self-join to fixpoint** — each round
substitutes one more hop; rounds = chain length, and the `redirects` map is
tiny relative to the corpus, so every join is a broadcast hash join (no
shuffle of the big side; here both sides are small anyway).

Cycle handling: a node that can reach a cycle never reaches a sink; after
``max_hops`` rounds any still-moving src is resolved deterministically to
the lexicographic min of {src, dst} (SURVEY §2.7 K1 deterministic
cycle-break).
"""

from __future__ import annotations

import urllib.parse

from pyspark.sql import DataFrame, functions as F


def redirect_closure(redirects: DataFrame, max_hops: int = 10) -> DataFrame:
    """(src_uri, dst_uri) edges → (src_uri, final_uri) transitive map.

    K1. Pure DataFrame iteration; each round is
    ``r LEFT JOIN broadcast(edges) ON r.final = edges.src`` + coalesce.
    """
    edges = redirects.select(
        F.col("src_uri").alias("e_src"), F.col("dst_uri").alias("e_dst")
    ).dropDuplicates(["e_src"])

    r = redirects.select(
        F.col("src_uri"), F.col("dst_uri").alias("final_uri")
    ).dropDuplicates(["src_uri"])

    for _ in range(max_hops):
        stepped = (
            r.join(F.broadcast(edges), r["final_uri"] == edges["e_src"], "left")
            .select(
                "src_uri",
                F.coalesce("e_dst", "final_uri").alias("next_uri"),
                "final_uri",
            )
        )
        moved = stepped.filter(
            (F.col("next_uri") != F.col("final_uri"))
            # cycle guard: never step back onto the chain origin
            & (F.col("next_uri") != F.col("src_uri"))
        ).limit(1).count()
        r = stepped.select(
            "src_uri",
            F.when(F.col("next_uri") == F.col("src_uri"), F.col("final_uri"))
            .otherwise(F.col("next_uri"))
            .alias("final_uri"),
        )
        if moved == 0:
            break

    # deterministic cycle-break: for srcs still sitting on a redirect source
    # (i.e. final is itself a redirect src → unresolvable cycle), take
    # lexicographic min of (src, final)
    still = r.join(
        F.broadcast(edges.select(F.col("e_src").alias("final_uri"))),
        "final_uri",
        "left_semi",
    ).select("src_uri", "final_uri")
    resolved = r.join(still.select("src_uri"), "src_uri", "left_anti")
    broken = still.select(
        "src_uri", F.least("src_uri", "final_uri").alias("final_uri")
    )
    return resolved.unionByName(broken)


def drop_disambiguation(entities: DataFrame, disambiguations: DataFrame) -> DataFrame:
    """K2: remove disambiguation-page entities — a broadcast left-anti join."""
    return entities.join(
        F.broadcast(disambiguations.select("uri")), "uri", "left_anti"
    )


def canonicalize_uris(df: DataFrame, closure: DataFrame, uri_col: str) -> DataFrame:
    """Rewrite ``uri_col`` through the redirect closure (broadcast map)."""
    cmap = closure.select(
        F.col("src_uri").alias(uri_col), F.col("final_uri")
    )
    return (
        df.join(F.broadcast(cmap), uri_col, "left")
        .withColumn(uri_col, F.coalesce("final_uri", uri_col))
        .drop("final_uri")
    )


def wiki_title_to_dbpedia_uri(title: str) -> str:
    """K3: Wikipedia title → DBpedia URI (pure function, unit-tested).

    Rules (model/DBpediaResource.scala [U]): spaces → underscores,
    percent-encode everything outside RFC-3986 unreserved + a safe set
    that DBpedia leaves literal.
    """
    t = title.strip().replace(" ", "_")
    return "http://dbpedia.org/resource/" + urllib.parse.quote(
        t, safe="_()!*',.;:@&=+$-~"
    )
