"""Declarative DataFrame plans: model-build aggregations (SURVEY §2.13),
URI canonicalization closure (§2.7), and the annotate DAGs (§3.1)."""
