"""Pure, deterministic scalar functions (no Spark imports).

These are the byte-exact kernels that pandas UDFs wrap. Keeping them
Spark-free makes them unit-testable and lets the synthetic-data generator
share the *same* code paths the pipeline uses (which is how the
byte-identical extraction gate is guaranteed).
"""

from dbpedia_spotlight_spark.functions.extraction import strip_html
from dbpedia_spotlight_spark.functions.tokenizer import tokenize, tokenize_ids

__all__ = ["strip_html", "tokenize", "tokenize_ids"]
