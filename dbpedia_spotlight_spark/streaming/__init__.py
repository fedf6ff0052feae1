# Structured Streaming surface. The reference is batch-only (SURVEY
# §1.2/§2.15); these operators are the idiomatic-Spark extension of the
# same pipeline to streams, not reference-parity code.
