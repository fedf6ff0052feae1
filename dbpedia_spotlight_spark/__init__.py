"""dbpedia_spotlight_spark — a PySpark-native knowledge-graph-construction
engine with the query/data-processing capabilities of DBpedia Spotlight
(reference: Adam-whj/dbpedia-spotlight; see SURVEY.md).

Architecture (Spark-first, not a port):

- The corpus is a DataFrame of ``web_pages(url, warc_ts, html, text, lang)``
  (BASELINE.json input_hint).
- The model plane (surface forms, entities, pair counts, context vectors,
  token LM) lives in small Parquet "lexicon tables", compiled driver-side
  into numpy packed arrays + an Aho-Corasick automaton and **broadcast**.
- All per-row logic runs in Arrow-batched pandas UDFs / mapInPandas —
  never per-row Python.
- The flagship annotate DAG is **shuffle-free**: entity linking is
  embarrassingly parallel per document, so spotting, candidate lookup,
  disambiguation and filtering are fused into one mapInPandas pass over
  the corpus partitions (SURVEY.md §3.1 "fuse UDFs"). A relational
  (explode → broadcast join → window) path exists for cross-checking.
"""

__version__ = "0.1.0"
