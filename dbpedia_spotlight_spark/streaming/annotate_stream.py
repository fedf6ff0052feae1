"""Streaming annotate: the fused batch DAG lifted onto Structured
Streaming unchanged.

The batch pipeline (pipeline.annotate) is a pure map over documents —
filter/select/mapInPandas — which Structured Streaming supports verbatim,
so the SAME code path serves both. A stream of crawled pages becomes a
stream of annotations/triples with at-least-once parquet sinks +
checkpointing (the streaming analogue of the ParquetCatalog manifest
resume).

Scale notes: stateless per-document map → no watermark needed; sink
commits per micro-batch give checkpoint/resume for free
(``trigger(availableNow=True)`` drains a backlog then stops — the
batch-equivalence mode used in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbpedia_spotlight_spark.pipeline import PipelineConfig, annotate

WEB_PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
                 "text string, lang string")


def annotate_stream(spark: SparkSession, input_dir: str, model_bc,
                    cfg: PipelineConfig | None = None,
                    schema: str = WEB_PAGES_DDL) -> DataFrame:
    """readStream(parquet dir) → fused annotate → streaming DataFrame."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    return annotate(spark, src, model_bc, cfg)


def run_available_now(stream_df: DataFrame, out_dir: str,
                      checkpoint_dir: str) -> None:
    """Drain the current backlog to parquet and stop (deterministic —
    used by tests to assert stream ≡ batch)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
