"""Feature-hashed text embeddings: unit norm, layout independence, and
composition with the embedding near-dup stack (the SemDeDup-without-a-
model path). Cross-engine parity lives in test_rotated_queries."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from dbpedia_spotlight_spark.operators.embed import text_embeddings


def test_unit_norm_and_determinism(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(50)
    out = text_embeddings(docs, dim=32).toPandas()
    for v in out["embedding"]:
        n = math.sqrt(sum(x * x for x in v))
        assert abs(n - 1.0) < 1e-6 or n == 0.0
    # repartitioned input → identical vectors (layout independence)
    out2 = text_embeddings(docs.repartition(7), dim=32).toPandas()
    a = dict(zip(out["doc_id"], [tuple(v) for v in out["embedding"]]))
    b = dict(zip(out2["doc_id"], [tuple(v) for v in out2["embedding"]]))
    assert a == b


def test_similar_docs_have_high_cosine(spark):
    docs = spark.createDataFrame([
        Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=1, text="the quick brown fox jumps over the lazy cat"),
        Row(doc_id=2, text="completely disjoint vocabulary about spark "
                           "shuffles partitions executors broadcast"),
    ])
    out = {r["doc_id"]: r["embedding"]
           for r in text_embeddings(docs, dim=64).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(out[0], out[1]) > 0.7
    assert cos(out[0], out[2]) < 0.5


def test_composes_with_embedding_near_dup(spark):
    """Hashed vectors feed the existing ANN stack: a planted near-clone
    pair is found by cosine top-k over the generated embeddings."""
    from dbpedia_spotlight_spark.operators.similarity import cosine_topk
    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(30)
    clone = base.filter("doc_id = 3").withColumn("doc_id", F.lit(9999)) \
        .withColumn("text", F.concat("text", F.lit(" tail")))
    emb = text_embeddings(base.unionByName(clone), dim=64) \
        .withColumnRenamed("doc_id", "vec_id")
    top = cosine_topk(emb, query_ids=[9999], k=1).first()
    assert top["vec_id"] == 3


def test_embed_plan_is_udf_free(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = text_embeddings(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Python" not in plan and "InPandas" not in plan


def test_dim_validation(spark):
    with pytest.raises(ValueError):
        text_embeddings(
            spark.createDataFrame([Row(doc_id=1, text="x")]), dim=1)


def test_null_text_docs_get_zero_vector(spark):
    """Regression (session-8 review): null-text docs must appear with
    the zero vector (the DuckDB mirror emits them), not vanish."""
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="hello world"), Row(doc_id=1, text=None)])
    out = {r["doc_id"]: list(r["embedding"])
           for r in text_embeddings(docs, dim=8).collect()}
    assert set(out) == {0, 1}
    assert out[1] == [0.0] * 8
    assert any(x != 0.0 for x in out[0])
