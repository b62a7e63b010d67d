"""Bucketing co-location evidence (the brief's "bucketing for co-located
joins" lever, demonstrated on the executed plan): two tables bucketed by
the join key into the same bucket count join WITHOUT any shuffle
exchange — the physical property that at 100 TB turns a fact-fact join
from a full-network shuffle into node-local stitching. The contrast
case (same join over plain parquet) must plan hash-partitioning
exchanges, so the assertion can't pass vacuously."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.tables import table


def _executed(df) -> str:
    df.count()  # force AQE to finalize the physical plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    left = d.select("doc_id", "lang")
    right = d.select("doc_id", F.length("text").alias("n_chars"))
    spark.sql("DROP TABLE IF EXISTS bkt_docs_left")
    spark.sql("DROP TABLE IF EXISTS bkt_docs_right")
    try:
        (left.write.bucketBy(8, "doc_id").sortBy("doc_id")
             .mode("overwrite").saveAsTable("bkt_docs_left"))
        (right.write.bucketBy(8, "doc_id").sortBy("doc_id")
              .mode("overwrite").saveAsTable("bkt_docs_right"))
        a = spark.table("bkt_docs_left").hint("MERGE")
        b = spark.table("bkt_docs_right")
        joined = a.join(b, "doc_id")
        assert joined.count() == left.count()
        plan = _executed(a.join(b, "doc_id"))
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan

        # contrast: the identical join over non-bucketed inputs MUST
        # shuffle both sides — proves the assertion above is earned by
        # bucketing, not by plan-printing quirks
        plain = _executed(left.hint("MERGE").join(right, "doc_id"))
        assert "Exchange hashpartitioning" in plain
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_docs_left")
        spark.sql("DROP TABLE IF EXISTS bkt_docs_right")
