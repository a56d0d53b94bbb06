"""Physical-plan audits: the plan properties that matter at 100 TB.

Each assertion pins a scale property: filters reach the parquet scan,
column pruning works, small dims broadcast, the fused extraction path
is shuffle-free, salted aggregation is two-phase.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em
from deepie_spark.operators.extract import extract_triples_fused
from deepie_spark.sources.synth import corpus_dataframes

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_pricing_summary_pushdown_and_pruning(spark):
    p = plan_of(em.q_pricing_summary(spark, SF))
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters", 1)[1][:200]
    # column pruning: unused columns never read
    read_schema = p.split("ReadSchema", 1)[1][:400]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    # partial aggregation before the exchange (map-side combine)
    assert "partial_sum" in p and "hashpartitioning" in p


def test_revenue_join_broadcasts_dims(spark):
    p = plan_of(em.q_revenue_by_nation(spark, SF))
    # every dim join broadcasts; no sort-merge shuffle join anywhere
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p
    # the fact table is scanned, not broadcast: BuildRight with lineitem
    # as the left (streamed) child of the innermost join
    assert "BuildRight" in p


def test_fused_extraction_is_shuffle_free(spark, extractor):
    pages_df, _, _ = corpus_dataframes(spark, 20)
    bc = spark.sparkContext.broadcast(extractor)
    p = plan_of(extract_triples_fused(pages_df, bc))
    assert "Exchange" not in p  # zero shuffles end-to-end
    assert "MapInPandas" in p
    # html/binary column pruned before the python stage
    assert "html" not in p.split("MapInPandas", 1)[0]


def test_extraction_scan_prunes_html_from_parquet(spark, extractor, tmp_path):
    pages_df, _, _ = corpus_dataframes(spark, 20)
    path = str(tmp_path / "pages")
    pages_df.write.parquet(path)
    bc = spark.sparkContext.broadcast(extractor)
    p = plan_of(extract_triples_fused(spark.read.parquet(path), bc))
    read_schema = p.split("ReadSchema", 1)[1][:300]
    assert "html" not in read_schema and "warc_ts" not in read_schema


def test_salted_count_is_two_phase(spark):
    p = plan_of(em.q_salted_source_counts(spark, SF))
    # partial agg on (key, salt), exchange, final agg on key
    assert p.count("HashAggregate") >= 2


def test_mention_alias_join_broadcasts(spark):
    p = plan_of(em.q_mention_candidates(spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Bucketed tables co-locate join keys: the equi-join plan has no
    Exchange on either side (the Iceberg bucket(url) strategy)."""
    from deepie_spark.sources.lakehouse import Lakehouse

    lake = Lakehouse(tmp_path / "lake", spark)
    a = spark.range(0, 2000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 2000).withColumn("w", F.col("id") + 1)
    lake.write_bucketed(a, "bk_a", ["id"], n_buckets=8)
    lake.write_bucketed(b, "bk_b", ["id"], n_buckets=8)
    # force the sort-merge path (at real scale neither side broadcasts)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lake.read_table("bk_a").join(lake.read_table("bk_b"), "id")
        p = plan_of(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # co-located: no shuffle at all
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_build_vocab_no_single_partition_funnel(spark):
    """Global frequency ranking must NOT funnel every token through one
    partition: the two-phase rank keeps all exchanges partitioned
    (range/hash), with offsets joined from a broadcast K-row table."""
    p = plan_of(em.q_vocab_ranked(spark, SF))
    assert "Exchange SinglePartition" not in p
    assert "rangepartitioning" in p.lower()
    assert "BroadcastHashJoin" in p


def test_ner_spans_no_row_python_udf(spark):
    p = plan_of(em.q_ner_spans(spark, SF))
    assert "BatchEvalPython" not in p  # no row-at-a-time python UDF
    assert "MapInPandas" in p  # Arrow-batched kernel


def test_ann_topk_take_ordered_not_global_sort(spark):
    p = plan_of(em.q_ann_topk(spark, SF))
    assert "TakeOrderedAndProject" in p  # no full sort shuffle for top-k


def test_per_predicate_prf_is_single_join(spark):
    """The grouped metric must be ONE full-outer join + ONE grouped agg
    (the _tp_fp_fn pattern) — the old inner + two anti-join shape
    recomputed the pred-vs-gold join three times."""
    from deepie_spark.operators import metrics as M

    pred = spark.createDataFrame(
        [("u1", "s", "p1", {"@value": "o"})],
        "url string, subject string, predicate string, object map<string,string>",
    )
    gold = spark.createDataFrame(
        [("u1", "s", "p2", {"@value": "o"})],
        "url string, subject string, predicate string, object map<string,string>",
    )
    plan = (
        M.per_predicate_prf(pred, gold)
        ._jdf.queryExecution().executedPlan().toString()
    )
    joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") \
        + plan.count("ShuffledHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert joins == 1, plan
    assert "FullOuter" in plan, plan


def test_badcases_is_single_join(spark):
    from deepie_spark.operators import metrics as M

    pred = spark.createDataFrame(
        [("u1", "s", "p1", {"@value": "o"})],
        "url string, subject string, predicate string, object map<string,string>",
    )
    gold = spark.createDataFrame(
        [("u1", "s", "p2", {"@value": "o"})],
        "url string, subject string, predicate string, object map<string,string>",
    )
    plan = M.badcases(pred, gold)._jdf.queryExecution().executedPlan().toString()
    joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") \
        + plan.count("ShuffledHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert joins == 1, plan
    assert "FullOuter" in plan, plan


def test_encoder_grids_shuffle_free(spark):
    """The weight-artifact verification pass is one mapInPandas over
    pages: zero shuffles, broadcast tensors only."""
    p = plan_of(em.q_encoder_grids(spark, SF))
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_neural_ner_no_key_shuffle_and_pruned(spark):
    """TENER NER: one mapInPandas pass with no KEY shuffle anywhere
    (the only Exchange is the test-scale round-robin spread of the
    single small parquet file, which disappears at production split
    counts — see _docs), and the parquet scan reads only
    (doc_id, text)."""
    p = plan_of(em.q_neural_ner(spark, SF))
    assert "MapInPandas" in p
    assert "hashpartitioning" not in p and "rangepartitioning" not in p
    read_schema = p.split("ReadSchema", 1)[1][:300]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "embedding" not in read_schema and "n_chars" not in read_schema


def test_jaccard_verify_stage_no_generate(spark):
    """dedup_clusters' verify stage: candidates-given Jaccard is
    pair-local — the full dedup plan may explode band ids (LSH), but
    the verify sub-plan built on candidates contains no Generate and
    no gram-keyed join (see test_dedup for the operator-level test);
    here we pin that the end-to-end dedup_clusters plan has no
    CartesianProduct and at most the expected exchange count."""
    df = em.q_dedup_clusters(spark, SF)
    p = plan_of(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "array_intersect" in p  # the pair-local verify really runs
