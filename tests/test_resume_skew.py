"""Mid-crawl resume (kill after stage k) and hub-entity salting
equality (SURVEY.md §5 test plan items 5-6)."""

import pytest
from pyspark.sql import functions as F

from deepie_spark.operators import extract as ex_ops
from deepie_spark.operators.skew import salted_count
from deepie_spark.plans.pipeline import KgPipeline
from deepie_spark.sources.synth import corpus_dataframes


def test_resume_after_partial_crash(spark, extractor, tmp_path):
    """Simulate a job killed after the tokens stage: a fresh pipeline
    with the same run_id must skip the committed stages and produce
    exactly the triples of an uninterrupted run."""
    pages_df, _, alias_df = corpus_dataframes(spark, 80)

    # uninterrupted reference run
    ref = KgPipeline(spark, str(tmp_path / "ref"), extractor, run_id="r1")
    ref.run(pages_df, alias_df)
    want = {
        r["triple_key"] for r in ref.lake.read("kg_triples").collect()
    }

    # "crashed" run: only texts + tokens committed
    crashed = KgPipeline(spark, str(tmp_path / "lake"), extractor, run_id="r1")
    bc = crashed.extractor_bc
    bucket = F.pmod(F.xxhash64("url"), F.lit(32)).cast("int")
    texts = ex_ops.stage_texts(pages_df).withColumn("url_bucket", bucket)
    crashed.lake.write_stage(texts, "texts", run_id="r1")
    tokens = ex_ops.stage_tokens(crashed.lake.read("texts"), bc)
    crashed.lake.write_stage(tokens, "tokens", run_id="r1")

    # resume with a NEW pipeline object (fresh process semantics)
    resumed = KgPipeline(spark, str(tmp_path / "lake"), extractor, run_id="r1")
    res = resumed.run(pages_df, alias_df, resume=True)
    assert "texts" in res.stages_skipped and "tokens" in res.stages_skipped
    assert "triples" in res.stages_run

    got = {r["triple_key"] for r in resumed.lake.read("kg_triples").collect()}
    assert got == want

    # lineage recorded per-partition rows for every committed stage
    parts = resumed.lake.lineage_parts()
    stages = {r["stage"] for r in parts.select("stage").distinct().collect()}
    assert {"texts", "tokens", "triples"} <= stages


def test_hub_entity_salted_counts_equal_plain(spark, extractor, world):
    """The hub-heavy corpus: salted two-phase counts over extracted
    subjects == plain groupBy counts (output equality under skew
    handling)."""
    pages_df, _, _ = corpus_dataframes(spark, 150)
    bc = spark.sparkContext.broadcast(extractor)
    triples = ex_ops.extract_triples_fused(pages_df, bc).cache()
    plain = {
        (r["subject"],): r["count"]
        for r in triples.groupBy("subject").count().collect()
    }
    salted = {
        (r["subject"],): r["count"]
        for r in salted_count(triples, ["subject"], n_salts=16).collect()
    }
    assert salted == plain
    # hubs really are hubs: the top subject appears far more than median
    counts = sorted(plain.values())
    assert counts[-1] >= 5
