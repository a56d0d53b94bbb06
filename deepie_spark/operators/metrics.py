"""Evaluation metrics as DataFrame joins + aggregations.

Reproduces the reference's scoring semantics relationally:

  - exact triple match: (subject, predicate, object-dict) equality
    (train.py:398-431 ``calculate_metric``) -> inner/anti joins;
  - set-dedup before scoring (train.py:231-233 builds sets) ->
    ``dropDuplicates``;
  - micro P/R/F1 formulas p=tp/(tp+fp), r=tp/(tp+fn), f=2pr/(p+r)
    (train.py:241-243);
  - Bao-style X/Y/Z F1 with 1e-10 smoothing (etl_span/train.py:239-266);
  - per-predicate detail table (attribute train.py:185-233 shape);
  - tokenizer-normalized match (etl_span/train.py:21-38 ``SPO``):
    surfaces compared after the shared normalizer.

MapType columns are not join keys in Spark, so object dicts are
canonicalized to a sorted-entry JSON string first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def obj_key(col) -> F.Column:
    """Order-insensitive canonical string for a MAP column (sorted by
    key, so two equal dicts always compare equal)."""
    return F.to_json(F.array_sort(F.map_entries(col)))


def _keyed(df: DataFrame, normalized: bool, extractor_bc=None) -> DataFrame:
    sub = F.col("subject")
    obj = obj_key(F.col("object"))
    if normalized:
        from deepie_spark.operators.linking import norm_key_udf

        norm = norm_key_udf(extractor_bc)
        sub = norm("subject")
        obj = norm(F.col("object")["@value"])
    return df.select(
        "url",
        sub.alias("k_subject"),
        F.col("predicate").alias("k_predicate"),
        obj.alias("k_object"),
    ).dropDuplicates(["url", "k_subject", "k_predicate", "k_object"])


def triple_counts(
    pred_df: DataFrame, gold_df: DataFrame, normalized: bool = False,
    extractor_bc=None,
) -> DataFrame:
    """One row: tp, fp, fn."""
    p = _keyed(pred_df, normalized, extractor_bc)
    g = _keyed(gold_df, normalized, extractor_bc)
    keys = ["url", "k_subject", "k_predicate", "k_object"]
    tp = p.join(g, keys, "inner").count()
    fp = p.join(g, keys, "left_anti").count()
    fn = g.join(p, keys, "left_anti").count()
    spark = pred_df.sparkSession
    return spark.createDataFrame(
        [(tp, fp, fn)], "tp bigint, fp bigint, fn bigint"
    )


def micro_prf(counts_df: DataFrame) -> DataFrame:
    """tp/fp/fn -> (precision, recall, f1) with the reference's formulas
    (train.py:241-243; 1e-10 smoothing per etl_span/train.py:264-266)."""
    eps = 1e-10
    return counts_df.select(
        (F.col("tp") / (F.col("tp") + F.col("fp") + eps)).alias("precision"),
        (F.col("tp") / (F.col("tp") + F.col("fn") + eps)).alias("recall"),
        (
            2.0 * F.col("tp") / (2.0 * F.col("tp") + F.col("fp") + F.col("fn") + eps)
        ).alias("f1"),
    )


def per_predicate_prf(pred_df: DataFrame, gold_df: DataFrame) -> DataFrame:
    """Per-predicate tp/fp/fn + P/R/F1 (the reference's only grouped
    metric, attribute train.py:185-233)."""
    keys = ["url", "k_subject", "k_predicate", "k_object"]
    p = _keyed(pred_df, normalized=False)
    g = _keyed(gold_df, normalized=False)
    tp = p.join(g, keys, "inner").groupBy("k_predicate").agg(
        F.count(F.lit(1)).alias("tp")
    )
    fp = p.join(g, keys, "left_anti").groupBy("k_predicate").agg(
        F.count(F.lit(1)).alias("fp")
    )
    fn = g.join(p, keys, "left_anti").groupBy("k_predicate").agg(
        F.count(F.lit(1)).alias("fn")
    )
    eps = 1e-10
    out = (
        tp.join(fp, "k_predicate", "full")
        .join(fn, "k_predicate", "full")
        .na.fill(0, ["tp", "fp", "fn"])
    )
    return out.select(
        F.col("k_predicate").alias("predicate"),
        "tp", "fp", "fn",
        (F.col("tp") / (F.col("tp") + F.col("fp") + eps)).alias("precision"),
        (F.col("tp") / (F.col("tp") + F.col("fn") + eps)).alias("recall"),
        (2.0 * F.col("tp") / (2.0 * F.col("tp") + F.col("fp") + F.col("fn") + eps)).alias("f1"),
    ).orderBy("predicate")


def entity_prf(pred_df: DataFrame, gold_df: DataFrame) -> DataFrame:
    """Subject-entity EM/P/R (train.py:229-248 analogue)."""
    p = pred_df.select("url", "subject").dropDuplicates()
    g = gold_df.select("url", "subject").dropDuplicates()
    tp = p.join(g, ["url", "subject"], "inner").count()
    fp = p.join(g, ["url", "subject"], "left_anti").count()
    fn = g.join(p, ["url", "subject"], "left_anti").count()
    spark = pred_df.sparkSession
    return micro_prf(
        spark.createDataFrame([(tp, fp, fn)], "tp bigint, fp bigint, fn bigint")
    )


def badcases(pred_df: DataFrame, gold_df: DataFrame) -> DataFrame:
    """Mismatch report (attribute train.py:236-269 badcase sink):
    false positives and false negatives, labeled."""
    keys = ["url", "k_subject", "k_predicate", "k_object"]
    p = _keyed(pred_df, normalized=False)
    g = _keyed(gold_df, normalized=False)
    fp = p.join(g, keys, "left_anti").withColumn("kind", F.lit("fp"))
    fn = g.join(p, keys, "left_anti").withColumn("kind", F.lit("fn"))
    return fp.unionByName(fn)
