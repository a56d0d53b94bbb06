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


def _tp_fp_fn(p: DataFrame, g: DataFrame, keys: list[str]) -> DataFrame:
    """One full-outer join + one aggregation -> a single (tp, fp, fn)
    row in ONE Spark job (three separate inner/anti-join ``count()``
    actions would recompute the same join three times — 3x wasted
    passes at 100 TB)."""
    joined = p.withColumn("_p", F.lit(1)).join(
        g.withColumn("_g", F.lit(1)), keys, "full_outer"
    )
    return joined.agg(
        F.coalesce(F.sum(F.col("_p") * F.col("_g")), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(F.when(F.col("_g").isNull(), 1)), F.lit(0)).alias("fp"),
        F.coalesce(F.sum(F.when(F.col("_p").isNull(), 1)), F.lit(0)).alias("fn"),
    ).select(
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
    )


def triple_counts(
    pred_df: DataFrame, gold_df: DataFrame, normalized: bool = False,
    extractor_bc=None,
) -> DataFrame:
    """One row: tp, fp, fn (single job, see ``_tp_fp_fn``)."""
    p = _keyed(pred_df, normalized, extractor_bc)
    g = _keyed(gold_df, normalized, extractor_bc)
    keys = ["url", "k_subject", "k_predicate", "k_object"]
    return _tp_fp_fn(p, g, keys)


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
    metric, attribute train.py:185-233).

    ONE full-outer join + ONE grouped aggregation (the ``_tp_fp_fn``
    pattern) — the previous inner + two anti-join shape recomputed the
    same pred-vs-gold join three times, three full shuffles at 100 TB.
    """
    keys = ["url", "k_subject", "k_predicate", "k_object"]
    p = _keyed(pred_df, normalized=False)
    g = _keyed(gold_df, normalized=False)
    joined = p.withColumn("_p", F.lit(1)).join(
        g.withColumn("_g", F.lit(1)), keys, "full_outer"
    )
    eps = 1e-10
    out = joined.groupBy("k_predicate").agg(
        F.coalesce(F.sum(F.col("_p") * F.col("_g")), F.lit(0))
        .cast("bigint").alias("tp"),
        F.coalesce(F.sum(F.when(F.col("_g").isNull(), 1)), F.lit(0))
        .cast("bigint").alias("fp"),
        F.coalesce(F.sum(F.when(F.col("_p").isNull(), 1)), F.lit(0))
        .cast("bigint").alias("fn"),
    )
    return out.select(
        F.col("k_predicate").alias("predicate"),
        "tp", "fp", "fn",
        (F.col("tp") / (F.col("tp") + F.col("fp") + eps)).alias("precision"),
        (F.col("tp") / (F.col("tp") + F.col("fn") + eps)).alias("recall"),
        (2.0 * F.col("tp") / (2.0 * F.col("tp") + F.col("fp") + F.col("fn") + eps)).alias("f1"),
    ).orderBy("predicate")


def entity_prf(pred_df: DataFrame, gold_df: DataFrame) -> DataFrame:
    """Subject-entity EM/P/R (train.py:229-248 analogue; single job)."""
    p = pred_df.select("url", "subject").dropDuplicates()
    g = gold_df.select("url", "subject").dropDuplicates()
    return micro_prf(_tp_fp_fn(p, g, ["url", "subject"]))


def badcases(pred_df: DataFrame, gold_df: DataFrame) -> DataFrame:
    """Mismatch report (attribute train.py:236-269 badcase sink):
    false positives and false negatives, labeled.  Single full-outer
    join instead of two anti-joins (one shuffle, not two)."""
    keys = ["url", "k_subject", "k_predicate", "k_object"]
    p = _keyed(pred_df, normalized=False)
    g = _keyed(gold_df, normalized=False)
    joined = p.withColumn("_p", F.lit(1)).join(
        g.withColumn("_g", F.lit(1)), keys, "full_outer"
    )
    return joined.filter(F.col("_p").isNull() | F.col("_g").isNull()).select(
        *keys,
        F.when(F.col("_g").isNull(), F.lit("fp")).otherwise(F.lit("fn")).alias("kind"),
    )
