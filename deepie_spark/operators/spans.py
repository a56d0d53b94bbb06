"""Window-shaped sequence operators (SURVEY.md §2.6) and NER metrics.

  - BIO / BMES span reconstruction: tag sequence -> entity spans —
    the reference's linear scans (utils/metrics.py:49-86,
    layers/decoders/selection.py:10-49, metric.py get_ner_BMES) as a
    pure function + array column expression;
  - relative-position features (attribute_extraction/
    data_loader.py:141-144: distance to entity clamped ±30, shifted
    +31) as a ``transform(sequence(...))`` column expr;
  - bichar features (baseNER/data_loader.py:79): char bigrams with an
    end-marker tail;
  - relational start/end pairing (the subject pointer pairing of
    multi_pointer_net.py:79-93 expressed as window functions — the
    UDF variant lives in operators/decode.py; this one exists to show
    the pure-SQL plan and for oracle checking);
  - NER span F1 (lexiconAugmentNER/utils/metric.py:12-59).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---- pure-python span reconstruction (kernel + oracle) ---------------------


def bio_spans_py(labels: list[str]) -> list[tuple[int, int, str]]:
    """BIO tags -> [(start, end_inclusive, type)].  A span opens at B-,
    extends through matching I-, closes at anything else (the
    reference's scan, utils/metrics.py:49-86 semantics)."""
    spans = []
    start, etype = None, None
    for i, lab in enumerate(labels):
        if lab.startswith("B-"):
            if start is not None:
                spans.append((start, i - 1, etype))
            start, etype = i, lab[2:]
        elif lab.startswith("I-") and start is not None and lab[2:] == etype:
            continue
        else:
            if start is not None:
                spans.append((start, i - 1, etype))
            start, etype = None, None
    if start is not None:
        spans.append((start, len(labels) - 1, etype))
    return spans


def bmes_spans_py(labels: list[str]) -> list[tuple[int, int, str]]:
    """BMES tags -> spans: B opens, M extends, E closes, S is a
    singleton (metric.py get_ner_BMES semantics)."""
    spans = []
    start, etype = None, None
    for i, lab in enumerate(labels):
        if lab.startswith("S-"):
            if start is not None:
                start, etype = None, None  # unclosed B..M dropped
            spans.append((i, i, lab[2:]))
        elif lab.startswith("B-"):
            start, etype = i, lab[2:]
        elif lab.startswith("M-") and start is not None and lab[2:] == etype:
            continue
        elif lab.startswith("E-") and start is not None and lab[2:] == etype:
            spans.append((start, i, etype))
            start, etype = None, None
        else:
            start, etype = None, None
    return spans


def ner_spans(df: DataFrame, labels_col: str = "labels", scheme: str = "bio") -> DataFrame:
    """(sent_id, labels) -> exploded (sent_id, start, end, etype).

    Arrow-batched ``mapInPandas`` kernel (no row-at-a-time python UDF,
    no separate explode — the kernel emits span rows directly); the
    scan itself is the pure oracle function above, so kernel == oracle
    by construction."""
    fn = bio_spans_py if scheme == "bio" else bmes_spans_py

    def kernel(it):
        import pandas as pd

        cols = ["sent_id", "start", "end", "etype"]
        for pdf in it:
            rows = []
            for sent_id, labels in zip(pdf["sent_id"], pdf[labels_col]):
                for s, e, t in fn(list(labels) if labels is not None else []):
                    rows.append((sent_id, s, e, t))
            yield pd.DataFrame(rows, columns=cols)

    return df.select("sent_id", labels_col).mapInPandas(
        kernel, "sent_id bigint, start int, end int, etype string"
    )


def ner_span_f1(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Span-set micro F1 over (sent_id, start, end, etype)
    (metric.py:12-59): ONE full-outer join + one aggregation (three
    separate count() actions would recompute the join 3x)."""
    keys = ["sent_id", "start", "end", "etype"]
    p = pred.dropDuplicates(keys).withColumn("_p", F.lit(1))
    g = gold.dropDuplicates(keys).withColumn("_g", F.lit(1))
    eps = 1e-10
    agg = p.join(g, keys, "full_outer").agg(
        F.coalesce(F.sum(F.col("_p") * F.col("_g")), F.lit(0)).cast("bigint").alias("tp"),
        F.coalesce(F.sum("_p"), F.lit(0)).cast("bigint").alias("n_pred"),
        F.coalesce(F.sum("_g"), F.lit(0)).cast("bigint").alias("n_gold"),
    )
    return agg.select(
        "tp", "n_pred", "n_gold",
        (F.col("tp") / (F.col("n_pred") + eps)).alias("precision"),
        (F.col("tp") / (F.col("n_gold") + eps)).alias("recall"),
        (2.0 * F.col("tp") / (F.col("n_pred") + F.col("n_gold") + eps)).alias("f1"),
    )


# ---- column-expression feature ops ----------------------------------------


def relative_position_features(
    length_col, ent_start_col, ent_end_col, clamp: int = 30
):
    """Per-position distance to an entity span, clamped to ±clamp and
    shifted +clamp+1 (attribute data_loader.py:141-144 + utils/
    data_util.py:78-84).  Positions inside the span get clamp+1."""
    shift = clamp + 1

    def pos_feature(i):
        d = (
            F.when(i < ent_start_col, i - ent_start_col)
            .when(i > ent_end_col, i - ent_end_col)
            .otherwise(F.lit(0))
        )
        return F.greatest(F.lit(-clamp), F.least(F.lit(clamp), d)) + F.lit(shift)

    return F.transform(
        F.sequence(F.lit(0), length_col - F.lit(1)), pos_feature
    )


def bichar_features(chars_col, end_marker: str = "</s>"):
    """char[i] || char[i+1] bigrams with an end marker tail
    (baseNER/data_loader.py:79; functions.py:43-47)."""
    n = F.size(chars_col)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            F.try_element_at(chars_col, i),
            F.coalesce(F.try_element_at(chars_col, i + 1), F.lit(end_marker)),
        ),
    )


# ---- relational start/end pairing ------------------------------------------


def pair_starts_ends(points: DataFrame) -> DataFrame:
    """Relational version of the pointer pairing: given rows
    (seq_id, pos, kind) with kind in {'start','end'}, pair every start
    with the FIRST end >= start (multi_pointer_net.py:79-93).

    Plan: starts x ends range join within seq_id, row_number window
    keeps the earliest end.  Demonstrates/oracle-checks the decode;
    production keeps the UDF (page-local, no shuffle)."""
    starts = points.where(F.col("kind") == "start").select(
        "seq_id", F.col("pos").alias("start")
    )
    ends = points.where(F.col("kind") == "end").select(
        "seq_id", F.col("pos").alias("end")
    )
    j = starts.join(ends, "seq_id").where(F.col("end") >= F.col("start"))
    w = Window.partitionBy("seq_id", "start").orderBy(F.asc("end"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("seq_id", "start", "end")
    )
