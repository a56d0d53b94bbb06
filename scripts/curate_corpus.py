"""spark-submit entrypoint for training-data corpus curation.

The standard pre-training data pipeline over a documents table
(doc_id, text, ...): language filter -> quality filter -> near-dup
dedup -> curated parquet + a one-line JSON report of what each stage
dropped.

    python scripts/build_dist.py              # -> dist/deepie_spark.zip
    spark-submit --py-files dist/deepie_spark.zip \\
        scripts/curate_corpus.py \\
        --input /data/documents_parquet --output /data/curated \\
        [--langs en,zh] [--min-quality 0.3] \\
        [--dedup cluster|exact|none] [--verify-threshold 0.8]

Every stage is one of the library's oracle-checked operators
(textstats.lang_id / quality_score, dedup.exact_dedup /
dedup_clusters); the CLI only wires them together.  Per-stage drop
counts come from ONE aggregation over the fully-joined frame, not a
count() per stage.
"""

from __future__ import annotations

import argparse
import json
import sys


def curate(spark, args) -> dict:
    from pyspark.sql import functions as F

    from deepie_spark.operators.dedup import dedup_clusters, exact_dedup
    from deepie_spark.operators.textstats import lang_id, quality_score

    docs = spark.read.parquet(args.input)
    id_col, text_col = args.id_col, args.text_col

    reserved = {"_curate_lang", "_curate_quality", "_curate_keep",
                "_lang_ok", "_quality_ok", "_dedup_ok", "_keep"}
    if bad := reserved & set(docs.columns):
        raise ValueError(
            f"input columns {sorted(bad)} collide with curate's reserved "
            f"working names; rename them before curation"
        )

    keep = F.lit(True)
    flags = []
    frame = docs
    # operator outputs are aliased to reserved _-prefixed names BEFORE
    # joining: a documents table that already carries a column named
    # lang_pred / quality / keep would otherwise make the join emit a
    # duplicate column and F.col(...) below raise an ambiguous-reference
    # AnalysisException (or silently read the wrong side)
    if args.langs:
        langs = [x.strip() for x in args.langs.split(",") if x.strip()]
        lp = lang_id(docs, text_col, id_col).select(
            id_col, F.col("lang_pred").alias("_curate_lang")
        )
        frame = frame.join(lp, id_col)
        flags.append(F.col("_curate_lang").isin(langs).alias("_lang_ok"))
    if args.min_quality > 0:
        q = quality_score(docs, text_col, id_col).select(
            id_col, F.col("quality").alias("_curate_quality")
        )
        frame = frame.join(q, id_col)
        flags.append(
            (F.col("_curate_quality") >= args.min_quality).alias("_quality_ok")
        )
    if args.dedup == "exact":
        d = exact_dedup(docs, text_col, id_col).select(
            id_col, F.col("keep").alias("_curate_keep")
        )
        frame = frame.join(d, id_col)
        flags.append(F.col("_curate_keep").alias("_dedup_ok"))
    elif args.dedup == "cluster":
        d = dedup_clusters(
            docs, text_col=text_col, id_col=id_col,
            verify_threshold=args.verify_threshold,
        ).select(id_col, F.col("keep").alias("_curate_keep"))
        frame = frame.join(d, id_col)
        flags.append(F.col("_curate_keep").alias("_dedup_ok"))

    flagged = frame.select(*docs.columns, *flags)
    flag_names = [f"_{n}" for n in ("lang_ok", "quality_ok", "dedup_ok")
                  if f"_{n}" in flagged.columns]
    for n in flag_names:
        keep = keep & F.col(n)
    flagged = flagged.withColumn("_keep", keep).cache()

    # one aggregation for the whole report (never one count() per stage)
    aggs = [F.count(F.lit(1)).alias("n_in"),
            F.sum(F.col("_keep").cast("long")).alias("n_out")]
    aggs += [
        F.sum((~F.col(n)).cast("long")).alias(f"dropped{n}") for n in flag_names
    ]
    stats = flagged.agg(*aggs).first().asDict()

    flagged.where("_keep").select(*docs.columns).write.mode(
        "overwrite"
    ).parquet(args.output)
    flagged.unpersist()
    return {k: int(v) for k, v in stats.items()}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="curated parquet path")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--langs", default=None,
                   help="comma-separated allowlist (e.g. en,zh); omit to keep all")
    p.add_argument("--min-quality", type=float, default=0.0)
    p.add_argument("--dedup", choices=["cluster", "exact", "none"],
                   default="cluster")
    p.add_argument("--verify-threshold", type=float, default=0.8)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("curate_corpus").getOrCreate()
    report = curate(spark, args)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
