"""File-format readers: DuIE JSONL, CoNLL, gazetteer, embedding text.

Spark mappings of the reference's scan operators (SURVEY.md §2.1):

  - DuIE 2.0 JSONL (data_loader_v2.py:176-278): ``spark.read.json``
    with an explicit schema; the nested object dict becomes MapType;
    per-slot predicate labels are resolved relationally.
  - DuIE 1.0 JSONL (etl_span/data_loader.py:97-130): flat s/p/o plus
    the lower+space-strip normalization as column exprs.
  - CoNLL (utils/file_util.py:53-103): blank-line-delimited char/label
    pairs -> window-sum segment ids -> collect_list per sentence.
  - gazetteer file (lexiconAugmentNER/utils/data.py:199-209): one alias
    per line, first whitespace column.
  - word2vec text embeddings (etl_span/data_loader.py:177-184).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DUIE2_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField(
            "spo_list",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("predicate", T.StringType()),
                        T.StructField("subject", T.StringType()),
                        T.StructField("subject_type", T.StringType()),
                        T.StructField(
                            "object", T.MapType(T.StringType(), T.StringType())
                        ),
                        T.StructField(
                            "object_type", T.MapType(T.StringType(), T.StringType())
                        ),
                    ]
                )
            ),
        ),
    ]
)


def read_duie2_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """DuIE 2.0 JSONL -> (doc_id, text, spo_list) with ingest cleaning
    (®◆ strip, data_loader_v2.py:185-186) applied to text."""
    df = spark.read.schema(DUIE2_SCHEMA).json(path)
    return df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.translate("text", "®◆", "").alias("text"),
        "spo_list",
    )


def duie2_gold_triples(docs: DataFrame) -> DataFrame:
    """Explode spo_list into flat gold triple rows (one per spo)."""
    return docs.select(
        "doc_id",
        F.explode("spo_list").alias("spo"),
    ).select(
        "doc_id",
        F.col("spo.subject").alias("subject"),
        F.col("spo.subject_type").alias("subject_type"),
        F.col("spo.predicate").alias("predicate"),
        F.col("spo.object").alias("object"),
        F.col("spo.object_type").alias("object_type"),
    )


def read_duie1_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """DuIE 1.0: flat s/p/o strings; text lowercased and space-stripped
    exactly as etl_span/data_loader.py:106."""
    schema = T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField(
                "spo_list",
                T.ArrayType(T.ArrayType(T.StringType())),
            ),
        ]
    )
    df = spark.read.schema(schema).json(path)
    return df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.translate(F.lower("text"), " ", "").alias("text"),
        "spo_list",
    )


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """CoNLL char/label file -> (sent_id, chars array, labels array).

    Relational segmentation: running sum of blank-line markers over the
    file order gives the sentence id (the gaps-and-islands pattern;
    reference does this with a stateful generator, file_util.py:53-103).

    Scale caveat: the global order window has a single partition — fine
    for dictionary-sized NER files (their natural size); a sharded
    variant would window per file-split."""
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_no"), "value"
    )
    w = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    seg = lines.withColumn(
        "blank", (F.trim("value") == "").cast("int")
    ).withColumn("sent_id", F.sum("blank").over(w))
    toks = seg.where(F.col("blank") == 0).select(
        "sent_id",
        "line_no",
        F.split(F.trim("value"), "\\s+").alias("cols"),
    )
    return (
        toks.groupBy("sent_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("line_no", F.col("cols")[0].alias("ch")))
            ).alias("c"),
            F.sort_array(
                F.collect_list(F.struct("line_no", F.col("cols")[1].alias("lb")))
            ).alias("l"),
        )
        .select(
            "sent_id",
            F.transform("c", lambda x: x["ch"]).alias("chars"),
            F.transform("l", lambda x: x["lb"]).alias("labels"),
        )
    )


def read_gazetteer(spark: SparkSession, path: str) -> DataFrame:
    """Alias file: first whitespace-separated column of each line
    (data.py:199-209)."""
    return (
        spark.read.text(path)
        .where(F.trim("value") != "")
        .select(F.split(F.trim("value"), "\\s+")[0].alias("alias"))
        .distinct()
    )


def read_word2vec_text(spark: SparkSession, path: str, dim: int) -> DataFrame:
    """word2vec text format: 'token v1 v2 ...' -> (token, vector)."""
    raw = spark.read.text(path).where(F.trim("value") != "")
    parts = F.split(F.trim("value"), " ")
    return raw.select(
        parts[0].alias("token"),
        F.slice(parts, 2, dim).cast("array<float>").alias("vector"),
    ).where(F.size(F.slice(parts, 2, dim)) == dim)


def build_vocab(
    docs: DataFrame, text_col: str = "text", min_count: int = 1,
    specials: tuple = ("<PAD>", "<OOV>", "<MASK>"),
    rank_partitions: int | None = None,
) -> DataFrame:
    """Corpus vocabulary with frequency-ranked ids (the reference's
    Counter.most_common build, etl_span/data_loader.py:145-175):
    explode -> count -> two-phase global rank -> ids after specials.

    Two-phase ranking (NO single-partition window — at web scale 10^9
    distinct tokens would otherwise funnel through one task):
      1. range-repartition counts on the sort key (cnt desc, token asc)
         and persist with the materialized partition id — the cache
         pins the range boundaries so both downstream jobs see
         identical bucket assignment;
      2. per-bucket row_number (each window partition == one range
         bucket) + exclusive prefix offsets from a K-row driver-side
         table, broadcast-joined back.
    Ordering is total (token breaks cnt ties), so bucket-major rank +
    offset equals the global row_number exactly."""
    from pyspark import StorageLevel

    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).where(
        F.col("cnt") >= min_count
    )
    spark = docs.sparkSession
    k = rank_partitions or spark.sparkContext.defaultParallelism
    bucketed = (
        counts.repartitionByRange(k, F.desc("cnt"), F.asc("token"))
        .withColumn("_bucket", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # K tiny rows -> exclusive prefix sums on the driver (the same
    # per-partition-counts trick zipWithIndex uses)
    sizes = {
        r["_bucket"]: r["n"]
        for r in bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(sizes):
        offsets.append((b, acc))
        acc += sizes[b]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_bucket int, _off bigint")
    w = Window.partitionBy("_bucket").orderBy(F.desc("cnt"), F.asc("token"))
    ranked = (
        bucketed.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_bucket")
        .withColumn(
            "token_id",
            (F.col("_off") + F.col("_rn") + len(specials) - 1).cast("int"),
        )
    )
    spec = spark.createDataFrame(
        [(s, i, -1) for i, s in enumerate(specials)],
        "token string, token_id int, cnt bigint",
    ).select("token", "cnt", "token_id")
    return spec.unionByName(ranked.select("token", "cnt", "token_id"))
