from pyspark.sql import functions as F

from deepie_spark.operators.skew import salted_count, salted_join, two_phase_agg


def _skewed(spark):
    hot = spark.range(5000).select(F.lit("hub").alias("k"), F.col("id").alias("v"))
    cold = spark.range(200).select(
        F.concat(F.lit("k"), F.col("id") % 20).alias("k"), F.col("id").alias("v")
    )
    return hot.union(cold)


def test_salted_count_equals_plain(spark):
    df = _skewed(spark)
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_count(df, ["k"]).collect()}
    assert salted == plain


def test_two_phase_agg_sum(spark):
    df = _skewed(spark)
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    got = {
        r["k"]: r["s"]
        for r in two_phase_agg(
            df, ["k"],
            aggs={"ps": F.sum("v")},
            finals={"s": F.sum("ps")},
        ).collect()
    }
    assert got == plain


def test_salted_join_equals_plain(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("hub", "H"), ("k3", "C3"), ("nope", "X")], "k string, label string"
    )
    plain = fact.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(fact, dim, "k").groupBy("k", "label").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
