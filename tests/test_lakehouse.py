import pytest
from pyspark.sql import functions as F

from deepie_spark.sources.lakehouse import Lakehouse


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(tmp_path / "lake", spark)


def test_write_read_roundtrip_and_lineage(spark, lake):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    v = lake.write_stage(df, "t1", run_id="r1")
    assert v == 1
    assert lake.read("t1").count() == 100
    lin = lake.lineage().filter("stage = 't1'").first()
    assert lin["output_rows"] == 100 and lin["run_id"] == "r1"
    parts = lake.lineage_parts().filter("stage = 't1'")
    assert parts.agg(F.sum("rows")).first()[0] == 100


def test_versioning_atomic_pointer(spark, lake):
    lake.write_stage(spark.range(10), "t2")
    lake.write_stage(spark.range(20), "t2")
    assert lake.current_version("t2") == 2
    assert lake.read("t2").count() == 20


def test_stage_done_resume_check(spark, lake):
    assert not lake.stage_done("t3", "r1")
    lake.write_stage(spark.range(5), "t3", run_id="r1")
    assert lake.stage_done("t3", "r1")


def test_merge_upsert_semantics(spark, lake):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k bigint, v string"
    )
    lake.merge_upsert(base, "m1", ["k"])
    upd = spark.createDataFrame(
        [(2, "B"), (3, "c")], "k bigint, v string"
    )
    lake.merge_upsert(upd, "m1", ["k"])
    got = {(r["k"], r["v"]) for r in lake.read("m1").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_merge_is_idempotent(spark, lake):
    upd = spark.createDataFrame([(1, "a")], "k bigint, v string")
    lake.merge_upsert(upd, "m2", ["k"])
    lake.merge_upsert(upd, "m2", ["k"])
    assert lake.read("m2").count() == 1
