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


def test_merge_upsert_bucketed_prunes_rewrite(spark, lake):
    """Bucket-pruned MERGE: only touched key-buckets are rewritten;
    untouched buckets' parquet files are HARDLINKED (same inode) into
    the new version — the Iceberg manifest-reuse analogue."""
    import os

    base = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    v1 = lake.merge_upsert_bucketed(base, "kg", ["k"], n_buckets=16)
    assert v1 == 1

    upd = spark.createDataFrame(
        [(5, 999), (2005, 42)], "k bigint, v bigint"
    )  # one update + one insert, landing in 1-2 buckets
    v2 = lake.merge_upsert_bucketed(upd, "kg", ["k"], n_buckets=16)
    assert v2 == 2

    got = {r["k"]: r["v"] for r in lake.read("kg").collect()}
    assert got[5] == 999 and got[2005] == 42 and got[6] == 60
    assert len(got) == 2001

    # physical pruning: untouched bucket files share inodes with v1
    d1 = lake._data_path("kg", 1)
    d2 = lake._data_path("kg", 2)
    from deepie_spark.sources.lakehouse import Lakehouse as LH
    touched = {
        r["b"] for r in upd.select(
            LH._key_bucket(["k"], 16).alias("b")
        ).distinct().collect()
    }
    linked = rewritten = 0
    for bdir in d2.glob("_kb=*"):
        b = int(bdir.name.split("=")[1])
        old = d1 / bdir.name
        inodes_old = {f.stat().st_ino for f in old.iterdir()} if old.exists() else set()
        inodes_new = {f.stat().st_ino for f in bdir.iterdir() if f.is_file()}
        if b in touched:
            assert not (inodes_new & inodes_old)  # actually rewritten
            rewritten += 1
        else:
            assert inodes_new == inodes_old  # hardlinked, zero copy
            linked += 1
    assert rewritten == len(touched) and linked >= 14

    # merge lineage row records the pruned write
    lin = lake.lineage().filter("stage = 'kg' and version = 2").first()
    assert lin["n_partitions"] == len(touched)
