import pytest
from pyspark.sql import functions as F

from deepie_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return MM.synth_media(spark, docs).cache()


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = media.select("meta.mime", "meta.width", "meta.height").first()
    assert meta["mime"] == "application/x-fake" and meta["width"] >= 1


def test_decode_features_deterministic(media):
    f1 = {r["media_id"]: r["feature"] for r in MM.decode_features(media).collect()}
    f2 = {r["media_id"]: r["feature"] for r in MM.decode_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 8 and all(0 <= x < 1 for x in v) for v in f1.values())
    assert all(r["ok"] for r in MM.decode_features(media).collect())


def test_decode_batch_size_invariance(spark, media):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    outs = []
    for n in ("1", "512"):
        spark.conf.set(key, n)
        outs.append(
            {r["media_id"]: r["feature"] for r in MM.decode_features(media).collect()}
        )
    spark.conf.unset(key)
    assert outs[0] == outs[1]


def test_decode_real_path_raises(media):
    with pytest.raises(Exception) as ei:
        MM.decode_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "real media decode" in str(ei.value)


def test_frame_sample_shapes(media):
    frames = MM.frame_sample(media, every_n_bytes=32, max_frames=4)
    agg = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(1 <= r["n"] <= 4 for r in agg)
    one = frames.first()
    assert isinstance(one["frame"], (bytes, bytearray))
