import numpy as np
import pytest
from pyspark.sql import functions as F

from deepie_spark.functions import codecs
from deepie_spark.operators import multimodal as MM

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).limit(60).cache()


@pytest.fixture(scope="module")
def images(spark, docs):
    return MM.synth_media(spark, docs, kind="image").cache()


@pytest.fixture(scope="module")
def audio(spark, docs):
    return MM.synth_media(spark, docs, kind="audio").cache()


def test_media_schema_and_real_png_payload(images):
    assert dict(images.dtypes)["payload"] == "binary"
    row = images.first()
    assert row["meta"]["mime"] == "image/png"
    px = codecs.decode_png(bytes(row["payload"]))  # REALLY decodable
    assert px.shape == (MM.IMG_H, MM.IMG_W, 3)


def test_real_wav_payload(audio):
    row = audio.first()
    rate, nch, samples = codecs.decode_wav(bytes(row["payload"]))
    assert rate == MM.WAV_RATE and nch == 1 and len(samples) == MM.WAV_SAMPLES


def test_decode_features_match_python_twin(spark, images, docs):
    got = {
        r["media_id"]: r["feature"]
        for r in MM.decode_features(images).collect()
    }
    for d in docs.limit(10).collect():
        px = codecs.decode_png(MM.synth_png_payload(d["text"]))
        want = codecs.image_grid_features(px, grid=4)
        assert np.allclose(got[d["doc_id"]], want, atol=1e-6)
    assert all(len(v) == 16 for v in got.values())


def test_decode_audio_features_real(audio):
    rows = MM.decode_features(audio, dim=8).collect()
    assert all(r["ok"] for r in rows)
    assert all(len(r["feature"]) == 8 for r in rows)
    # a real tone has positive RMS energy in every window
    assert all(all(x > 0 for x in r["feature"]) for r in rows)


def test_decode_batch_size_invariance(spark, images):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    outs = []
    for n in ("1", "512"):
        spark.conf.set(key, n)
        outs.append(
            {r["media_id"]: r["feature"] for r in MM.decode_features(images).collect()}
        )
    spark.conf.unset(key)
    assert outs[0] == outs[1]


def test_opaque_rows_flow_not_crash(spark, docs):
    """Undecodable payloads: ok=False without fake, deterministic fake
    features with fake=True — a media scan never dies on bad rows."""
    opaque = MM.synth_media(spark, docs, kind="opaque")
    rows = MM.decode_features(opaque, fake=False).collect()
    assert rows and all(not r["ok"] and r["feature"] is None for r in rows)
    rows = MM.decode_features(opaque, fake=True, dim=8).collect()
    assert rows and all(r["ok"] and len(r["feature"]) == 8 for r in rows)


def test_corrupt_png_yields_ok_false(spark):
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"\x89PNG\r\n\x1a\ngarbage"),
             ("image/png", 2, 2, 0)),
        ],
        MM.MEDIA_DDL,
    )
    r = MM.decode_features(media).first()
    assert not r["ok"] and r["feature"] is None


def test_truncated_payloads_yield_ok_false(spark, images, audio):
    """Truncated mid-stream payloads raise zlib.error / struct.error /
    wave.Error / EOFError inside the stdlib codecs — all must degrade
    to ok=False rows, never kill the task (ADVICE round 3: only
    ValueError/UnsupportedMediaError/EOFError were handled)."""
    png = bytes(images.first()["payload"])
    wav = bytes(audio.first()["payload"])
    rows = [
        # valid signature+IHDR, IDAT cut mid-zlib-stream
        (1, "image", bytearray(png[: len(png) * 2 // 3]), ("image/png", 2, 2, 0)),
        # WAV header cut short
        (2, "audio", bytearray(wav[:16]), ("audio/wav", 0, 0, 10)),
        # random garbage under each mime
        (3, "image", bytearray(b"\x00" * 40), ("image/png", 2, 2, 0)),
        (4, "audio", bytearray(b"\x00" * 40), ("audio/wav", 0, 0, 10)),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_DDL)
    got = MM.decode_features(media).collect()
    assert len(got) == 4
    assert all(not r["ok"] and r["feature"] is None for r in got)


def test_image_thumbnails_roundtrip(images):
    rows = MM.image_thumbnails(images, 4, 4).collect()
    assert rows
    for r in rows[:5]:
        px = codecs.decode_png(bytes(r["thumb"]))
        assert px.shape == (4, 4, 3)


def test_frame_sample_wav_real_windows(audio):
    frames = MM.frame_sample(audio, max_frames=4)
    agg = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] == 4 for r in agg)
    one = frames.first()
    rate, nch, seg = codecs.decode_wav(bytes(one["frame"]))  # real WAV frame
    assert rate == MM.WAV_RATE and len(seg) == MM.WAV_SAMPLES // 4


def test_frame_sample_opaque_byte_slices(spark, docs):
    opaque = MM.synth_media(spark, docs, kind="opaque")
    frames = MM.frame_sample(opaque, every_n_bytes=32, max_frames=4)
    agg = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(1 <= r["n"] <= 4 for r in agg)
    assert isinstance(frames.first()["frame"], (bytes, bytearray))
