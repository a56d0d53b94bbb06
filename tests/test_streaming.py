import time

import pytest
from pyspark.sql import functions as F

from deepie_spark.sources.lakehouse import Lakehouse
from deepie_spark.sources.synth import corpus_dataframes
from deepie_spark.streaming.ingest import stream_pages_to_kg, windowed_event_counts


def test_stream_pages_to_kg(spark, extractor, tmp_path):
    pages_df, gold_df, _ = corpus_dataframes(spark, 60)
    src = tmp_path / "pages_src"
    pages_df.write.parquet(str(src))

    stream = spark.readStream.schema(pages_df.schema).parquet(str(src))
    bc = spark.sparkContext.broadcast(extractor)
    q = stream_pages_to_kg(
        spark, stream, bc, str(tmp_path / "lake"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    lake = Lakehouse(tmp_path / "lake", spark)
    kg = lake.read("kg_triples")
    n = kg.count()
    assert n > 0
    # restart the stream over the same source: checkpoint + MERGE keep
    # it idempotent
    stream2 = spark.readStream.schema(pages_df.schema).parquet(str(src))
    q2 = stream_pages_to_kg(
        spark, stream2, bc, str(tmp_path / "lake"), str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert lake.read("kg_triples").count() == n
    # the streaming MERGE is the bucket-pruned one: layout recorded,
    # internal _kb hidden from readers
    assert (lake.layout("kg_triples") or {}).get("bucketed") is True
    assert "_kb" not in lake.read("kg_triples").columns


def test_windowed_event_counts_batch_semantics(spark):
    # windowed agg checked on the batch equivalent (same expression
    # tree works in streaming; watermark only drops late rows)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = out.agg(F.sum("n")).first()[0]
    assert total == events.count()


def test_stateful_user_progress(spark, tmp_path):
    from deepie_spark.streaming.ingest import stateful_user_progress

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = tmp_path / "ev_state"
    events.write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    out = stateful_user_progress(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("userprog")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            "select user_id, max(n_events) n_events, max(total_value) total_value "
            "from userprog group by user_id"
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_windowed_event_counts_streaming(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = tmp_path / "ev"
    events.limit(500).write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    agg = windowed_event_counts(stream, "1 hour", "2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("evcounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select sum(n) from evcounts").first()[0]
    assert got == 500
