"""The reference user's workflow end-to-end: DuIE-2.0-shaped JSONL in,
extraction, P/R/F1 evaluation out — entirely through this engine's
public API (readers -> fused cascade -> metrics joins).
"""

import json

import pytest
from pyspark.sql import functions as F

from deepie_spark.operators import metrics as M
from deepie_spark.operators.extract import extract_triples_fused
from deepie_spark.sources.readers import duie2_gold_triples, read_duie2_jsonl
from deepie_spark.sources.synth import gen_corpus


@pytest.fixture(scope="module")
def duie_file(tmp_path_factory, world):
    """Write the synthetic corpus as DuIE 2.0 JSONL: one line per doc,
    {"text": ..., "spo_list": [...]} (data_loader_v2.py:183-217 shape)."""
    pages, gold, _ = gen_corpus(150, world=world)
    by_url = {}
    for g in gold:
        by_url.setdefault(g["url"], []).append(
            {
                "subject": g["subject"],
                "subject_type": g["subject_type"],
                "predicate": g["predicate"],
                "object": g["object"],
                "object_type": g["object_type"],
            }
        )
    path = tmp_path_factory.mktemp("duie") / "dev_data.json"
    with open(path, "w", encoding="utf-8") as f:
        for p in pages:
            rec = {"text": p["text"], "spo_list": by_url.get(p["url"], [])}
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    return str(path)


def test_duie_jsonl_to_prf(spark, extractor, duie_file):
    docs = read_duie2_jsonl(spark, duie_file).cache()
    gold = duie2_gold_triples(docs).withColumnRenamed("doc_id", "url")

    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"), F.col("text")
    )
    bc = spark.sparkContext.broadcast(extractor)
    pred = extract_triples_fused(pages, bc)

    gold = gold.withColumn("url", F.col("url").cast("string"))
    prf = M.micro_prf(M.triple_counts(pred, gold)).first()
    assert prf["precision"] >= 0.95 and prf["recall"] >= 0.95, dict(prf.asDict())

    # per-predicate detail table is non-degenerate
    detail = M.per_predicate_prf(pred, gold)
    assert detail.count() >= 5
    assert detail.agg(F.min("f1")).first()[0] >= 0.9


def test_truncation_behavior_matches_oracle(spark, extractor, world):
    """Pages longer than max_seq_length: triples past the token limit
    are not extracted (recall drops), but the distributed result still
    equals the single-row oracle exactly."""
    pages, gold, _ = gen_corpus(40, world=world)
    # build one long page from many sentences
    long_text = " ".join(p["text"] for p in pages[:25])
    df = spark.createDataFrame([("long1", long_text)], "url string, text string")
    bc = spark.sparkContext.broadcast(extractor)
    got = {
        (r["subject"], r["predicate"], tuple(sorted(r["object"].items())))
        for r in extract_triples_fused(df, bc).collect()
    }
    want = {
        (t["subject"], t["predicate"], tuple(sorted(t["object"].items())))
        for t in extractor.extract_page_py(long_text)
    }
    assert got == want
    # the token budget (256) cuts the tail: fewer triples than the
    # 25 pages carried in total
    total_gold = sum(
        1 for p in pages[:25] for g in gold if g["url"] == p["url"]
    )
    assert 0 < len(want) < total_gold
