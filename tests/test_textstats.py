import pytest
from pyspark.sql import functions as F

from deepie_spark.operators import textstats as TS

ROWS = [
    (0, "the quick fox was seen by the river and the hill"),
    (1, "le chat et les oiseaux de la ville"),
    (2, "el perro y los gatos de las casas"),
    (3, "der hund und die katze ist hier"),
    (4, "这是一个中文句子"),
    (5, "qqq www zzz"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id bigint, text string").cache()


def test_lang_id(docs):
    got = {r["doc_id"]: r["lang_pred"] for r in TS.lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "fr"
    assert got[2] == "es"
    assert got[3] == "de"
    assert got[4] == "zh"
    assert got[5] == "unknown"


def test_lang_id_on_real_documents(spark):
    # the testdata lang column is synthetic noise (all docs share one
    # English-ish vocabulary), so only structure is checked here: every
    # doc classifies, and the dominant prediction is 'en'
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = TS.lang_id(real)
    assert out.filter(F.col("lang_pred").isNull()).count() == 0
    top = out.groupBy("lang_pred").count().orderBy(F.desc("count")).first()
    assert top["lang_pred"] == "en"


def test_token_counts(docs):
    got = {r["doc_id"]: r for r in TS.token_counts(docs).collect()}
    assert got[0]["ws_tokens"] == len(ROWS[0][1].split(" "))
    assert got[0]["re_tokens"] == 11
    assert got[0]["n_chars"] == len(ROWS[0][1])
    assert got[6]["n_chars"] == 0


def test_quality_score_ranges(docs):
    for r in TS.quality_score(docs).collect():
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0


def test_quality_orders_sensibly(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat was on the mat and the dog was by the door near the " * 8),
            (1, "!!! ??? *** ###"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["quality"] for r in TS.quality_score(df).collect()}
    assert got[0] > got[1]


def test_doc_fingerprint_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [(0, "abcdefghij"), (1, "abcdefghij"), (2, "totally other content")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in TS.doc_fingerprint(df).collect()}
    assert got[0] == got[1]
    assert got[0] != got[2]
