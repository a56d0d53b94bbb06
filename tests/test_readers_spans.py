import json

import pytest
from pyspark.sql import functions as F

from deepie_spark.operators import spans as SP
from deepie_spark.sources import readers as R


# ---- readers ----------------------------------------------------------------


def test_duie2_jsonl_roundtrip(spark, tmp_path):
    recs = [
        {"text": "甲®公司的创始人是乙", "spo_list": [
            {"predicate": "founder", "subject": "甲公司", "subject_type": "Company",
             "object": {"@value": "乙"}, "object_type": {"@value": "Person"}}]},
        {"text": "no triples here", "spo_list": []},
    ]
    p = tmp_path / "duie.jsonl"
    p.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in recs), encoding="utf-8")
    df = R.read_duie2_jsonl(spark, str(p))
    rows = df.orderBy("doc_id").collect()
    assert rows[0]["text"] == "甲公司的创始人是乙"  # ® stripped
    gold = R.duie2_gold_triples(df).collect()
    assert len(gold) == 1 and gold[0]["object"]["@value"] == "乙"


def test_duie1_normalization(spark, tmp_path):
    p = tmp_path / "duie1.jsonl"
    p.write_text(json.dumps({"text": "A B c", "spo_list": [["a", "p", "b"]]}))
    df = R.read_duie1_jsonl(spark, str(p))
    assert df.first()["text"] == "abc"  # lower + space strip


def test_conll_reader(spark, tmp_path):
    content = "中 B-LOC\n国 E-LOC\n\n人 O\n民 O\n"
    p = tmp_path / "x.conll"
    p.write_text(content, encoding="utf-8")
    rows = {r["sent_id"]: r for r in R.read_conll(spark, str(p)).collect()}
    sents = sorted(rows)
    assert rows[sents[0]]["chars"] == ["中", "国"]
    assert rows[sents[0]]["labels"] == ["B-LOC", "E-LOC"]
    assert rows[sents[1]]["chars"] == ["人", "民"]


def test_gazetteer_reader(spark, tmp_path):
    p = tmp_path / "gaz.txt"
    p.write_text("alpha 3 X\nbeta\n\nalpha 9\n", encoding="utf-8")
    got = {r["alias"] for r in R.read_gazetteer(spark, str(p)).collect()}
    assert got == {"alpha", "beta"}


def test_word2vec_reader(spark, tmp_path):
    p = tmp_path / "emb.txt"
    p.write_text("hello 0.1 0.2 0.3\nworld 1 2 3\nshort 0.5\n")
    rows = {r["token"]: r["vector"] for r in R.read_word2vec_text(spark, str(p), 3).collect()}
    assert set(rows) == {"hello", "world"}  # short row dropped
    assert abs(rows["hello"][1] - 0.2) < 1e-6


def test_build_vocab_rank_order(spark):
    docs = spark.createDataFrame(
        [(0, "a b b c c c")], "doc_id bigint, text string"
    )
    rows = {r["token"]: r["token_id"] for r in R.build_vocab(docs).collect()}
    assert rows["<PAD>"] == 0 and rows["<OOV>"] == 1 and rows["<MASK>"] == 2
    assert rows["c"] == 3 and rows["b"] == 4 and rows["a"] == 5


# ---- spans -------------------------------------------------------------------


def test_bio_spans_py():
    labs = ["O", "B-PER", "I-PER", "O", "B-LOC", "B-PER", "I-LOC"]
    assert SP.bio_spans_py(labs) == [(1, 2, "PER"), (4, 4, "LOC"), (5, 5, "PER")]
    assert SP.bio_spans_py(["B-X", "I-X"]) == [(0, 1, "X")]
    assert SP.bio_spans_py([]) == []


def test_bmes_spans_py():
    labs = ["B-PER", "M-PER", "E-PER", "S-LOC", "B-X", "M-Y", "E-X"]
    assert SP.bmes_spans_py(labs) == [(0, 2, "PER"), (3, 3, "LOC")]


def test_ner_spans_and_f1(spark):
    df = spark.createDataFrame(
        [(0, ["O", "B-PER", "I-PER", "O"]), (1, ["B-LOC", "O"])],
        "sent_id bigint, labels array<string>",
    )
    pred = SP.ner_spans(df)
    gold = spark.createDataFrame(
        [(0, 1, 2, "PER"), (1, 0, 0, "ORG")],
        "sent_id bigint, start int, end int, etype string",
    )
    row = SP.ner_span_f1(pred, gold).first()
    assert row["tp"] == 1 and row["n_pred"] == 2 and row["n_gold"] == 2
    assert abs(row["f1"] - 0.5) < 1e-6


def test_relative_position_features(spark):
    df = spark.createDataFrame([(6, 2, 3)], "n int, s int, e int")
    out = df.select(
        SP.relative_position_features(F.col("n"), F.col("s"), F.col("e")).alias("f")
    ).first()["f"]
    # positions: 0,1 before (d=-2,-1), 2..3 inside (0), 4,5 after (1,2); +31
    assert out == [29, 30, 31, 31, 32, 33]


def test_bichar_features(spark):
    df = spark.createDataFrame([(["a", "b", "c"],)], "chars array<string>")
    out = df.select(SP.bichar_features(F.col("chars")).alias("f")).first()["f"]
    assert out == ["ab", "bc", "c</s>"]


def test_pair_starts_ends_relational_matches_decode(spark):
    import numpy as np

    from deepie_spark.operators.decode import decode_subjects

    pts = [
        (0, 2, "start"), (0, 5, "start"), (0, 3, "end"), (0, 7, "end"),
        (1, 1, "start"), (1, 1, "end"),
    ]
    df = spark.createDataFrame(pts, "seq_id bigint, pos int, kind string")
    got = {(r["seq_id"], r["start"], r["end"])
           for r in SP.pair_starts_ends(df).collect()}
    assert got == {(0, 2, 3), (0, 5, 7), (1, 1, 1)}
    # agreement with the UDF decode on seq 0 (n large enough)
    g = np.zeros((10, 2), dtype=np.float32)
    for (_s, p, k) in pts:
        if _s == 0:
            g[p, 0 if k == "start" else 1] = 0.95
    assert set(decode_subjects(g, 10)) == {(2, 3), (5, 7)}
