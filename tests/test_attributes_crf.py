import numpy as np
import pytest

from deepie_spark.functions.crf import crf_decode_udf, viterbi_decode
from deepie_spark.operators.attributes import (
    AttributeExtractor,
    extract_attributes,
)
from deepie_spark.sources.synth import gen_attribute_corpus


# ---- CRF / Viterbi -----------------------------------------------------------


def _brute_force(emissions, transitions):
    import itertools

    L, K = emissions.shape
    best, best_s = None, -1e18
    for path in itertools.product(range(K), repeat=L):
        s = emissions[0][path[0]]
        for t in range(1, L):
            s += transitions[path[t - 1]][path[t]] + emissions[t][path[t]]
        if s > best_s:
            best, best_s = list(path), s
    return best


def test_viterbi_matches_brute_force():
    rng = np.random.default_rng(42)
    for _ in range(10):
        L, K = rng.integers(1, 6), rng.integers(2, 4)
        em = rng.normal(size=(L, K))
        tr = rng.normal(size=(K, K))
        assert viterbi_decode(em, tr) == _brute_force(em, tr)


def test_viterbi_boundary_scores():
    em = np.zeros((2, 2))
    tr = np.zeros((2, 2))
    start = np.array([5.0, 0.0])
    end = np.array([0.0, 5.0])
    assert viterbi_decode(em, tr, start, end) == [0, 1]


def test_viterbi_empty():
    assert viterbi_decode(np.zeros((0, 3)), np.zeros((3, 3))) == []


def test_crf_udf(spark):
    tags = ["O", "B", "I"]
    # transitions forbid O->I
    tr = np.zeros((3, 3))
    tr[0, 2] = -100.0
    df = spark.createDataFrame(
        [(0, [[0.0, 2.0, 0.0], [0.0, 0.0, 1.0], [3.0, 0.0, 0.0]])],
        "sent_id bigint, emissions array<array<double>>",
    )
    out = df.mapInPandas(
        crf_decode_udf(tr, tags), "sent_id bigint, labels array<string>"
    ).first()
    assert out["labels"] == ["B", "I", "O"]


# ---- attribute extraction ----------------------------------------------------


@pytest.fixture(scope="module")
def attr_ex():
    return AttributeExtractor()


def test_attribute_oracle_pr(attr_ex):
    recs = gen_attribute_corpus(100)
    tp = fp = fn = 0
    for r in recs:
        gold = {(a["type"], a["value"]) for a in r["attributes"]}
        pred = {
            (a["attr_type"], a["value"]) for a in attr_ex.extract_record_py(r["text"])
        }
        tp += len(gold & pred)
        fp += len(pred - gold)
        fn += len(gold - pred)
    assert tp / (tp + fp) >= 0.95 and tp / (tp + fn) >= 0.95, (tp, fp, fn)


def test_attribute_spans_slice_text(attr_ex):
    recs = gen_attribute_corpus(30)
    for r in recs:
        for a in attr_ex.extract_record_py(r["text"]):
            assert r["text"][a["val_start"]:a["val_end"]] == a["value"]


def test_attribute_decode_same_type_pairing(attr_ex):
    g = np.zeros((10, 3, 2), dtype=np.float32)
    g[2, 1, 0] = 0.9   # start type 1
    g[4, 0, 1] = 0.9   # end of DIFFERENT type — must not pair
    g[6, 1, 1] = 0.9   # correct end
    assert attr_ex.decode(g) == [(2, 6, 1)]


def test_attribute_spark_equals_oracle(spark, attr_ex):
    recs = gen_attribute_corpus(60)
    df = spark.createDataFrame(
        [(r["rec_id"], r["text"]) for r in recs], "rec_id bigint, text string"
    )
    bc = spark.sparkContext.broadcast(attr_ex)
    got = {
        (r["rec_id"], r["attr_type"], r["value"], r["val_start"], r["val_end"])
        for r in extract_attributes(df, bc).collect()
    }
    want = set()
    for r in recs:
        for a in attr_ex.extract_record_py(r["text"]):
            want.add((r["rec_id"], a["attr_type"], a["value"],
                      a["val_start"], a["val_end"]))
    assert got == want and len(got) > 0


def test_viterbi_batch_equals_loop_on_ties():
    from deepie_spark.functions.crf import viterbi_decode_batch

    rng = np.random.default_rng(7)
    for _ in range(30):
        s, l, k = int(rng.integers(1, 6)), int(rng.integers(1, 20)), int(rng.integers(2, 8))
        em = rng.integers(0, 4, size=(s, l, k)).astype(float)  # ties likely
        tr = rng.integers(0, 3, size=(k, k)).astype(float)
        st = rng.integers(0, 3, size=k).astype(float)
        en = rng.integers(0, 3, size=k).astype(float)
        batch = viterbi_decode_batch(em, tr, st, en)
        for i in range(s):
            assert list(batch[i]) == viterbi_decode(em[i], tr, st, en)


def test_viterbi_batch_empty():
    from deepie_spark.functions.crf import viterbi_decode_batch

    assert viterbi_decode_batch(
        np.zeros((0, 5, 3)), np.zeros((3, 3))
    ).shape == (0, 0)
    assert viterbi_decode_batch(
        np.zeros((2, 0, 3)), np.zeros((3, 3))
    ).shape == (2, 0)
