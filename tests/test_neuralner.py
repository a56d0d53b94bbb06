"""TENER-style NER: relative-position attention + emission head + CRF.

Covers the reference's encoder-zoo NER rows (tener.py:9-80,
relative_transformer.py:7-161, bert_finetune_ner.py:9-54) as
real-computation analogues with seeded weights: the forward pass, the
structural-CRF validity guarantee, and the distributed-vs-twin parity.
"""

import numpy as np
import pytest

from deepie_spark.functions.encoder import (
    RelativeAttentionEncoder,
    TinyTransformerEncoder,
    sinusoid_rel_embeddings,
)
from deepie_spark.operators.neuralner import (
    NER_TAGS,
    NeuralNerModel,
    bio_transition_mask,
    neural_ner_tags,
)


@pytest.fixture(scope="module")
def model():
    return NeuralNerModel()


def test_relative_encoder_is_offset_blind(model):
    """No absolute-position term: the encoder consumes ONLY the token
    sequence, so identical sequences produce identical states (the
    vanilla encoder differs — it adds position embeddings)."""
    enc = model.encoder
    a = enc.forward(["x", "y", "z"])
    b = enc.forward(["x", "y", "z"])
    assert np.array_equal(a, b)
    # the relative term is load-bearing: zeroing u/v changes outputs
    import pickle

    enc2 = pickle.loads(pickle.dumps(enc))
    for lay in enc2.layers:
        lay["u"][:] = 0
        lay["v"][:] = 0
    assert not np.array_equal(a, enc2.forward(["x", "y", "z"]))


def test_relative_embeddings_signed_distances():
    r = sinusoid_rel_embeddings(4, 8)
    assert r.shape == (7, 8)
    # t=0 row: sin(0)=0, cos(0)=1 interleaved
    mid = r[3]
    assert np.allclose(mid[0::2], 0.0) and np.allclose(mid[1::2], 1.0)
    # sign-aware: r_{-t} != r_{+t} in the sin dims
    assert not np.allclose(r[0], r[6])


def test_relative_vs_vanilla_attention_differ():
    rel = RelativeAttentionEncoder({}, seed=1)
    van = TinyTransformerEncoder({}, seed=1)
    toks = ["alpha", "beta", "gamma"]
    assert not np.allclose(rel.forward(toks), van.forward(toks))


def test_crf_mask_makes_every_sequence_valid(model):
    """The structural transition mask means Viterbi can only emit
    well-formed BIO: I-x strictly after B-x/I-x of the same type, never
    sequence-initial."""
    mask = bio_transition_mask(NER_TAGS)
    o, bent, ient, bnum, inum = range(5)
    assert mask[o, ient] < -1000 and mask[bnum, ient] < -1000
    assert mask[bent, ient] == 0 and mask[ient, ient] == 0

    import random

    rng = random.Random(9)
    words = ["alpha", "beta", "42", "x9", "the", "spark", "query", "of"]
    non_o = 0
    for _ in range(150):
        toks = [rng.choice(words) for _ in range(rng.randint(0, 25))]
        tags = model.tag_tokens_py(toks)
        assert len(tags) == len(toks)
        prev = "O"
        for t in tags:
            if t.startswith("I-"):
                assert prev in (f"B-{t[2:]}", f"I-{t[2:]}"), (toks, tags)
            prev = t
        non_o += sum(t != "O" for t in tags)
    assert non_o > 100  # the head actually predicts entities, not all-O


def test_over_length_docs_window_not_crash(model):
    """Docs longer than the context window process as independent
    windows: one tag per token, window 1 identical to a standalone
    window-sized doc (the old code CRASHED past max_len on a shape
    mismatch)."""
    W = model.encoder.max_len
    toks = [f"w{i % 50}" for i in range(3 * W + 17)]
    tags = model.tag_tokens_py(toks)
    assert len(tags) == len(toks)  # one tag per token, no crash
    assert tags == model.tag_tokens_py(toks)  # deterministic
    # encoder states of window 1 equal a standalone window-sized doc
    # (Viterbi is global, so TAGS may differ near the boundary — the
    # windowing contract is about the encoder)
    import numpy as np

    assert np.array_equal(
        model.encoder.forward(toks)[:W], model.encoder.forward(toks[:W])
    )


def test_distributed_matches_python_twin(spark, model):
    rows = [
        (1, "alpha beta 42 gamma"),
        (2, ""),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "x9 x9 x9 spark query of the 42"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    bc = spark.sparkContext.broadcast(model)
    got = {r["doc_id"]: r for r in neural_ner_tags(df, bc).collect()}
    for rid, text in rows:
        nt, md, ns = model.doc_py(text)
        r = got[rid]
        assert (r["n_tokens"], r["tags_md5"], r["n_spans"]) == (nt, md, ns)


def test_batch_size_invariance(spark, model):
    rows = [(i, f"alpha {i} beta gamma x{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    bc = spark.sparkContext.broadcast(model)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    outs = []
    for n in ("1", "512"):
        spark.conf.set(key, n)
        outs.append(
            {r["doc_id"]: r["tags_md5"] for r in neural_ner_tags(df, bc).collect()}
        )
    spark.conf.unset(key)
    assert outs[0] == outs[1]
