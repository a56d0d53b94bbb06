"""Sparse decode twins == dense decode over the grids, exactly.

The optimization round replaced the hot decode path's dense
[L,2]/[L,P,2] zeros + np.where round-trip with sparse support lists
(operators/decode.py::decode_subjects_sparse / decode_po_sparse,
scoring.py::subject_support / po_support).  These tests pin:

  1. the decode twins agree with the dense decoders for ARBITRARY
     support values — including values below/straddling the thresholds,
     which the gate-margin property never produces (this is the
     round-5 verdict's "prove decode correctness without the
     gate-margin crutch" concern applied to the sparse rewrite);
  2. the model support lists are exactly the dense grids' nonzero
     support (positions and float32-cast values) on real corpus pages,
     for both the constant-PROB and the neural scorer;
  3. end-to-end: the sparse-path page decode equals a dense-path
     reimplementation on every corpus page.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from deepie_spark.config.schema import SYNTH_SCHEMA
from deepie_spark.functions.scoring import NeuralTriggerModel, TriggerModel
from deepie_spark.operators.assemble import assemble_triples
from deepie_spark.operators.decode import (
    decode_po,
    decode_po_sparse,
    decode_subjects,
    decode_subjects_sparse,
)
from deepie_spark.operators.extract import PageExtractor
from deepie_spark.sources.synth import gen_corpus, gen_world


@pytest.fixture(scope="module")
def extractors():
    world = gen_world()
    neural = PageExtractor(SYNTH_SCHEMA, world.alias_rows)
    plain = PageExtractor(SYNTH_SCHEMA, world.alias_rows, with_encoder=False)
    return neural, plain


@pytest.fixture(scope="module")
def corpus_texts():
    pages, _, _ = gen_corpus(300)
    return [p["text"] for p in pages]


def test_decode_subjects_sparse_fuzz():
    rng = random.Random(20260822)
    # values deliberately straddle the 0.6/0.5 thresholds, including
    # exact-threshold and float32-rounding-adjacent values
    value_pool = [
        0.0, 0.1, 0.49, 0.5, 0.5000001, 0.51, 0.59, 0.6, 0.6000001,
        0.61, 0.70001, 0.8, 0.9499999881, 0.95, 1.0,
        float(np.float32(0.6)), float(np.float32(0.5)),
    ]
    for _ in range(3000):
        n = rng.randrange(3, 30)
        n_s = rng.randrange(0, 6)
        n_e = rng.randrange(0, 6)
        s_pos = sorted(rng.sample(range(n), min(n_s, n)))
        e_pos = sorted(rng.sample(range(n), min(n_e, n)))
        s_cands = [(p, float(np.float32(rng.choice(value_pool)))) for p in s_pos]
        e_cands = [(p, float(np.float32(rng.choice(value_pool)))) for p in e_pos]
        grid = np.zeros((n, 2), dtype=np.float32)
        for p, v in s_cands:
            grid[p, 0] = v
        for p, v in e_cands:
            grid[p, 1] = v
        assert decode_subjects_sparse(s_cands, e_cands, n) == decode_subjects(
            grid, n
        ), (s_cands, e_cands, n)


def test_decode_po_sparse_fuzz():
    rng = random.Random(20260823)
    value_pool = [
        0.0, 0.2, 0.49, 0.5, 0.51, 0.59, 0.6, 0.61, 0.75, 0.95, 1.0,
        float(np.float32(0.6)), float(np.float32(0.5)),
    ]
    P = 5
    for _ in range(3000):
        n = rng.randrange(3, 25)
        keys = {(rng.randrange(n), rng.randrange(P)) for _ in range(rng.randrange(0, 7))}
        skeys = sorted(rng.sample(sorted(keys), rng.randrange(0, len(keys) + 1)) if keys else [])
        ekeys = sorted(rng.sample(sorted(keys), rng.randrange(0, len(keys) + 1)) if keys else [])
        s_cands = [(p, pid, float(np.float32(rng.choice(value_pool)))) for p, pid in skeys]
        e_cands = [(p, pid, float(np.float32(rng.choice(value_pool)))) for p, pid in ekeys]
        grid = np.zeros((n, P, 2), dtype=np.float32)
        for p, pid, v in s_cands:
            grid[p, pid, 0] = v
        for p, pid, v in e_cands:
            grid[p, pid, 1] = v
        assert decode_po_sparse(s_cands, e_cands, n) == decode_po(grid, n), (
            s_cands, e_cands, n,
        )


def _dense_support_subject(grid: np.ndarray):
    s = np.nonzero(grid[:, 0])[0]
    e = np.nonzero(grid[:, 1])[0]
    return (
        [(int(i), float(grid[i, 0])) for i in s],
        [(int(i), float(grid[i, 1])) for i in e],
    )


def _dense_support_po(grid: np.ndarray):
    s = np.nonzero(grid[:, :, 0])
    e = np.nonzero(grid[:, :, 1])
    return (
        [(int(i), int(p), float(grid[i, p, 0])) for i, p in zip(*s)],
        [(int(i), int(p), float(grid[i, p, 1])) for i, p in zip(*e)],
    )


@pytest.mark.parametrize("which", ["neural", "plain"])
def test_support_equals_dense_grid_on_corpus(extractors, corpus_texts, which):
    ex = extractors[0] if which == "neural" else extractors[1]
    model = ex.model
    assert isinstance(model, NeuralTriggerModel if which == "neural" else TriggerModel)
    checked = 0
    for text in corpus_texts:
        context, tokens, starts, ends = ex.tokenize_page(text)
        scan = model.scan(context, tokens, starts, ends)
        n = len(tokens) + 2
        sub = model.subject_grid(scan, n)
        assert model.subject_support(scan) == _dense_support_subject(sub)
        s_start, s_end = model.subject_support(scan)
        for subject in decode_subjects_sparse(s_start, s_end, n):
            g = model.po_grid(scan, subject, n)
            assert model.po_support(scan, subject) == _dense_support_po(g)
            checked += 1
    assert checked > 50  # the corpus genuinely exercises the po path


def test_page_decode_equals_dense_path(extractors, corpus_texts):
    ex, _ = extractors
    for text in corpus_texts:
        context, tokens, starts, ends = ex.tokenize_page(text)
        scan = ex.model.scan(context, tokens, starts, ends)
        n = len(tokens) + 2
        # dense-path reimplementation (the pre-rewrite _decode_scan)
        sub_grid = ex.model.subject_grid(scan, n)
        spoes = {}
        for subject in decode_subjects(sub_grid, n):
            g = ex.model.po_grid(scan, subject, n)
            spoes.setdefault(subject, []).extend(decode_po(g, n))
        dense = assemble_triples(context, starts, ends, spoes, ex.schema)
        assert ex._decode_scan(context, starts, ends, scan, n) == dense
