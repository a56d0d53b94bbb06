"""Linear-chain CRF decode (Viterbi) in numpy.

The reference's CRF family (layers/decoders/pytorch_crf.py:235-309
Viterbi backtrace; consumed by LSTM-CRF NER models/ner_net/
lstm_crf.py:34-101 and the ETL-STL BIES decoder models/spo_net/
etl_stl.py:63-103) re-expressed as a pure numpy kernel suitable for
Arrow-batched UDFs: emissions come from any scorer, transitions are a
small broadcastable matrix, decode is exact max-sum dynamic
programming.  Fresh implementation of the standard public algorithm.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd


def viterbi_decode(
    emissions: np.ndarray,
    transitions: np.ndarray,
    start_transitions: np.ndarray | None = None,
    end_transitions: np.ndarray | None = None,
) -> list[int]:
    """Most-likely tag sequence.

    emissions: [L, K] scores; transitions: [K, K] (from, to);
    start/end: [K] boundary scores (zeros if None).
    """
    L, K = emissions.shape
    if L == 0:
        return []
    start = np.zeros(K) if start_transitions is None else start_transitions
    end = np.zeros(K) if end_transitions is None else end_transitions

    score = start + emissions[0]
    history: list[np.ndarray] = []
    for t in range(1, L):
        # broadcast: prev score (from) + transition (from, to)
        total = score[:, None] + transitions
        best_prev = total.argmax(axis=0)
        score = total.max(axis=0) + emissions[t]
        history.append(best_prev)
    score = score + end

    last = int(score.argmax())
    path = [last]
    for best_prev in reversed(history):
        last = int(best_prev[last])
        path.append(last)
    path.reverse()
    return path


def crf_decode_udf(transitions: np.ndarray, tags: list[str]):
    """mapInPandas kernel factory: rows with an ``emissions`` column
    (array<array<float>>) -> decoded label arrays."""
    trans = np.asarray(transitions, dtype=np.float64)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            labels = []
            for em in pdf["emissions"]:
                e = np.asarray([list(r) for r in em], dtype=np.float64)
                idx = viterbi_decode(e, trans)
                labels.append([tags[i] for i in idx])
            out = pdf.drop(columns=["emissions"]).copy()
            out["labels"] = labels
            yield out

    return kernel


def viterbi_decode_batch(
    emissions: np.ndarray,
    transitions: np.ndarray,
    start_transitions: np.ndarray | None = None,
    end_transitions: np.ndarray | None = None,
) -> np.ndarray:
    """Batched Viterbi: [S, L, K] emissions, shared [K, K] transitions
    -> [S, L] tag ids.  Bit-identical to running :func:`viterbi_decode`
    per sequence (same argmax tie-breaking: lowest index wins), but the
    K x K DP step is shared across the whole batch in one numpy op —
    the per-subject decode of a page becomes one pass (ETL-STL pages
    routinely carry several subjects; S independent python Viterbis
    were the per-page CPU hotspot)."""
    emissions = np.asarray(emissions, dtype=np.float64)
    S, L, K = emissions.shape
    if L == 0 or S == 0:
        return np.zeros((S, 0), dtype=np.int64)
    start = np.zeros(K) if start_transitions is None else start_transitions
    end = np.zeros(K) if end_transitions is None else end_transitions

    score = start[None, :] + emissions[:, 0, :]  # [S, K]
    history = np.empty((S, max(L - 1, 0), K), dtype=np.int64)
    for t in range(1, L):
        total = score[:, :, None] + transitions[None, :, :]  # [S, from, to]
        best_prev = total.argmax(axis=1)  # [S, K]
        history[:, t - 1, :] = best_prev
        score = np.take_along_axis(
            total, best_prev[:, None, :], axis=1
        )[:, 0, :] + emissions[:, t, :]
    score = score + end[None, :]

    rows = np.arange(S)
    last = score.argmax(axis=1)  # [S]
    path = np.empty((S, L), dtype=np.int64)
    path[:, L - 1] = last
    for t in range(L - 2, -1, -1):
        last = history[rows, t, last]
        path[:, t] = last
    return path
