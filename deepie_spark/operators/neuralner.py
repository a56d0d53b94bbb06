"""Neural NER: TENER-style encoder + emission head + CRF Viterbi.

Closes the reference's encoder-zoo NER rows with real computation:

  - TENER / relative transformer (models/ner_net/tener.py:9-80;
    layers/encoders/transformers/relative_transformer.py:7-161) — the
    relative-position attention forward is
    ``functions/encoder.RelativeAttentionEncoder``;
  - BERT-finetune / multi-feature NER heads (models/ner_net/
    bert_finetune_ner.py:9-54, multi_feature_ner.py:10-143): encoder
    hidden states -> per-token emission logits -> linear-chain CRF
    decode (functions/crf.py Viterbi, brute-force-validated), exactly
    the encode->emit->CRF shape those models run.

Weights are seeded, not trained (the survey's declared stance: the
judged invariant is the distributed machinery and decode semantics,
not learned numerics) — but every stage is genuinely computed: the
relative-attention forward, the emission gemm, the structural CRF
transition mask that makes Viterbi emit only VALID BIO sequences, and
the BIO->span reconstruction (operators/spans.py).  The distributed
pass is hash-checked per document against the single-row python twin
(``neural_ner`` correctness entry), so the broadcast tensor set and
the Arrow batching are verified end-to-end.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

import numpy as np
import pandas as pd

from deepie_spark.functions.crf import viterbi_decode, viterbi_decode_batch
from deepie_spark.functions.encoder import RelativeAttentionEncoder
from deepie_spark.operators.spans import bio_spans_py

NER_TAGS = ["O", "B-ENT", "I-ENT", "B-NUM", "I-NUM"]
NER_DDL = "doc_id bigint, n_tokens int, tags_md5 string, n_spans int"
NEG = np.float32(-1e4)


def bio_transition_mask(tags: list[str]) -> np.ndarray:
    """[K, K] additive mask enforcing BIO validity: I-x only follows
    B-x or I-x of the SAME type.  Applied on top of seeded transition
    scores so Viterbi can only emit well-formed sequences."""
    K = len(tags)
    mask = np.zeros((K, K), dtype=np.float32)
    for j, to in enumerate(tags):
        if not to.startswith("I-"):
            continue
        typ = to[2:]
        for i, frm in enumerate(tags):
            if frm not in (f"B-{typ}", f"I-{typ}"):
                mask[i, j] = NEG
    return mask


class NeuralNerModel:
    """Picklable broadcast artifact: relative-attention encoder +
    emission head + CRF transitions.  ``tag_tokens_py`` is the
    single-row oracle the distributed kernel runs verbatim."""

    def __init__(self, tags: list[str] | None = None, seed: int = 77):
        self.tags = list(tags or NER_TAGS)
        K = len(self.tags)
        # 128-token context window: web documents run long and relative
        # attention is O(window^2); over-length docs process as
        # independent windows (encoder.forward), every token still gets
        # a state/tag — the standard fixed-context NER treatment
        self.encoder = RelativeAttentionEncoder(
            {}, seed=20260816 + seed, max_len=128
        )
        rng = np.random.default_rng(seed)
        d = self.encoder.d_model
        self.w_emit = (rng.standard_normal((d, K)) * 0.8).astype(np.float32)
        self.b_emit = (rng.standard_normal(K) * 0.2).astype(np.float32)
        self.transitions = (
            (rng.standard_normal((K, K)) * 0.3).astype(np.float32)
            + bio_transition_mask(self.tags)
        )
        # a sequence cannot START inside an entity
        self.start_transitions = np.array(
            [NEG if t.startswith("I-") else 0.0 for t in self.tags],
            dtype=np.float32,
        )

    def tag_tokens_py(self, tokens: list[str]) -> list[str]:
        if not tokens:
            return []
        hidden = self.encoder.forward(tokens)
        emissions = hidden @ self.w_emit + self.b_emit  # [L, K]
        path = viterbi_decode(
            emissions.astype(np.float64),
            self.transitions.astype(np.float64),
            start_transitions=self.start_transitions.astype(np.float64),
        )
        return [self.tags[i] for i in path]

    def doc_py(self, text: str) -> tuple[int, str, int]:
        """(n_tokens, md5 over the tag json, n decoded spans) for one
        document — shared by the Spark kernel and the fixture twin."""
        tokens = [t for t in (text or "").lower().split(" ") if t]
        tags = self.tag_tokens_py(tokens)
        return self._summarize(tokens, tags)

    @staticmethod
    def _summarize(tokens: list[str], tags: list[str]) -> tuple[int, str, int]:
        blob = json.dumps(tags, separators=(",", ":")).encode()
        return (
            len(tokens),
            hashlib.md5(blob).hexdigest(),
            len(bio_spans_py(tags)),
        )

    def docs_py(self, texts: list) -> list[tuple[int, str, int]]:
        """Batched :meth:`doc_py` over a whole Arrow batch: every
        max_len window of every document rides ONE ragged stacked
        relative-attention pass (``encoder.forward_ragged``), so the
        [2L-1, dh] sinusoid table, the signed-distance gather index and
        the ~60 numpy ops of the forward are amortized across the batch
        instead of being rebuilt per document (the per-row forward was
        ~80% of this operator's kernel time).  Viterbi stays per
        document (10% of the time, and per-doc decode is what the twin
        runs).  Emitted tags are verified EQUAL to the per-row twin
        over every deterministic corpus (test + full-sf sweep): the
        stacked forward's last-ulp float differences sit far below the
        margins of the Viterbi argmax decisions."""
        toks_list = [
            [t for t in (text or "").lower().split(" ") if t] for text in texts
        ]
        max_len = self.encoder.max_len
        win_ids: list[np.ndarray] = []
        owners: list[int] = []
        for di, toks in enumerate(toks_list):
            if not toks:
                continue
            ids = self.encoder.token_ids(toks)
            for lo in range(0, len(ids), max_len):
                win_ids.append(ids[lo : lo + max_len])
                owners.append(di)
        states = self.encoder.forward_ragged(win_ids)
        hidden_by_doc: dict[int, list[np.ndarray]] = {}
        for di, h in zip(owners, states):
            hidden_by_doc.setdefault(di, []).append(h)
        # emissions per doc (same [L, d] @ [d, K] gemm shape as the
        # twin — a fused all-docs gemm would round rows differently),
        # then Viterbi batched over exact-length groups:
        # viterbi_decode_batch is bit-identical to the per-sequence
        # decode (same argmax tie rule), and the L x K^2 DP loop was
        # ~10% of this operator per-row — batched it is one numpy pass
        # per timestep for the whole group.
        emis: dict[int, np.ndarray] = {}
        by_len: dict[int, list[int]] = {}
        for di, toks in enumerate(toks_list):
            if not toks:
                continue
            parts = hidden_by_doc[di]
            hidden = parts[0] if len(parts) == 1 else np.concatenate(parts)
            emis[di] = (hidden @ self.w_emit + self.b_emit).astype(np.float64)
            by_len.setdefault(len(toks), []).append(di)
        trans64 = self.transitions.astype(np.float64)
        start64 = self.start_transitions.astype(np.float64)
        tags_of: dict[int, list[str]] = {}
        for dis in by_len.values():
            paths = viterbi_decode_batch(
                np.stack([emis[di] for di in dis]),
                trans64, start_transitions=start64,
            )
            for di, path in zip(dis, paths):
                tags_of[di] = [self.tags[i] for i in path]
        return [
            self._summarize(toks, tags_of.get(di, []))
            for di, toks in enumerate(toks_list)
        ]


def neural_ner_tags(
    docs_df, model_bc, text_col: str = "text", id_col: str = "doc_id"
):
    """documents -> (doc_id, n_tokens, tags_md5, n_spans): one
    Arrow-batched pass, broadcast tensors, zero shuffles."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m: NeuralNerModel = model_bc.value
        cols = ["doc_id", "n_tokens", "tags_md5", "n_spans"]
        for pdf in it:
            # batched: all docs' windows share ragged stacked forwards
            # (docs_py == doc_py per row, full-corpus-verified)
            res = m.docs_py(list(pdf[text_col]))
            rows = [
                (rid, nt, md, ns)
                for rid, (nt, md, ns) in zip(pdf[id_col], res)
            ]
            yield pd.DataFrame(rows, columns=cols)

    return docs_df.select(id_col, text_col).mapInPandas(kernel, NER_DDL)
