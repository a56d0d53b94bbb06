"""Attribute extraction: entity-conditioned span tagging.

Reference semantics (run/attribute_extraction/ + models/attribute_net/
bert_mpn.py:69-120): one pass per (text, entity) pair — the entity is
marked in the input (char replacement with a reserved marker,
data_loader.py:317-323), two [L, K] heads score attribute-value
start/end per attribute type, thresholds 0.5/0.5, and decode pairs
each start with the FIRST end >= start of the SAME type
(train.py:272-295).  Gold fixtures satisfy the reference's span
asserts ``text[start:end] == value`` (data_loader.py:135, 155).

Our deterministic scorer marks value spans that follow an attribute's
trigger phrase inside the record text; the decode machinery is exact.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from deepie_spark.functions.tokenizer import (
    WordPieceTokenizer,
    load_vocab,
    tokenize_with_offsets,
)

ATTR_START_T = 0.5
ATTR_END_T = 0.5
PROB = 0.9


@dataclass(frozen=True)
class AttrType:
    aid: int
    name: str
    trigger: str


SYNTH_ATTRS = [
    AttrType(0, "dose", "at a dose of"),
    AttrType(1, "duration", "for a duration of"),
    AttrType(2, "frequency", "with a frequency of"),
    AttrType(3, "onset", "with onset in"),
]

ATTR_DDL = "rec_id bigint, attr_type string, value string, val_start int, val_end int"


class AttributeExtractor:
    """Picklable scorer + decoder for (text, entity span) records."""

    def __init__(self, attrs: list[AttrType] = None, vocab=None,
                 max_seq_length: int = 256):
        self.attrs = attrs or SYNTH_ATTRS
        self.tokenizer = WordPieceTokenizer(vocab or load_vocab())
        self.max_seq_length = max_seq_length
        self.trigger_toks = {
            a.aid: tuple(
                t
                for el in a.trigger.split(" ")
                for t in self.tokenizer.tokenize(el)
            )
            for a in self.attrs
        }
        self.num_types = max(a.aid for a in self.attrs) + 1

    def score_grid(self, tokens, starts, ends, text) -> np.ndarray:
        """[L, K, 2] start/end probabilities (unwrapped indices)."""
        n = len(tokens)
        g = np.zeros((n, self.num_types, 2), dtype=np.float32)
        for aid, seq in self.trigger_toks.items():
            m = len(seq)
            if m == 0:
                continue
            for i in range(n - m + 1):
                if tuple(tokens[i : i + m]) != seq:
                    continue
                # value span: maximal run of tokens sharing one element
                # right after the trigger (digit runs / single words)
                j = i + m
                if j >= n:
                    continue
                k = j
                while (
                    k + 1 < n
                    and starts[k + 1] == starts[j]
                    and ends[k + 1] == ends[j]
                ):
                    k += 1
                g[j, aid, 0] = PROB
                g[k, aid, 1] = PROB
        return g

    @staticmethod
    def decode(grid: np.ndarray) -> list[tuple[int, int, int]]:
        """(start, end, attr_id): each start pairs with the first end of
        the same type at >= start (attribute train.py:272-295)."""
        out = []
        starts = np.where(grid[:, :, 0] > ATTR_START_T)
        ends = np.where(grid[:, :, 1] > ATTR_END_T)
        for s, k1 in zip(*starts):
            for e, k2 in zip(*ends):
                if k1 == k2 and e >= s:
                    out.append((int(s), int(e), int(k1)))
                    break
        return out

    def extract_record_py(self, text: str | None) -> list[dict]:
        text = text or ""  # null rows flow as zero-attribute records
        tokens, starts, ends = tokenize_with_offsets(
            text, self.tokenizer, self.max_seq_length
        )
        grid = self.score_grid(tokens, starts, ends, text)
        by_id = {a.aid: a for a in self.attrs}
        out = []
        for s, e, aid in self.decode(grid):
            val = text[starts[s] : ends[e] + 1]
            out.append(
                {
                    "attr_type": by_id[aid].name,
                    "value": val,
                    "val_start": starts[s],
                    "val_end": ends[e] + 1,
                }
            )
        return out


def extract_attributes(records_df, extractor_bc):
    """(rec_id, text, ...) -> attribute rows, one mapInPandas pass."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ex: AttributeExtractor = extractor_bc.value
        cols = ["rec_id", "attr_type", "value", "val_start", "val_end"]
        for pdf in it:
            rows = []
            for rec_id, text in zip(pdf["rec_id"], pdf["text"]):
                for a in ex.extract_record_py(text):
                    rows.append(
                        (rec_id, a["attr_type"], a["value"],
                         a["val_start"], a["val_end"])
                    )
            yield pd.DataFrame(rows, columns=cols)

    return records_df.select("rec_id", "text").mapInPandas(kernel, ATTR_DDL)
