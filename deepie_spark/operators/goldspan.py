"""Gold-span search + non-overlapping S/O placement — training-label
generation at scale.

Exact ports of the reference's label-building primitives:

  - ``search`` (utils/data_util.py:413-421): first index of a
    sub-sequence in a token list, -1 if absent;
  - ``search_spo_index`` (run/DuIE/transformer_mpn_v2/
    data_loader_v2.py:116-163): places BOTH the subject and the object
    token spans in one pass, longest surface first, and forbids the
    second span from overlapping the first (the ``forbidden_index``
    check) — the detail that keeps self-referential sentences from
    producing degenerate labels.

Distributed shape: gold triples join the tokenized page stage on url
(broadcast when the gold side is dimension-sized, shuffle hash join
otherwise — both sides are hash-partitioned on url so the join
co-locates with the downstream per-url label pack), then one
``mapInPandas`` pass runs the searches page-locally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GOLD_SPANS_DDL = (
    "url string, subject string, predicate string, object_value string, "
    "subject_start int, subject_len int, object_start int, object_len int"
)


def search(pattern: list, sequence: list) -> int:
    """First index of ``pattern`` in ``sequence``, -1 if absent
    (data_util.py:413-421)."""
    n = len(pattern)
    for i in range(len(sequence)):
        if sequence[i : i + n] == pattern:
            return i
    return -1


def search_spo_index(
    tokens: list, subject_sub_tokens: list, object_sub_tokens: list
) -> tuple[int, int]:
    """(subject_start, object_start), -1 when unplaced — verbatim
    semantics of data_loader_v2.py:116-163: the longer surface is
    placed first at its first occurrence; the shorter one takes the
    first occurrence that does NOT overlap it (and scans past
    overlapping hits)."""
    subject_start_index, object_start_index = -1, -1
    forbidden_index = None
    if len(subject_sub_tokens) > len(object_sub_tokens):
        for index in range(len(tokens) - len(subject_sub_tokens) + 1):
            if tokens[index : index + len(subject_sub_tokens)] == subject_sub_tokens:
                subject_start_index = index
                forbidden_index = index
                break
        for index in range(len(tokens) - len(object_sub_tokens) + 1):
            if tokens[index : index + len(object_sub_tokens)] == object_sub_tokens:
                if forbidden_index is None:
                    object_start_index = index
                    break
                elif (
                    index < forbidden_index
                    or index >= forbidden_index + len(subject_sub_tokens)
                ):
                    object_start_index = index
                    break
    else:
        for index in range(len(tokens) - len(object_sub_tokens) + 1):
            if tokens[index : index + len(object_sub_tokens)] == object_sub_tokens:
                object_start_index = index
                forbidden_index = index
                break
        for index in range(len(tokens) - len(subject_sub_tokens) + 1):
            if tokens[index : index + len(subject_sub_tokens)] == subject_sub_tokens:
                if forbidden_index is None:
                    subject_start_index = index
                    break
                elif (
                    index < forbidden_index
                    or index >= forbidden_index + len(object_sub_tokens)
                ):
                    subject_start_index = index
                    break
    return subject_start_index, object_start_index


def gold_spans(
    tokens_df: DataFrame,
    gold_df: DataFrame,
    extractor_bc,
    broadcast_gold: bool = False,
) -> DataFrame:
    """Tokenized pages x gold triples -> placed token spans.

    ``tokens_df``: the token stage (url, tokens, ...); ``gold_df``:
    (url, subject, predicate, object_value).  At crawl scale gold is a
    fact table — the url-equi-join shuffles both sides on url (set
    ``broadcast_gold=True`` only for dimension-sized gold).  Surfaces
    are tokenized inside the kernel with the SAME tokenizer as pages,
    so token-space equality is exact."""
    gold = gold_df.select("url", "subject", "predicate", "object_value")
    if broadcast_gold:
        gold = F.broadcast(gold)
    joined = tokens_df.select("url", "tokens").join(gold, "url")

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ex = extractor_bc.value
        surface_toks: dict[str, list[str]] = {}

        def toks_of(surface: str) -> list[str]:
            got = surface_toks.get(surface)
            if got is None:
                got = ex._alias_tokens(surface)
                surface_toks[surface] = got
            return got

        cols = ["url", "subject", "predicate", "object_value",
                "subject_start", "subject_len", "object_start", "object_len"]
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                toks = list(r.tokens)
                st = toks_of(r.subject)
                ot = toks_of(r.object_value)
                s_at, o_at = search_spo_index(toks, st, ot)
                rows.append(
                    (r.url, r.subject, r.predicate, r.object_value,
                     s_at, len(st), o_at, len(ot))
                )
            yield pd.DataFrame(rows, columns=cols)

    return joined.mapInPandas(kernel, GOLD_SPANS_DDL)
