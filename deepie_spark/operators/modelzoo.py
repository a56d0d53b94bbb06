"""Model-zoo decode kernels beyond the flagship cascade.

Pure functions (numpy/python) matching the reference's alternative
decoders, each wrappable in an Arrow-batched UDF:

  - ``sequential_pointer_pairs``: the joint-MPN 2019 EntityNET decode —
    stateful sweep pairing the first un-consumed start with the first
    un-consumed end at >= it, threshold 0.0 on logits
    (models/ere_net/mpn.py:77-97);
  - ``etl_span`` thresholds: the non-BERT cascade uses 0.5/0.4 instead
    of 0.6/0.5 (models/spo_net/etl_span.py:106-107,
    run/relation_extraction/etl_span/train.py:292-293) — exposed by
    parameterizing the shared decode;
  - ``find_entity`` / ``selection_decode``: multi-head-selection
    biaffine decode — BIO tags + an [L, R, L] selection grid > 0.5;
    entities recovered by the backward scan from the tail token
    (layers/decoders/selection.py:31-49, 74-109);
  - ``gaz_bmes_features``: per-position Begin/Middle/End/Single buckets
    of gazetteer matches with count weights — the lexicon-augment NER
    feature builder (lexiconAugmentNER/utils/functions.py:96-129).
"""

from __future__ import annotations

import numpy as np

from deepie_spark.functions.trie import AliasTrie


def sequential_pointer_pairs(
    p1: np.ndarray, p2: np.ndarray, threshold: float = 0.0
) -> list[tuple[int, int]]:
    """mpn.py:77-97: walk positions once; remember the first start and
    first end seen; whenever both are set with start <= end, emit
    (start, end_exclusive) and reset."""
    start = end = None
    out: list[tuple[int, int]] = []
    for idx in range(len(p1)):
        if p1[idx] > threshold and start is None:
            start = idx
        if p2[idx] > threshold and end is None:
            end = idx
        if start is not None and end is not None and start <= end:
            out.append((start, end + 1))
            start = None
            end = None
    return out


def find_entity(pos: int, text: list[str], tags: list[str]) -> str:
    """selection.py:31-49: recover the entity ending at ``pos`` from
    BIO tags — only tail positions yield a non-empty string."""
    if pos >= len(text):
        return ""
    if tags[pos] == "B" and (pos == len(text) - 1 or tags[pos + 1] == "O"):
        return text[pos]
    if tags[pos] == "I" and (pos == len(text) - 1 or tags[pos + 1] == "O"):
        tmp = []
        while tags[pos] == "I":
            tmp.append(text[pos])
            pos -= 1
            if pos < 0:
                break
            if tags[pos] == "B":
                tmp.append(text[pos])
                break
        return "".join(reversed(tmp))
    return ""


def selection_decode(
    chars: list[str],
    bio_tags: list[str],
    selection_grid: np.ndarray,
    relations: dict[int, str],
    threshold: float = 0.5,
) -> list[tuple[str, str, str]]:
    """Multi-head selection: grid[s, r, o] > threshold emits the triple
    (entity-ending-at-s, relation r, entity-ending-at-o); empty entity
    recovery drops the candidate (selection.py:74-109)."""
    out = []
    for s, r, o in zip(*np.where(selection_grid > threshold)):
        obj = find_entity(int(o), chars, bio_tags)
        if obj == "":
            continue
        sub = find_entity(int(s), chars, bio_tags)
        if sub == "":
            continue
        out.append((sub, relations[int(r)], obj))
    return out


def gaz_bmes_features(
    tokens: list[str], trie: AliasTrie, weights: dict[int, float] | None = None
) -> list[dict]:
    """Per-position BMES buckets of gazetteer matches
    (functions.py:96-129): a length-1 match is Single at its position;
    longer matches contribute Begin at start, End at last, Middle in
    between.  Each bucket carries (canonical_id, weight) pairs; empty
    buckets get the null entry (id 0, weight 1) like the reference."""
    n = len(tokens)
    buckets = [
        {k: [] for k in ("B", "M", "E", "S")} for _ in range(n)
    ]
    for i in range(n):
        for end, entries in trie.enumerate_matches(tokens, i):
            for e in entries:
                w = (weights or {}).get(e.canonical_id, e.weight)
                length = end - i
                if length == 1:
                    buckets[i]["S"].append((e.canonical_id, w))
                else:
                    buckets[i]["B"].append((e.canonical_id, w))
                    buckets[end - 1]["E"].append((e.canonical_id, w))
                    for m in range(i + 1, end - 1):
                        buckets[m]["M"].append((e.canonical_id, w))
    for b in buckets:
        for k in ("B", "M", "E", "S"):
            if not b[k]:
                b[k].append((0, 1.0))
    return buckets
