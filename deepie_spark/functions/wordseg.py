"""Word segmentation + per-char word-id alignment (the non-BERT
ETL-Span input path).

Reference semantics (run/relation_extraction/etl_span/data_loader.py):
  - :107 ``text_word = jieba.lcut(text)`` on the DuIE-1.0-normalized
    text;
  - :283-292 per-char word features:
    ``word_ids = [word2idx.get(w, 0) for w in text_word for _ in w]``
    with the hard alignment assert ``len(char_ids) == len(word_ids)``
    — every char carries the id of its covering word.

jieba is not installed in this environment, so ``segment`` is
import-gated: when jieba is present it is used verbatim.  Otherwise two
fallbacks, both concatenation-preserving (so the reference's alignment
assert holds by construction):

  - with a frequency dict: ``mp_segment`` — jieba's own cut(HMM=False)
    algorithm (the public max-probability route over a word-frequency
    DAG, plus jieba's block splitting and single-char latin merging),
    reimplemented from the published algorithm description.  Given
    jieba's dict.txt frequencies this produces jieba-identical output
    for dictionary words — the closest jieba parity reachable without
    the package;
  - with only a lexicon set: greedy forward-maximum-matching (the
    classic public FMM algorithm), kept as the cheap default the
    existing oracles pin.
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator

import pandas as pd

try:  # pragma: no cover - jieba absent in this container
    import jieba as _jieba
except Exception:  # noqa: BLE001
    _jieba = None

# jieba's default block/skip classes (public regexes from its cut()):
# han blocks (plus latin/digit/a few joiners) go through the DAG; other
# text is split on whitespace runs and emitted per char
_RE_HAN = re.compile("([一-鿕a-zA-Z0-9+#&._%\\-]+)")
_RE_SKIP = re.compile("(\r\n|\\s)")
_RE_ENG = re.compile("[a-zA-Z0-9]")


def fmm_segment(text: str, lexicon: set[str], max_word: int = 8) -> list[str]:
    """Greedy forward maximum matching: at each position take the
    longest lexicon word, else a single char.  concat(result) == text
    for every input (the alignment invariant)."""
    words: list[str] = []
    i, n = 0, len(text)
    while i < n:
        w = None
        for ln in range(min(max_word, n - i), 1, -1):
            cand = text[i : i + ln]
            if cand in lexicon:
                w = cand
                break
        if w is None:
            w = text[i]
        words.append(w)
        i += len(w)
    return words


def _build_dag(block: str, freq: dict[str, int], prefixes: set[str]) -> dict[int, list[int]]:
    """jieba's DAG: DAG[i] = end indices j such that block[i:j+1] is a
    dict word (freq > 0) or the single char itself.  The prefix set
    bounds the inner scan exactly like jieba's prefix dict (dict.txt
    lists every prefix with freq 0)."""
    n = len(block)
    dag: dict[int, list[int]] = {}
    for i in range(n):
        ends = [i]
        frag = block[i]
        j = i
        while j < n and frag in prefixes:
            if freq.get(frag, 0) > 0 and j != i:
                ends.append(j)
            j += 1
            frag = block[i : j + 1]
        dag[i] = ends
    return dag


def _cut_dag_no_hmm(
    block: str, freq: dict[str, int], prefixes: set[str], logtotal: float
) -> Iterator[str]:
    """jieba's __cut_DAG_NO_HMM: max-probability route (DP over the
    DAG, score = sum of log(freq/total) with unknown chars at freq 1,
    ties broken toward the longer word exactly as jieba's tuple-max
    does), then emission with consecutive single latin/digit chars
    merged into one token."""
    dag = _build_dag(block, freq, prefixes)
    n = len(block)
    route: dict[int, tuple[float, int]] = {n: (0.0, 0)}
    for idx in range(n - 1, -1, -1):
        route[idx] = max(
            (
                math.log(freq.get(block[idx : x + 1]) or 1) - logtotal
                + route[x + 1][0],
                x,
            )
            for x in dag[idx]
        )
    x = 0
    buf = ""
    while x < n:
        y = route[x][1] + 1
        w = block[x:y]
        # jieba merges only SINGLE latin/digit chars (a multi-char dict
        # word is emitted as-is even if alphanumeric)
        if len(w) == 1 and _RE_ENG.match(w):
            buf += w
            x = y
            continue
        if buf:
            yield buf
            buf = ""
        yield w
        x = y
    if buf:
        yield buf


def prepare_freq(freq: dict[str, int]) -> tuple[set[str], float]:
    """One-time derivation of the DAG segmenter's lookup state from a
    frequency dict: the prefix set (every prefix of every word, jieba's
    prefix-dict trick) and log(total frequency).

    O(total dict chars) — with a realistic jieba-sized dict (~350k
    words) this is FAR too expensive to rebuild per call, let alone per
    row inside an Arrow kernel.  Call it once per kernel invocation /
    broadcast value and pass the result to :func:`mp_segment` via
    ``prepared``; ``mp_segment`` also memoizes the last few freq dicts
    by identity as a safety net for callers that don't hoist."""
    total = sum(freq.values()) or 1
    prefixes = {w[:k] for w in freq for k in range(1, len(w) + 1)}
    return prefixes, math.log(total)


# identity-keyed memo (freq dicts are broadcast values: few, long-lived,
# never mutated).  Entries hold a strong ref to the keyed dict so a
# recycled id() can never alias a different object.  A len() signature
# additionally invalidates on the common in-place mutation (jieba's
# add_word pattern inserts new entries); re-weighting an EXISTING word
# in place is NOT detected — treat the freq dict as immutable after
# first use, or rebuild it (a full-content signature would cost O(dict)
# per call, exactly what this cache exists to avoid).
_PREPARED_CACHE: dict[int, tuple[dict[str, int], int, set[str], float]] = {}
_PREPARED_CACHE_MAX = 8


def _prepared_for(freq: dict[str, int]) -> tuple[set[str], float]:
    hit = _PREPARED_CACHE.get(id(freq))
    if hit is not None and hit[0] is freq and hit[1] == len(freq):
        return hit[2], hit[3]
    prefixes, logtotal = prepare_freq(freq)
    if len(_PREPARED_CACHE) >= _PREPARED_CACHE_MAX:
        _PREPARED_CACHE.clear()
    _PREPARED_CACHE[id(freq)] = (freq, len(freq), prefixes, logtotal)
    return prefixes, logtotal


def mp_segment(
    text: str,
    freq: dict[str, int],
    total: int | None = None,
    prepared: tuple[set[str], float] | None = None,
) -> list[str]:
    """jieba-equivalent segmentation (``jieba.cut(text, HMM=False)``
    semantics) over a caller-supplied frequency dict: han/latin blocks
    route through the max-probability DAG, other spans split on
    whitespace runs and emit per char — the public algorithm from the
    jieba project, reimplemented.  With jieba's own dict.txt
    frequencies the output matches real jieba token-for-token on
    dictionary text (the skip-gated parity test runs it when jieba is
    installed).  Concatenation-preserving for every input.

    ``freq`` is treated as immutable once used: the derived prefix
    set/log-total are memoized (see ``_PREPARED_CACHE``).  Adding words
    in place is detected via a len() signature; re-weighting an
    existing entry in place is not — pass a fresh dict (or explicit
    ``prepared``) after such a mutation."""
    if not text:
        return []
    if prepared is not None:
        prefixes, logtotal = prepared
        if total is not None:
            logtotal = math.log(total)
    elif total is not None:
        prefixes, _ = _prepared_for(freq)
        logtotal = math.log(total)
    else:
        prefixes, logtotal = _prepared_for(freq)
    out: list[str] = []
    for blk in _RE_HAN.split(text):
        if not blk:
            continue
        if _RE_HAN.fullmatch(blk):
            out.extend(_cut_dag_no_hmm(blk, freq, prefixes, logtotal))
        else:
            for x in _RE_SKIP.split(blk):
                if not x:
                    continue
                if _RE_SKIP.fullmatch(x):
                    out.append(x)
                else:
                    out.extend(x)  # punctuation etc.: one token per char
    return out


def segment(
    text: str,
    lexicon: set[str] | None = None,
    freq: dict[str, int] | None = None,
    prepared: tuple[set[str], float] | None = None,
) -> list[str]:
    """jieba.lcut when available (data_loader.py:107); else the
    jieba-algorithm ``mp_segment`` when word frequencies are supplied
    (hoist ``prepared=prepare_freq(freq)`` out of per-row loops);
    else FMM over the bare lexicon."""
    if _jieba is not None:
        return _jieba.lcut(text)
    if freq is not None:
        return mp_segment(text, freq, prepared=prepared)
    return fmm_segment(text, lexicon or set())


def char_word_ids(
    text: str, words: list[str], word2idx: dict[str, int]
) -> list[int]:
    """Per-char word ids — the exact data_loader.py:283-292 expansion
    (word id repeated len(word) times), with the reference's alignment
    assert."""
    word_ids = [word2idx.get(word, 0) for word in words for _ in word]
    assert len(text) == len(word_ids), (text, words)
    return word_ids


def align_word_features(
    texts_df, lexicon_bc, word2idx_bc, text_col: str = "text",
    id_col: str = "doc_id", freq_bc=None,
):
    """(id, text) -> (id, n_chars, word_ids) in one Arrow-batched pass;
    the per-row kernel is :func:`char_word_ids` itself, so distributed
    output == the single-row oracle by construction.  The id column's
    type is taken from ``texts_df``'s schema, so string/UUID ids pass
    through unchanged (not hardcoded bigint).  Broadcasting a word
    frequency dict via ``freq_bc`` switches the fallback segmenter to
    the jieba-algorithm max-probability route (``mp_segment``)."""
    id_ddl = texts_df.schema[id_col].dataType.simpleString()

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lex: set[str] = lexicon_bc.value
        w2i: dict[str, int] = word2idx_bc.value
        freq: dict[str, int] | None = freq_bc.value if freq_bc is not None else None
        # hoisted out of the row loop: building the prefix set + total
        # is O(|dict|) — per-kernel, never per-row (with a jieba-scale
        # ~350k-word dict the per-row form would dominate the kernel)
        prepared = prepare_freq(freq) if freq is not None else None
        for pdf in it:
            ids, n_chars, wids = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                t = (text or "").lower().replace(" ", "")  # DuIE-1.0 norm
                words = segment(t, lex, freq=freq, prepared=prepared)
                ids.append(rid)
                n_chars.append(len(t))
                wids.append(char_word_ids(t, words, w2i))
            yield pd.DataFrame(
                {id_col: ids, "n_chars": n_chars, "word_ids": wids}
            )

    return texts_df.select(id_col, text_col).mapInPandas(
        kernel, f"{id_col} {id_ddl}, n_chars int, word_ids array<int>"
    )
