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
import-gated: when jieba is present it is used verbatim; otherwise a
deterministic greedy forward-maximum-matching segmenter over a lexicon
(the classic public FMM algorithm jieba itself falls back to for OOV
regions) stands in.  FMM concatenates exactly back to the input, so
the reference's alignment assert holds by construction either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

try:  # pragma: no cover - jieba absent in this container
    import jieba as _jieba
except Exception:  # noqa: BLE001
    _jieba = None


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


def segment(text: str, lexicon: set[str] | None = None) -> list[str]:
    """jieba.lcut when available (data_loader.py:107), FMM otherwise."""
    if _jieba is not None:
        return _jieba.lcut(text)
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
    id_col: str = "doc_id",
):
    """(id, text) -> (id, n_chars, word_ids) in one Arrow-batched pass;
    the per-row kernel is :func:`char_word_ids` itself, so distributed
    output == the single-row oracle by construction.  The id column's
    type is taken from ``texts_df``'s schema, so string/UUID ids pass
    through unchanged (not hardcoded bigint)."""
    id_ddl = texts_df.schema[id_col].dataType.simpleString()

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lex: set[str] = lexicon_bc.value
        w2i: dict[str, int] = word2idx_bc.value
        for pdf in it:
            ids, n_chars, wids = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                t = (text or "").lower().replace(" ", "")  # DuIE-1.0 norm
                words = segment(t, lex)
                ids.append(rid)
                n_chars.append(len(t))
                wids.append(char_word_ids(t, words, w2i))
            yield pd.DataFrame(
                {id_col: ids, "n_chars": n_chars, "word_ids": wids}
            )

    return texts_df.select(id_col, text_col).mapInPandas(
        kernel, f"{id_col} {id_ddl}, n_chars int, word_ids array<int>"
    )
