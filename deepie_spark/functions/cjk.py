"""CJK / punctuation character classifier.

Semantics match the reference's ``ChineseAndPunctuationExtractor``
(reference: utils/extract_chinese_and_punct.py:21-115): a character is
"chinese-or-punct" iff it falls in the Han unicode ranges, the CN
punctuation list (which *includes* ASCII space 0x0020 and circled
digits), or the ASCII punctuation ranges.  The ranges themselves are
public Unicode block data; we build one frozenset of codepoints at
import time instead of a regex char-class — O(1) membership, picklable
into pandas UDF workers.
"""

from __future__ import annotations

# Han ranges (Unicode Han script blocks, as used by the reference
# extract_chinese_and_punct.py:21-52).
_HAN_RANGES = [
    (0x2E80, 0x2E99),
    (0x2E9B, 0x2EF3),
    (0x2F00, 0x2FD5),
    (0x3005, 0x3005),
    (0x3007, 0x3007),
    (0x3021, 0x3029),
    (0x3038, 0x303A),
    (0x303B, 0x303B),
    (0x3400, 0x4DB5),
    (0x4E00, 0x9FC3),
    (0xF900, 0xFA2D),
    (0xFA30, 0xFA6A),
    (0xFA70, 0xFAD9),
    (0x20000, 0x2A6D6),
    (0x2F800, 0x2FA1D),
]

# CN punctuation codepoints (extract_chinese_and_punct.py:54-63).  Note
# ASCII space 0x0020 is deliberately a member — the reference treats a
# space as its own sub-text element and later drops it at tokenize time.
_CN_PUNCTS = [
    0x3002, 0xFF1F, 0xFF01, 0xFF0C, 0x3001, 0xFF1B, 0xFF1A, 0x300C, 0x300D,
    0x300E, 0x300F, 0x2018, 0x2019, 0x201C, 0x201D, 0xFF08, 0xFF09, 0x3014,
    0x3015, 0x3010, 0x3011, 0x2014, 0x2026, 0x2013, 0xFF0E, 0x300A, 0x300B,
    0x3008, 0x2460, 0x2461, 0x2462, 0x2463, 0x2464, 0x2465, 0x2466, 0x2467,
    0x2468, 0x2469, 0x3009, 0x2015, 0xFF0D, 0x0020, 0xFF5E,
]

# ASCII punctuation ranges (extract_chinese_and_punct.py:66-67).
_EN_PUNCT_RANGES = [(0x21, 0x2F), (0x3A, 0x40), (0x5B, 0x60), (0x7B, 0x7E)]


def _build_set() -> frozenset[int]:
    cps: set[int] = set(_CN_PUNCTS)
    for lo, hi in _HAN_RANGES + _EN_PUNCT_RANGES:
        cps.update(range(lo, hi + 1))
    return frozenset(cps)


_CJK_OR_PUNCT: frozenset[int] = _build_set()


def is_cjk_or_punct(ch: str) -> bool:
    """True iff ``ch`` is a Han char or CN/EN punctuation (incl. space)."""
    return ord(ch) in _CJK_OR_PUNCT


def cjk_or_punct_class() -> str:
    """Regex character-class body matching EXACTLY the
    ``_CJK_OR_PUNCT`` set — lets hot per-char loops over the classifier
    (the sub-text splitter) run as one compiled C-level regex instead
    of a python for-loop, with identical membership semantics."""
    import re

    parts = []
    for lo, hi in _HAN_RANGES + _EN_PUNCT_RANGES:
        parts.append(f"{re.escape(chr(lo))}-{re.escape(chr(hi))}")
    for cp in _CN_PUNCTS:
        parts.append(re.escape(chr(cp)))
    return "".join(parts)
