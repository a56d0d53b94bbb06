"""Deterministic WordPiece tokenizer with char-offset maps.

Reproduces the reference's tokenization surface exactly:

  - sub-text segmentation state machine: CJK/punct chars become their
    own element; digit runs and latin runs are separate buffered
    elements (reference: run/DuIE/transformer_mpn_v2/data_loader_v2.py:63-92).
  - per-element WordPiece with shared orig-char offsets per element and
    a hard stop at ``max_seq_length - 2`` implemented with the same
    for/else break (data_loader_v2.py:94-113).
  - greedy longest-match WordPiece (reference ships its own pure-python
    impl, utils/data_util.py:305-327, to avoid HF nondeterminism; ours
    is an independent implementation of the same public algorithm).
  - lowercase + NFD + strip Mn marks, per BERT do_lower_case
    (utils/data_util.py:109-113 semantics).

The tokenizer is a plain picklable object built from a pinned vocab
artifact (deepie_spark/resources/vocab.txt) so results are bit-stable
across sessions, Arrow batch sizes, and executors.
"""

from __future__ import annotations

import re
import unicodedata
from pathlib import Path

from deepie_spark.functions.cjk import cjk_or_punct_class, is_cjk_or_punct

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"
SPECIALS = [PAD, UNK, CLS, SEP, MASK]

_DIGIT_RE = re.compile(r"\d")
# the sub-text state machine as one regex: a CJK/punct singleton, else
# a maximal digit run, else a maximal other-char run (alternation order
# mirrors the machine's branch order; classes are exactly the
# classifier's codepoint set)
_CJK_CLASS = cjk_or_punct_class()
_SUB_TEXT_RE = re.compile(f"[{_CJK_CLASS}]|\\d+|[^{_CJK_CLASS}\\d]+")
_DEFAULT_VOCAB = Path(__file__).resolve().parent.parent / "resources" / "vocab.txt"


def load_vocab(path: str | Path | None = None) -> dict[str, int]:
    """Load the pinned vocab.  Default goes through importlib.resources
    so it works when the package ships as a --py-files zip (plain
    ``open()`` cannot read inside a zip)."""
    if path is None:
        from importlib import resources

        text = (
            resources.files("deepie_spark") / "resources" / "vocab.txt"
        ).read_text(encoding="utf-8")
    else:
        text = Path(path).read_text(encoding="utf-8")
    vocab: dict[str, int] = {}
    for line in text.splitlines():
        tok = line.rstrip("\n")
        if tok and tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def normalize_word(word: str) -> str:
    """BERT-style do_lower_case: lowercase, NFD, drop combining marks."""
    out = []
    for ch in unicodedata.normalize("NFD", word.lower()):
        if unicodedata.category(ch) == "Mn":
            continue
        out.append(ch)
    return "".join(out)


class WordPieceTokenizer:
    """Greedy longest-match WordPiece over a fixed vocab."""

    _CACHE_CAP = 200_000  # bounded per-worker memo (~tens of MB worst case)

    def __init__(self, vocab: dict[str, int], max_word_chars: int = 100):
        self.vocab = vocab
        self.unk_id = vocab[UNK]
        self.max_word_chars = max_word_chars
        # element -> pieces memo: web-text elements repeat heavily
        # (common words, CJK singletons), and normalize+wordpiece is
        # ~45% of page cost; purely a cache, results are unchanged
        self._memo: dict[str, list[str]] = {}

    def wordpiece(self, word: str) -> list[str]:
        """Split one whitespace-free word into subword pieces.

        Exact port of the reference's ``_word_piece_tokenize``
        (utils/data_util.py:305-327) INCLUDING its no-match behavior:
        when no vocab piece matches at ``start`` (start == stop), the
        single-char sub (with its ## prefix when start > 0) is emitted
        as-is — it later encodes to the UNK id piece-by-piece, it does
        NOT collapse the whole word to one [UNK] (that would change the
        token count and shift every downstream offset).

        One deliberate divergence, documented: words longer than
        ``max_word_chars`` short-circuit to [UNK] (the reference has no
        guard; its greedy loop is O(n^2) and a 10^6-char token in web
        text would stall an executor core).
        """
        if word in self.vocab:
            return [word]
        if len(word) > self.max_word_chars:
            return [UNK]
        pieces: list[str] = []
        start = 0
        n = len(word)
        while start < n:
            stop = n
            while stop > start:
                sub = word[start:stop]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    break
                stop -= 1
            if start == stop:  # no match: emit the 1-char sub verbatim
                stop += 1
                sub = word[start:stop]
                if start > 0:
                    sub = "##" + sub
            pieces.append(sub)
            start = stop
        return pieces

    def tokenize(self, element: str) -> list[str]:
        """Tokenize one sub-text element (a CJK/punct char or a run)."""
        got = self._memo.get(element)
        if got is not None:
            return got
        word = normalize_word(element)
        pieces = self.wordpiece(word) if word else []
        if len(self._memo) < self._CACHE_CAP:
            self._memo[element] = pieces
        return pieces

    def encode(self, tokens: list[str]) -> list[int]:
        v = self.vocab
        unk = self.unk_id
        return [v.get(t, unk) for t in tokens]


def is_space_char(ch: str) -> bool:
    """Space-class predicate (utils/data_util.py:328-334)."""
    return ch in (" ", "\n", "\r", "\t") or unicodedata.category(ch) == "Zs"


def is_control_char(ch: str) -> bool:
    """Control-class predicate (utils/data_util.py:367-371): Cc/Cf."""
    return unicodedata.category(ch) in ("Cc", "Cf")


def is_basic_punct(ch: str) -> bool:
    """data_util's punctuation predicate (:336-344): ASCII punct ranges
    or any Unicode category P*."""
    code = ord(ch)
    return (
        33 <= code <= 47
        or 58 <= code <= 64
        or 91 <= code <= 96
        or 123 <= code <= 126
        or unicodedata.category(ch).startswith("P")
    )


def is_basic_cjk(ch: str) -> bool:
    """data_util's CJK predicate (:352-364): Han blocks only."""
    code = ord(ch)
    return (
        0x4E00 <= code <= 0x9FFF
        or 0x3400 <= code <= 0x4DBF
        or 0x20000 <= code <= 0x2A6DF
        or 0x2A700 <= code <= 0x2B73F
        or 0x2B740 <= code <= 0x2B81F
        or 0x2B820 <= code <= 0x2CEAF
        or 0xF900 <= code <= 0xFAFF
        or 0x2F800 <= code <= 0x2FA1F
    )


def basic_tokenize(text: str, tokenizer: WordPieceTokenizer) -> list[str]:
    """The reference's OTHER tokenize path — utils/data_util.py
    ``Tokenizer._tokenize`` (:285-303), used by its BERT-based runs:
    punct/CJK chars are space-padded, space-class chars become plain
    separators, NUL / U+FFFD / control chars are DROPPED, then each
    whitespace word is wordpiece-split.  No offset maps (that path
    recovers spans by token-list search instead — see
    operators/goldspan.py).  Uses data_util's OWN char predicates, which
    differ from extract_chinese_and_punct's (cjk.py)."""
    spaced = []
    for ch in text:
        if is_basic_punct(ch) or is_basic_cjk(ch):
            spaced.append(f" {ch} ")
        elif is_space_char(ch):
            spaced.append(" ")
        elif ord(ch) == 0 or ord(ch) == 0xFFFD or is_control_char(ch):
            continue
        else:
            spaced.append(ch)
    tokens: list[str] = []
    for word in "".join(spaced).strip().split():
        tokens.extend(tokenizer.tokenize(word))
    return tokens


def split_sub_text(text: str) -> list[str]:
    """The reference's sub-text state machine (data_loader_v2.py:63-92).

    CJK-or-punct chars (incl. space) are singleton elements; digit runs
    and other (latin) runs buffer separately, a digit->latin or
    latin->digit transition flushes the buffer.

    Control-char stance (decided + documented): this machine follows
    data_loader_v2 EXACTLY, which has no control-char drop — control
    chars buffer into latin runs, preserving the per-url offset
    invariant of the DuIE-v2 path.  The reference's other tokenize path
    (utils/data_util.py:285-303) DOES drop Cc/Cf/NUL/U+FFFD; that
    behavior lives in :func:`basic_tokenize` above.  The two reference
    paths genuinely disagree on control characters; we port each one
    faithfully rather than inventing a merged behavior.

    Implementation: one compiled-regex ``findall`` — CJK/punct chars
    as singletons, then maximal digit runs, then maximal other runs —
    which is exactly the flush behavior of the original per-char state
    machine (equality fuzz-tested against the python form in
    test_tokenizer), at C speed instead of a python char loop that was
    ~10% of the whole extraction kernel.
    """
    return _SUB_TEXT_RE.findall(text)


def _split_sub_text_state_machine(text: str) -> list[str]:
    """The original per-char state machine — kept as the oracle the
    regex form is fuzz-tested against."""
    sub_text: list[str] = []
    buff = ""
    flag_en = False
    flag_digit = False
    for ch in text:
        if is_cjk_or_punct(ch):
            if buff:
                sub_text.append(buff)
                buff = ""
            sub_text.append(ch)
            flag_en = False
            flag_digit = False
        elif _DIGIT_RE.match(ch):
            if buff and flag_en:
                sub_text.append(buff)
                buff = ""
                flag_en = False
            flag_digit = True
            buff += ch
        else:
            if buff and flag_digit:
                sub_text.append(buff)
                buff = ""
                flag_digit = False
            flag_en = True
            buff += ch
    if buff:
        sub_text.append(buff)
    return sub_text


def tokenize_with_offsets(
    text: str, tokenizer: WordPieceTokenizer, max_seq_length: int
) -> tuple[list[str], list[int], list[int]]:
    """Tokens + char offset maps, truncated at ``max_seq_length - 2``.

    Mirrors ``covert_to_tokens`` (data_loader_v2.py:94-113): every
    wordpiece of an element shares the element's [start, end] char
    span; ' ' elements produce no tokens; truncation stops *mid
    element* exactly like the reference's for/else break.
    """
    tokens: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    pos = 0
    limit = max_seq_length - 2
    for element in split_sub_text(text):
        pieces = tokenizer.tokenize(element) if element != " " else []
        el_start = pos
        pos += len(element)
        if not pieces:
            continue
        # every wordpiece of an element shares the element's char span,
        # so the common (non-truncating) case extends in bulk; the
        # truncating tail keeps the reference's exact stop-mid-element
        k = len(pieces)
        room = limit - len(tokens)
        if k >= room:  # this element reaches the limit: emit `room`
            pieces = pieces[:room]
            k = room
        tokens.extend(pieces)
        starts.extend([el_start] * k)
        ends.extend([pos - 1] * k)
        if len(tokens) >= limit:
            break
    return tokens, starts, ends


def wrap_cls_sep(tokens: list[str]) -> list[str]:
    """[CLS] + tokens + [SEP] (data_loader_v2.py:191)."""
    return [CLS] + tokens + [SEP]
