"""Generate the pinned WordPiece vocab artifact (resources/vocab.txt).

Deterministic: collects every CJK/punct char, trigger/template word, and
char-level fallback piece used by the synthetic world (seed 42), so
tokenization is reproducible with zero [UNK]s on fixture text.  Trigger
and template words are full-word vocab entries (exercising whole-word
WordPiece hits); entity-name words are deliberately *not* (they split
into char pieces, exercising the '##' multi-piece path and shared
element offsets — reference offset semantics, data_loader_v2.py:94-113).

Run:  python scripts/gen_vocab.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deepie_spark.config.schema import SYNTH_SCHEMA
from deepie_spark.functions.cjk import is_cjk_or_punct
from deepie_spark.functions.tokenizer import SPECIALS, normalize_word, split_sub_text
from deepie_spark.sources import synth


def collect() -> list[str]:
    full_word_sources: list[str] = []
    char_only_sources: list[str] = []

    for p in SYNTH_SCHEMA.predicates:
        full_word_sources.extend(p.triggers.values())
    for bank in (synth.NOISE_EN, synth.NOISE_ZH, synth.NOISE_OTHER):
        full_word_sources.extend(t.replace("{place}", " ") for t in bank)

    world = synth.gen_world()
    for e in world.entities:
        char_only_sources.extend(e.aliases)

    vocab: set[str] = set()

    def add_chars(word: str) -> None:
        for i, ch in enumerate(word):
            vocab.add(ch if i == 0 else "##" + ch)
            vocab.add(ch)
            vocab.add("##" + ch)

    def eat(s: str, full_words: bool) -> None:
        for el in split_sub_text(s):
            if el == " ":
                continue
            w = normalize_word(el)
            if not w:
                continue
            if len(el) == 1 and is_cjk_or_punct(el):
                vocab.add(w)
                continue
            if full_words:
                vocab.add(w)
            add_chars(w)

    for s in full_word_sources:
        eat(s, full_words=True)
    for s in char_only_sources:
        eat(s, full_words=False)
    # universal fallbacks: ascii letters, digits, nbsp
    for ch in "abcdefghijklmnopqrstuvwxyz0123456789\xa0":
        vocab.add(ch)
        vocab.add("##" + ch)

    return SPECIALS + sorted(vocab)


if __name__ == "__main__":
    out = Path(__file__).resolve().parent.parent / "deepie_spark" / "resources" / "vocab.txt"
    toks = collect()
    out.write_text("\n".join(toks) + "\n", encoding="utf-8")
    print(f"wrote {len(toks)} tokens -> {out}")
