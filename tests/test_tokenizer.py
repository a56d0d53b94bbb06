from hypothesis import given, settings
from hypothesis import strategies as st

from deepie_spark.functions import tokenizer as tok
from deepie_spark.functions.cjk import is_cjk_or_punct


def test_cjk_classifier_membership():
    assert is_cjk_or_punct("中")
    assert is_cjk_or_punct("。")
    assert is_cjk_or_punct(" ")  # 0x0020 is in the CN punct table
    assert is_cjk_or_punct("!")
    assert is_cjk_or_punct("～")
    assert not is_cjk_or_punct("a")
    assert not is_cjk_or_punct("5")
    assert is_cjk_or_punct("~")  # ASCII tilde: EN punct range [0x7B,0x7E]


def test_split_sub_text_state_machine():
    # CJK chars singleton; digit runs and latin runs split on transition
    # (data_loader_v2.py:64-92)
    assert tok.split_sub_text("中a1b国") == ["中", "a", "1", "b", "国"]
    assert tok.split_sub_text("abc123def") == ["abc", "123", "def"]
    assert tok.split_sub_text("a b") == ["a", " ", "b"]
    assert tok.split_sub_text("TGA90%～95%") == ["TGA", "90", "%", "～", "95", "%"]
    assert tok.split_sub_text("") == []


def _mini_vocab(extra=()):
    toks = list(tok.SPECIALS) + list("abcdefgh0123456789") + [
        "##" + c for c in "abcdefgh0123456789"
    ] + ["abc", "##de", "hello", "中", "国", "。", "."] + list(extra)
    return {t: i for i, t in enumerate(toks)}


def test_wordpiece_greedy_longest_match():
    wp = tok.WordPieceTokenizer(_mini_vocab())
    assert wp.wordpiece("abc") == ["abc"]
    assert wp.wordpiece("abcde") == ["abc", "##de"]
    assert wp.wordpiece("abcdef") == ["abc", "##de", "##f"]
    # no-match chars emit 1-char subs verbatim (data_util.py:319-321
    # start==stop -> stop+=1), NOT a single collapsed [UNK]
    assert wp.wordpiece("zzz") == ["z", "##z", "##z"]
    assert wp.wordpiece("azz") == ["a", "##z", "##z"]
    assert wp.wordpiece("a" * 200) == [tok.UNK]  # long-word guard (ours)


def test_normalize_word():
    assert tok.normalize_word("HeLLo") == "hello"
    assert tok.normalize_word("Café") == "cafe"  # NFD + Mn strip


def test_offsets_reconstruct_spans():
    wp = tok.WordPieceTokenizer(_mini_vocab())
    text = "abcde中国。abc 123"
    tokens, starts, ends = tok.tokenize_with_offsets(text, wp, 512)
    assert len(tokens) == len(starts) == len(ends)
    # offsets monotone
    assert starts == sorted(starts)
    # each token's span slices a non-empty piece of text
    for s, e in zip(starts, ends):
        assert 0 <= s <= e < len(text)
    # element-granular reconstruction: first token of each element starts it
    assert text[starts[0] : ends[0] + 1] == "abcde"
    i_zh = tokens.index("中")
    assert text[starts[i_zh] : ends[i_zh] + 1] == "中"


def test_truncation_mid_element():
    # the for/else break truncates inside an element exactly at
    # max_seq_length - 2 tokens (data_loader_v2.py:105-109)
    wp = tok.WordPieceTokenizer(_mini_vocab())
    text = " ".join(["abcde"] * 10)  # each element -> [abc, ##de]
    tokens, starts, ends = tok.tokenize_with_offsets(text, wp, 7)  # limit 5
    assert len(tokens) == 5
    # cut mid-element: the 3rd element contributes only its first piece
    assert tokens == ["abc", "##de", "abc", "##de", "abc"]
    # the truncated element's pieces still share its full char span
    assert text[starts[4] : ends[4] + 1] == "abcde"


def test_space_elements_produce_no_tokens():
    wp = tok.WordPieceTokenizer(_mini_vocab())
    tokens, starts, ends = tok.tokenize_with_offsets("abc abc", wp, 512)
    assert tokens == ["abc", "abc"]


def test_encode_and_wrap():
    wp = tok.WordPieceTokenizer(_mini_vocab())
    wrapped = tok.wrap_cls_sep(["abc"])
    assert wrapped == [tok.CLS, "abc", tok.SEP]
    ids = wp.encode(wrapped)
    assert ids[0] == wp.vocab[tok.CLS] and ids[-1] == wp.vocab[tok.SEP]
    assert wp.encode(["nope-not-here"]) == [wp.unk_id]


def test_pinned_vocab_loads_and_is_deterministic():
    v = tok.load_vocab()
    assert v[tok.PAD] == 0 and v[tok.UNK] == 1
    import scripts.gen_vocab as gv

    regen = gv.collect()
    assert {t: i for i, t in enumerate(regen)} == v


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.sampled_from("ab1中。 x"), max_size=40))
def test_property_offsets_within_text(s):
    wp = tok.WordPieceTokenizer(_mini_vocab())
    tokens, starts, ends = tok.tokenize_with_offsets(s, wp, 128)
    assert len(tokens) == len(starts) == len(ends)
    for st_, en in zip(starts, ends):
        assert 0 <= st_ <= en < max(len(s), 1)


def test_split_sub_text_regex_equals_state_machine():
    """The compiled-regex splitter must reproduce the per-char state
    machine exactly, over adversarial unicode mixes (CJK, CN/EN punct,
    unicode digits, controls, plane-2 Han, space)."""
    import random

    from deepie_spark.functions.tokenizer import (
        _split_sub_text_state_machine,
        split_sub_text,
    )

    rng = random.Random(20260822)
    alphabet = (
        "abcXYZ \u00e9\u00df09\uff10\u0660"
        "\u4e00\u9fc3\u3400\u2e80\U00020000\U0002f800"
        "\u3002\uff1f\u2018\u201d\u2460"
        "!/:@[`{~\n\t\ufffd\u200b\u0301"
    )
    for _ in range(400):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        assert split_sub_text(s) == _split_sub_text_state_machine(s), repr(s)
