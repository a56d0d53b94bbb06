"""Word segmentation + char/word alignment (etl_span/data_loader.py:107,
283-292): the FMM fallback's concat invariant, the exact per-char id
expansion, and the distributed pass."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deepie_spark.functions import wordseg as W

LEX = {"spark", "query", "ab", "abc", "中国", "北京"}
W2I = {w: i + 1 for i, w in enumerate(sorted(LEX))}


def test_fmm_longest_match_and_singletons():
    assert W.fmm_segment("abcx", LEX) == ["abc", "x"]  # longest wins
    assert W.fmm_segment("abx", LEX) == ["ab", "x"]
    assert W.fmm_segment("zz", LEX) == ["z", "z"]
    assert W.fmm_segment("", LEX) == []
    assert W.fmm_segment("中国北京x", LEX) == ["中国", "北京", "x"]


def test_char_word_ids_exact_expansion():
    text = "abcxab"
    words = W.fmm_segment(text, LEX)  # [abc, x, ab]
    ids = W.char_word_ids(text, words, W2I)
    a, abc = W2I["ab"], W2I["abc"]
    assert ids == [abc, abc, abc, 0, a, a]  # OOV char -> 0 (the .get default)


def test_alignment_assert_fires_on_bad_segmentation():
    with pytest.raises(AssertionError):
        W.char_word_ids("abcd", ["ab"], W2I)  # words don't cover the text


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcxyz中国北京qsuper ", min_size=0, max_size=40))
def test_fmm_concat_invariant_property(text):
    # the invariant the reference asserts at data_loader.py:292: the
    # segmentation concatenates exactly back to the text, so per-char
    # word ids align 1:1 with chars
    t = text.lower().replace(" ", "")
    words = W.fmm_segment(t, LEX)
    assert "".join(words) == t
    assert len(W.char_word_ids(t, words, W2I)) == len(t)


def test_align_word_features_distributed(spark):
    rows = [(i, t) for i, t in enumerate(
        ["Spark Query ab", "abcx 中国", "", "zz 北京 abc"]
    )]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    lex_bc = spark.sparkContext.broadcast(LEX)
    w2i_bc = spark.sparkContext.broadcast(W2I)
    got = {
        r["doc_id"]: (r["n_chars"], r["word_ids"])
        for r in W.align_word_features(df, lex_bc, w2i_bc).collect()
    }
    assert len(got) == 4
    for i, t in rows:
        norm = t.lower().replace(" ", "")
        n, wids = got[i]
        assert n == len(norm) and len(wids) == len(norm)
    # planted: "sparkqueryab" -> spark(5) query(5) ab(2)
    s, q, ab = W2I["spark"], W2I["query"], W2I["ab"]
    assert got[0][1] == [s] * 5 + [q] * 5 + [ab] * 2


def test_segment_jieba_branch_via_stub(monkeypatch):
    """Exercise the jieba code path (wordseg.py segment) without jieba
    in the container: when _jieba is present, segment must return
    jieba.lcut(text) verbatim (data_loader.py:107) and ignore the
    FMM lexicon entirely."""
    from deepie_spark.functions import wordseg

    class _StubJieba:
        @staticmethod
        def lcut(text):
            # deliberately different from FMM so the test can tell
            # which branch ran; still concatenation-preserving
            return [text[i : i + 2] for i in range(0, len(text), 2)]

    monkeypatch.setattr(wordseg, "_jieba", _StubJieba)
    got = wordseg.segment("abcdef", lexicon={"abcdef"})
    assert got == ["ab", "cd", "ef"]  # NOT the FMM answer ["abcdef"]
    # alignment invariant holds for the jieba branch too
    ids = wordseg.char_word_ids("abcdef", got, {"ab": 7})
    assert ids == [7, 7, 0, 0, 0, 0]


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("jieba") is None,
    reason="jieba not installed in this container",
)
def test_segment_real_jieba_concat_invariant():
    """When real jieba IS available: lcut must concatenate back to the
    input (the reference's len(char_ids)==len(word_ids) assert depends
    on it), and segment() must route to it."""
    from deepie_spark.functions import wordseg

    text = "今天天气很好we test 123"
    words = wordseg.segment(text)
    assert "".join(words) == text
