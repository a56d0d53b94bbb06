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


FREQ = {"中国": 100, "国人": 50, "中": 10, "国": 10, "人": 10,
        "spark": 80, "park": 40, "ark": 5, "查询": 30}


def _brute_best_score(text, freq, total):
    """Enumerate EVERY segmentation built from dict words + single
    chars and return the max log-prob score (the global optimum the
    max-probability DP must reach)."""
    import math

    logtotal = math.log(total)
    n = len(text)
    best = {n: 0.0}

    def solve(i):
        if i in best:
            return best[i]
        b = -float("inf")
        for j in range(i, n):
            w = text[i : j + 1]
            if j == i or freq.get(w, 0) > 0:
                s = math.log(freq.get(w) or 1) - logtotal + solve(j + 1)
                b = max(b, s)
        best[i] = b
        return b

    return solve(0)


def _score(words, freq, total):
    import math

    lt = math.log(total)
    return sum(math.log(freq.get(w) or 1) - lt for w in words)


def test_mp_segment_golden_and_merging():
    total = sum(FREQ.values())
    # DP picks 中国+人 (log100+log10) over 中+国人 (log10+log50)
    assert W.mp_segment("中国人", FREQ, total) == ["中国", "人"]
    # dict word wins over char run; unknown latin singles merge (jieba's
    # NO_HMM buffering)
    assert W.mp_segment("sparkxyz", FREQ, total) == ["spark", "xyz"]
    # block splitting: punctuation per char, whitespace runs as one token
    assert W.mp_segment("中国, spark", FREQ, total) == ["中国", ",", " ", "spark"]
    assert W.mp_segment("", FREQ) == []


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="中国人spark查询xyz ,.", min_size=0, max_size=16))
def test_mp_segment_optimal_and_concat_property(text):
    """Within each han/latin block the DP must reach the brute-force
    optimal log-probability, and the whole segmentation must
    concatenate back to the input exactly (the alignment invariant)."""
    total = sum(FREQ.values())
    words = W.mp_segment(text, FREQ, total)
    assert "".join(words) == text
    for blk in W._RE_HAN.split(text):
        if blk and W._RE_HAN.fullmatch(blk):
            blk_words = W.mp_segment(blk, FREQ, total)
            # re-split merged latin buffers into DP tokens for scoring:
            # merged unknowns score the same as their single chars
            toks = []
            for w in blk_words:
                if w in FREQ or len(w) == 1:
                    toks.append(w)
                else:
                    toks.extend(w)
            got = _score(toks, FREQ, total)
            want = _brute_best_score(blk, FREQ, total)
            assert abs(got - want) < 1e-9, (blk, blk_words)


def test_align_word_features_with_freq_dict(spark):
    """The distributed operator routes through mp_segment when a freq
    dict is broadcast: '中国人' aligns as 中国中国人, not FMM output."""
    w2i = {w: i + 1 for i, w in enumerate(sorted(FREQ))}
    df = spark.createDataFrame([(1, "中国人 spark")], "doc_id bigint, text string")
    got = W.align_word_features(
        df,
        spark.sparkContext.broadcast(set(FREQ)),
        spark.sparkContext.broadcast(w2i),
        freq_bc=spark.sparkContext.broadcast(FREQ),
    ).first()
    zg, r, s = w2i["中国"], w2i["人"], w2i["spark"]
    assert got["word_ids"] == [zg, zg, r] + [s] * 5


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("jieba") is None,
    reason="jieba not installed in this container",
)
def test_mp_segment_matches_real_jieba_on_its_dict():
    """With jieba installed: mp_segment over jieba's own frequency dict
    must reproduce jieba.cut(HMM=False) token-for-token."""
    import jieba

    jieba.initialize()
    freq = dict(jieba.dt.FREQ)
    total = jieba.dt.total
    for text in ["今天天气很好", "中国人民银行发行数字货币", "we test 123, ok。"]:
        want = list(jieba.cut(text, HMM=False))
        got = W.mp_segment(text, {w: f for w, f in freq.items() if f}, total)
        assert got == want, (text, got, want)


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


def test_prepare_freq_hoisted_not_per_call(monkeypatch):
    """mp_segment must not rebuild the O(|dict|) prefix set per call:
    the identity-keyed memo makes repeated calls over one freq dict pay
    for preparation exactly once, and an explicitly prepared state is
    used as-is (zero prepare calls)."""
    calls = {"n": 0}
    real = W.prepare_freq

    def counting(freq):
        calls["n"] += 1
        return real(freq)

    monkeypatch.setattr(W, "prepare_freq", counting)
    W._PREPARED_CACHE.clear()
    f = dict(FREQ)
    want = W.mp_segment("中国人spark", f)
    assert calls["n"] == 1
    for _ in range(5):
        assert W.mp_segment("中国人spark", f) == want
    assert calls["n"] == 1  # memo hit: no rebuilds

    prepared = real(f)
    W._PREPARED_CACHE.clear()
    calls["n"] = 0
    assert W.mp_segment("中国人spark", f, prepared=prepared) == want
    assert W.segment("中国人spark", freq=f, prepared=prepared) == want
    assert calls["n"] == 0  # hoisted state bypasses preparation entirely
