"""Gold-span search + non-overlap placement (data_util.py:413-421,
data_loader_v2.py:116-163)."""

from pyspark.sql import functions as F

from deepie_spark.operators import goldspan as G


def test_search_basic():
    assert G.search(["b", "c"], ["a", "b", "c", "d"]) == 1
    assert G.search(["x"], ["a", "b"]) == -1
    assert G.search([], ["a"]) == 0  # empty pattern matches at 0
    assert G.search(["a", "b"], ["a"]) == -1


def test_search_spo_longer_subject_placed_first():
    toks = list("xxabcyyabyy")
    # subject 'abc' (3) > object 'ab' (2): subject claims 2..4, object
    # must skip its overlapping first occurrence at 2 and take 7
    s, o = G.search_spo_index(toks, list("abc"), list("ab"))
    assert (s, o) == (2, 7)


def test_search_spo_longer_object_placed_first():
    toks = list("xxabyyabcyy")
    s, o = G.search_spo_index(toks, list("ab"), list("abc"))
    assert o == 6  # object 'abc' first
    assert s == 2  # subject 'ab' at 2 does not overlap [6,9)


def test_search_spo_equal_length_self_reference():
    # "abc loves abc": equal lengths -> object placed first at 0,
    # subject takes the non-overlapping second occurrence
    toks = list("abc") + ["loves"] + list("abc")
    s, o = G.search_spo_index(toks, list("abc"), list("abc"))
    assert o == 0 and s == 4


def test_search_spo_unplaceable():
    # subject placed, object absent -> (-1 only on the missing side)
    s, o = G.search_spo_index(list("abcdef"), list("abc"), list("zz"))
    assert s == 0 and o == -1
    # longer object absent: forbidden stays None, subject still places
    s2, o2 = G.search_spo_index(list("ab"), list("ab"), list("abcd"))
    assert o2 == -1 and s2 == 0
    s3, o3 = G.search_spo_index(list("xxab"), list("ab"), list("abcd"))
    assert o3 == -1 and s3 == 2


def test_search_spo_overlap_scan_continues():
    # subject 'abab' claims 0..3; object 'ab' occurrences at 0 and 2
    # overlap, the one at 4 wins
    toks = list("ababab")
    s, o = G.search_spo_index(toks, list("abab"), list("ab"))
    assert s == 0 and o == 4


def test_gold_spans_distributed(spark, extractor):
    from deepie_spark.operators.extract import stage_tokens
    from deepie_spark.sources.synth import corpus_dataframes

    pages_df, gold_df, _ = corpus_dataframes(spark, 60)
    bc = spark.sparkContext.broadcast(extractor)
    tokens = stage_tokens(pages_df.select("url", "lang", "text"), bc)
    gold = gold_df.select(
        "url", "subject", "predicate",
        F.col("object")["@value"].alias("object_value"),
    )
    out = G.gold_spans(tokens, gold, bc, broadcast_gold=True)
    rows = out.collect()
    assert len(rows) == gold.count()
    placed = [r for r in rows if r["subject_start"] >= 0 and r["object_start"] >= 0]
    # the synthetic gold surfaces are in-text by construction: nearly
    # everything places (a few may collide with truncation)
    assert len(placed) >= 0.9 * len(rows)
    # placed spans never overlap (the whole point of the forbidden zone)
    # the reference's forbidden-zone rule: the SECOND-placed (shorter)
    # surface may not START inside the first-placed span
    for r in placed:
        s0, s1 = r["subject_start"], r["subject_start"] + r["subject_len"]
        o0, o1 = r["object_start"], r["object_start"] + r["object_len"]
        if r["subject_len"] > r["object_len"]:
            assert not (s0 <= o0 < s1)
        else:
            assert not (o0 <= s0 < o1)
