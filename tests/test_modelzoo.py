import numpy as np

from deepie_spark.functions.trie import AliasEntry, AliasTrie
from deepie_spark.operators.decode import (
    ETL_SPAN_THRESHOLDS,
    decode_subjects,
)
from deepie_spark.operators.modelzoo import (
    find_entity,
    gaz_bmes_features,
    selection_decode,
    sequential_pointer_pairs,
)


def test_sequential_pointer_pairs():
    p1 = np.array([-1.0, 2.0, -1, -1, 3.0, -1])
    p2 = np.array([-1.0, -1, 1.0, -1, -1, 2.0])
    assert sequential_pointer_pairs(p1, p2) == [(1, 3), (4, 6)]


def test_sequential_pointer_pairs_end_before_start_waits():
    # an end seen before any start stays pending until a start appears;
    # the pair is emitted only once start <= end (mpn.py:85-92)
    p1 = np.array([-1.0, -1, 2.0, -1])
    p2 = np.array([-1.0, 1.0, -1, 2.0])
    # end at 1 recorded first; start at 2 > end 1 -> not emitted until
    # the sweep finds no new end... reference emits nothing here until
    # a later end: at idx 3 end stays 1 (first-end wins), start=2>1
    assert sequential_pointer_pairs(p1, p2) == []


def test_find_entity_backward_scan():
    text = list("abcdef")
    tags = ["O", "B", "I", "I", "O", "B"]
    assert find_entity(3, text, tags) == "bcd"  # tail of B-I-I
    assert find_entity(5, text, tags) == "f"    # single B at end
    assert find_entity(2, text, tags) == ""     # mid-entity, not a tail
    assert find_entity(0, text, tags) == ""
    assert find_entity(99, text, tags) == ""


def test_selection_decode():
    chars = list("abcde")
    tags = ["B", "I", "O", "B", "O"]
    grid = np.zeros((5, 2, 5))
    grid[1, 0, 3] = 0.9   # subject tail 1 ("ab"), rel 0, object tail 3 ("d")
    grid[2, 1, 3] = 0.9   # subject tail 2 is O -> dropped
    out = selection_decode(chars, tags, grid, {0: "rel0", 1: "rel1"})
    assert out == [("ab", "rel0", "d")]


def test_etl_span_threshold_variant():
    g = np.zeros((8, 2), dtype=np.float32)
    g[2, 0] = 0.55  # below BERT 0.6 start but above ETL 0.5
    g[3, 1] = 0.45  # below BERT 0.5 end but above ETL 0.4
    assert decode_subjects(g, 8) == []
    s_t, e_t = ETL_SPAN_THRESHOLDS
    assert decode_subjects(g, 8, s_t, e_t) == [(2, 3)]


def test_gaz_bmes_features():
    t = AliasTrie()
    t.insert(["a", "b", "c"], AliasEntry(7, "X", 3.0, "abc"))
    t.insert(["b"], AliasEntry(9, "Y", 2.0, "b"))
    buckets = gaz_bmes_features(["a", "b", "c", "d"], t)
    assert (7, 3.0) in buckets[0]["B"]
    assert (7, 3.0) in buckets[1]["M"]
    assert (7, 3.0) in buckets[2]["E"]
    assert (9, 2.0) in buckets[1]["S"]
    # empty buckets carry the null entry (functions.py:119-123)
    assert buckets[3]["B"] == [(0, 1.0)]
    assert buckets[0]["S"] == [(0, 1.0)]
