from deepie_spark.functions.trie import AliasEntry, AliasTrie, build_alias_trie


def _trie():
    t = AliasTrie()
    t.insert(["star", "film"], AliasEntry(1, "Company", 1.0, "Star Film"))
    t.insert(["star", "film", "group"], AliasEntry(2, "Company", 2.0, "Star Film Group"))
    t.insert(["star"], AliasEntry(3, "Place", 1.0, "Star"))
    t.insert(["film"], AliasEntry(4, "Work", 1.0, "Film"))
    return t


def test_enumerate_matches_longest_first():
    t = _trie()
    toks = ["star", "film", "group", "x"]
    m = t.enumerate_matches(toks, 0)
    # longest-first, like trie.py:36-43 (which chops from the tail)
    assert [end for end, _ in m] == [3, 2, 1]
    assert m[0][1][0].canonical_id == 2
    assert t.enumerate_matches(toks, 3) == []


def test_match_all_every_position():
    t = _trie()
    toks = ["star", "film"]
    got = {(s, e, en.canonical_id) for s, e, en in t.match_all(toks)}
    assert got == {(0, 2, 1), (0, 1, 3), (1, 2, 4)}


def test_longest_nonoverlap_subsumption():
    # data.py:236-249 longest-first dedup: shorter matches covered by a
    # kept longer match are dropped
    t = _trie()
    toks = ["star", "film", "group"]
    kept = t.match_longest_nonoverlap(toks)
    assert [(s, e, en.canonical_id) for s, e, en in kept] == [(0, 3, 2)]


def test_shared_alias_multi_entry():
    t = AliasTrie()
    t.insert(["x"], AliasEntry(1, "A", 1.0, "x"))
    t.insert(["x"], AliasEntry(2, "B", 1.0, "x"))
    m = t.enumerate_matches(["x"], 0)
    assert len(m) == 1 and len(m[0][1]) == 2


def test_build_from_rows_uses_tokenizer():
    rows = [
        {"alias": "Star Film", "canonical_id": 1, "entity_type": "Company", "weight": 1.0},
        {"alias": "", "canonical_id": 9, "entity_type": "X", "weight": 1.0},
    ]
    t = build_alias_trie(rows, lambda s: s.lower().split())
    assert t.n_entries == 1
    assert t.match_all(["star", "film"])[0][2].alias == "Star Film"


def test_char_aho_corasick_matches_brute_force():
    import random

    from deepie_spark.functions.trie import CharAhoCorasick

    pats = {"he": "A", "she": "B", "his": "C", "hers": "D", "a": "E",
            "shers": "F", "ss": "G"}
    ac = CharAhoCorasick(pats)
    rnd = random.Random(0)

    def brute(text):
        return sorted(
            (i, len(p), v)
            for i in range(len(text))
            for p, v in pats.items()
            if text.startswith(p, i)
        )

    for _ in range(300):
        t = "".join(rnd.choice("hersiau") for _ in range(rnd.randint(0, 40)))
        assert sorted(ac.find_all(t)) == brute(t)


def test_char_aho_corasick_pickle_roundtrip():
    import pickle

    from deepie_spark.functions.trie import CharAhoCorasick

    ac = CharAhoCorasick({"ab": 1, "bc": [2, 3]})
    ac2 = pickle.loads(pickle.dumps(ac))
    assert ac2.find_all("xabcx") == ac.find_all("xabcx") == [
        (1, 2, 1), (2, 2, [2, 3])
    ]
