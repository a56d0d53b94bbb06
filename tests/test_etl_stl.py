"""ETL-STL cascade: exact decode semantics + end-to-end assembly.

Covers models/spo_net/etl_stl.py:109-127 (subject pairing 0.5/0.4),
run/relation_extraction/etl_stl/train.py:263-282 (find_tag_position
quirks), spo_config_v1.py:59-65 (even/odd BIES id layout), and the
fused distributed pass == single-row python oracle invariant.
"""

import numpy as np
import pytest

from deepie_spark.config.schema import SYNTH_SCHEMA
from deepie_spark.operators import etl_stl as E

LABELS = ["PAD", "O", "B-a", "I-a", "B-b", "I-b"]


# ---- find_tag_position (train.py:263-282) ----------------------------------


def test_find_tag_position_basic_and_quirks():
    f = E.find_tag_position
    # B I I O -> one span
    assert f([2, 3, 3, 1], 4, LABELS) == [(0, 2, "a")]
    # early close at mismatch (end=k-1), resume at end+1
    assert f([2, 3, 4, 5, 1], 5, LABELS) == [(0, 1, "a"), (2, 3, "b")]
    # unclosed run extends to seq_len-1 (the flag=True tail)
    assert f([1, 2, 3, 3], 4, LABELS) == [(1, 3, "a")]
    # bare I tags (odd ids) never open a span
    assert f([3, 3, 1], 3, LABELS) == []
    # adjacent B B -> two singleton spans
    assert f([2, 2, 1], 3, LABELS) == [(0, 0, "a"), (1, 1, "a")]
    # PAD never opens (id 0 is even but excluded)
    assert f([0, 0, 2, 3], 4, LABELS) == [(2, 3, "a")]


def test_bies_label_layout_even_odd():
    labels = E.build_bies_labels(SYNTH_SCHEMA)
    assert labels[0] == "PAD" and labels[1] == "O"
    for i in range(2, len(labels), 2):
        assert labels[i].startswith("B-") and labels[i + 1].startswith("I-")
        assert labels[i][2:] == labels[i + 1][2:]


# ---- subject pairing (etl_stl.py:109-127) -----------------------------------


def test_decode_subjects_stl_thresholds_and_bounds():
    g = np.zeros((6, 2), dtype=np.float32)
    g[1, 0] = 0.51  # start above 0.5
    g[3, 1] = 0.41  # end above 0.4
    g[4, 0] = 0.50  # NOT above threshold (strict >)
    g[5, 1] = 0.40  # NOT above threshold
    assert E.decode_subjects_stl(g, 6) == [(1, 3)]
    # seq_len bound drops spans past the context
    assert E.decode_subjects_stl(g, 3) == []
    # each start takes the FIRST end >= it; ends are reusable
    g2 = np.zeros((6, 2), dtype=np.float32)
    g2[0, 0] = 0.9
    g2[1, 0] = 0.9
    g2[3, 1] = 0.9
    assert E.decode_subjects_stl(g2, 6) == [(0, 3), (1, 3)]


# ---- planted-gold end-to-end -------------------------------------------------


ALIASES = [{"alias": a} for a in ("Acme Corp", "Alice Smith", "Paris", "France")]


@pytest.fixture(scope="module")
def extractor():
    return E.StlExtractor(SYNTH_SCHEMA, ALIASES)


def test_planted_gold_pr_is_one(extractor):
    cases = [
        (
            "Acme Corp was founded by Alice Smith.",
            {("acmecorp", "founder", "alicesmith")},
        ),
        (
            "France has the capital Paris.",
            {("france", "capital", "paris")},
        ),
        (
            "Acme Corp grossed a total of 5000. France has the capital Paris.",
            {("acmecorp", "box_office", "5000"), ("france", "capital", "paris")},
        ),
        ("The weather stayed calm all week.", set()),
        ("", set()),
    ]
    tp = fp = fn = 0
    for text, gold in cases:
        pred = set(extractor.extract_page_py(text))
        tp += len(pred & gold)
        fp += len(pred - gold)
        fn += len(gold - pred)
    assert fp == 0 and fn == 0 and tp == 4  # P = R = 1.0


def test_viterbi_path_recovers_planted_tags(extractor):
    text = E.norm_duie1("Acme Corp was founded by Alice Smith.")
    scan = extractor.scan(text)
    assert len(scan) == 1
    s1, s2, o1, o2, pid = scan[0]
    em = extractor.emissions(scan, (s1, s2), len(text))
    zeros = np.zeros((len(extractor.labels), len(extractor.labels)))
    from deepie_spark.functions.crf import viterbi_decode

    tags = viterbi_decode(em, zeros)
    b_id, i_id = extractor.tag_ids[pid]
    assert tags[o1] == b_id
    assert all(tags[k] == i_id for k in range(o1 + 1, o2 + 1))
    assert all(t == extractor.label2id["O"] for t in tags[:o1])


def test_truncation_at_max_len():
    ex = E.StlExtractor(SYNTH_SCHEMA, ALIASES, max_len=20)
    # the relation sits beyond char 20 -> truncated away, no crash
    text = "x" * 30 + " France has the capital Paris."
    assert ex.extract_page_py(text) == []


# ---- distributed == single-row oracle ----------------------------------------


def test_fused_equals_python_oracle_and_batch_invariant(spark):
    from deepie_spark.sources.synth import corpus_dataframes, gen_world

    world = gen_world()
    pages_df, _, _ = corpus_dataframes(spark, 40)
    ex = E.StlExtractor(SYNTH_SCHEMA, world.alias_rows)
    bc = spark.sparkContext.broadcast(ex)

    pages = pages_df.select("url", "text").collect()
    want = sorted(
        (r["url"], s, p, o)
        for r in pages
        for s, p, o in ex.extract_page_py(r["text"])
    )
    assert len(want) > 20  # the synth corpus actually exercises the path

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    outs = []
    for n in ("1", "1024"):
        spark.conf.set(key, n)
        got = sorted(
            (r["url"], r["subject"], r["predicate"], r["object"])
            for r in E.extract_stl_triples(pages_df, bc).collect()
        )
        outs.append(got)
    spark.conf.unset(key)
    assert outs[0] == want and outs[1] == want


def test_stl_plan_is_shuffle_free(spark):
    from deepie_spark.sources.synth import corpus_dataframes, gen_world

    def plan_of(df):
        jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        return df._jdf.queryExecution().explainString(jmode)

    world = gen_world()
    pages_df, _, _ = corpus_dataframes(spark, 10)
    bc = spark.sparkContext.broadcast(E.StlExtractor(SYNTH_SCHEMA, world.alias_rows))
    p = plan_of(E.extract_stl_triples(pages_df, bc))
    assert "Exchange" not in p and "MapInPandas" in p


def test_value_spans_ac_equals_find_loop(extractor):
    """The AC candidate generator must reproduce the per-surface
    str.find scan exactly (spans set equality on adversarial text)."""
    texts = [
        "",
        "no hits at all 123",
        "".join(extractor.surfaces[:5]) * 3,
        (extractor.surfaces[0] if extractor.surfaces else "x") * 4 + "99",
    ]
    for text in texts:
        spans = set()
        for s in extractor.surfaces:
            at = text.find(s)
            while at >= 0:
                spans.add((at, at + len(s) - 1))
                at = text.find(s, at + 1)
        i, n = 0, len(text)
        while i < n:
            if text[i].isdigit():
                j = i
                while j + 1 < n and text[j + 1].isdigit():
                    j += 1
                spans.add((i, j))
                i = j + 1
            else:
                i += 1
        assert extractor._value_spans(text) == sorted(spans)


def test_scan_flat_under_20k_alias_dictionary():
    """Candidate generation must be O(|text|), not O(|dict|*|text|):
    growing the alias dictionary 100x must not grow per-page scan time
    proportionally (the 100-TB executor-CPU axis)."""
    import time

    from deepie_spark.config.schema import SYNTH_SCHEMA
    from deepie_spark.sources.synth import gen_world

    world = gen_world()
    small = E.StlExtractor(SYNTH_SCHEMA, world.alias_rows)
    big_rows = list(world.alias_rows) + [
        {"alias": f"zz{i:05d}q", "canonical_id": 10_000 + i,
         "entity_type": "Noise", "weight": 1.0}
        for i in range(20_000)
    ]
    big = E.StlExtractor(SYNTH_SCHEMA, big_rows)
    text = E.norm_duie1("".join(a["alias"] for a in world.alias_rows[:30]) + "12月")

    # results on text containing no noise aliases must be identical
    assert big.extract_page_py(text) == small.extract_page_py(text)

    reps = 200
    t0 = time.time()
    for _ in range(reps):
        small.scan(text)
    t_small = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        big.scan(text)
    t_big = time.time() - t0
    # 100x dictionary -> same-order scan cost (generous 5x bound for
    # host noise; the old find-loop would be ~100x)
    assert t_big < max(t_small, 1e-3) * 5, (t_small, t_big)
