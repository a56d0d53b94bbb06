from deepie_spark.config.schema import SYNTH_SCHEMA
from deepie_spark.operators.assemble import assemble_triples, slice_span


def _ctx(words):
    """Build context + wrapped-token offset arrays where token k+1 maps to
    word k (single-token words, space separated)."""
    starts, ends, pos = [], [], 0
    for w in words:
        starts.append(pos)
        ends.append(pos + len(w) - 1)
        pos += len(w) + 1
    return " ".join(words), starts, ends


def test_slice_span_strips_nbsp():
    ctx = "a\xa0b c"
    # token 1 covers chars 0..2
    assert slice_span(ctx, [0], [2], 1, 1) == "ab"


def test_simple_triple():
    ctx, starts, ends = _ctx(["Acme", "was", "founded", "by", "Bob"])
    spoes = {(1, 1): [(5, 5, 0)]}  # founder
    out = assemble_triples(ctx, starts, ends, spoes, SYNTH_SCHEMA)
    assert out == [
        {
            "subject": "Acme",
            "subject_type": "Company",
            "predicate": "founder",
            "object": {"@value": "Bob"},
            "object_type": {"@value": "Person"},
        }
    ]


def test_affiliate_never_emits_own_triple():
    ctx, starts, ends = _ctx(["F", "x", "D", "y", "A"])
    spoes = {(3, 3): [(5, 5, 7)]}  # release_date_in_area alone
    assert assemble_triples(ctx, starts, ends, spoes, SYNTH_SCHEMA) == []


def test_complex_regroup_pair_rule():
    # primary p=6 object D; affiliate p=7 hangs off subject D
    ctx, starts, ends = _ctx(["F", "D", "A"])
    spoes = {(1, 1): [(2, 2, 6)], (2, 2): [(3, 3, 7)]}
    out = assemble_triples(ctx, starts, ends, spoes, SYNTH_SCHEMA)
    assert len(out) == 1
    t = out[0]
    assert t["predicate"] == "release_date"
    assert t["object"] == {"@value": "D", "in_area": "A"}
    assert t["object_type"] == {"@value": "Date", "in_area": "Area"}


def test_complex_regroup_cluster_rule():
    # p=24 primary with {25,26,27} affiliates (train.py:324-344)
    ctx, starts, ends = _ctx(["P", "A", "W", "D", "N"])
    spoes = {
        (1, 1): [(2, 2, 24)],
        (2, 2): [(3, 3, 25), (4, 4, 26), (5, 5, 27)],
    }
    out = assemble_triples(ctx, starts, ends, spoes, SYNTH_SCHEMA)
    assert len(out) == 1
    assert out[0]["object"] == {
        "@value": "A", "in_work": "W", "on_date": "D", "period": "N"
    }


def test_check_object_fallback_surface_match():
    # primary's object span key absent, but another span with the SAME
    # surface exists -> affiliates found via surface equality
    # (train.py:295-304)
    ctx, starts, ends = _ctx(["F", "D", "A", "D"])
    # primary points at second "D" (token 4); affiliates keyed on first
    # "D" (token 2)
    spoes = {(1, 1): [(4, 4, 6)], (2, 2): [(3, 3, 7)]}
    out = assemble_triples(ctx, starts, ends, spoes, SYNTH_SCHEMA)
    assert out[0]["object"] == {"@value": "D", "in_area": "A"}


def test_po_sorted_by_predicate_id():
    ctx, starts, ends = _ctx(["S", "O1", "O2"])
    spoes = {(1, 1): [(3, 3, 5), (2, 2, 0)]}
    out = assemble_triples(ctx, starts, ends, spoes, SYNTH_SCHEMA)
    assert [t["predicate"] for t in out] == ["founder", "star"]
