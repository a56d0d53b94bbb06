"""Triple assembly: decoded spans -> DuIE-2.0-shaped triple records.

Reproduces ``convert2ressult`` (run/DuIE/transformer_mpn_v2/
train.py:262-353) with its complex-slot regrouping:

  - per subject, po entries sorted by predicate id (train.py:274);
  - span -> surface via the offset arrays with the [CLS] -1 shift and
    '\\xa0' strip (train.py:275-280);
  - affiliate predicates never emit their own triple (train.py:292-293);
  - complex primaries collect affiliates from ``spoes[(o1, o2)]`` —
    i.e. rows whose cascade-subject is the primary's *object* — via the
    explicit ``schema.affiliate_of`` map, generalizing the hard-coded
    ``p + 1 == p_`` rule (train.py:312-314) and the ``p_ in [25,26,27]``
    cluster rule (train.py:330-344); the ``check_object`` surface-match
    fallback (train.py:295-304) is kept verbatim in spirit.

Pure python on plain data structures so the same function is the
single-row oracle and the ``applyInPandas``/fused-UDF kernel.
"""

from __future__ import annotations

from deepie_spark.config.schema import SpoSchema


def slice_span(
    context: str, starts: list[int], ends: list[int], s1: int, s2: int
) -> str:
    """Wrapped token span -> original surface, NBSP-stripped
    (train.py:275-280)."""
    return context[starts[s1 - 1] : ends[s2 - 1] + 1].replace("\xa0", "")


def assemble_triples(
    context: str,
    starts: list[int],
    ends: list[int],
    spoes: dict[tuple[int, int], list[tuple[int, int, int]]],
    schema: SpoSchema,
) -> list[dict]:
    """spoes: {(s1,s2): [(o1,o2,pid), ...]} in wrapped token indices."""
    primaries = set(schema.complex_primary_ids)
    affiliates = set(schema.complex_affiliate_ids)
    results: list[dict] = []

    for s, po in spoes.items():
        po = sorted(po, key=lambda x: x[2])
        sub_ent = slice_span(context, starts, ends, s[0], s[1])
        for o1, o2, p in po:
            if p in affiliates:
                continue
            pred = schema.by_id.get(p)
            if pred is None:
                continue
            obj_ent = slice_span(context, starts, ends, o1, o2)
            object_dict = {"@value": obj_ent}
            object_type_dict = {"@value": pred.object_type}

            if p in primaries:
                # check_object fallback: if the exact object span key is
                # missing, find any subject key with the same surface
                # (train.py:295-304)
                key = (o1, o2)
                if key not in spoes:
                    key = (-1, -1)
                    for (o1_, o2_) in spoes:
                        if slice_span(context, starts, ends, o1_, o2_) == obj_ent:
                            key = (o1_, o2_)
                            break
                candidate: dict[int, tuple[int, int]] = {}
                if key in spoes:
                    for o1_, o2_, p_ in spoes[key]:
                        if schema.affiliate_of.get(p_) == p:
                            candidate[p_] = (o1_, o2_)
                for p_, (o1_, o2_) in candidate.items():
                    ap = schema.by_id[p_]
                    object_dict[ap.slot] = slice_span(context, starts, ends, o1_, o2_)
                    object_type_dict[ap.slot] = ap.object_type

            results.append(
                {
                    "subject": sub_ent,
                    "subject_type": pred.subject_type,
                    "predicate": pred.base,
                    "object": object_dict,
                    "object_type": object_type_dict,
                }
            )
    return results
