"""Closed predicate ontology (the reference's ``spo_config``).

The reference hard-codes a predicate->id dict plus parallel
subject_type/object_type arrays (reference: config/spo_config_v2.py:1-57,
60-232) and hard-codes the complex-predicate id sets
``[6, 8, 24, 30, 44]`` / ``[7, 9, 25, 26, 27, 31, 45]`` inside the reader
and decoder (reference: run/DuIE/transformer_mpn_v2/data_loader_v2.py:232-233,
train.py:269-270).  We lift all of that into a declarative ``SpoSchema``
so the id arithmetic is data, not code; the synthetic ontology below
preserves the reference's exact id layout for the complex clusters
(6/7 pair -> the ``p + 1 == p_`` regroup rule, 24/{25,26,27} cluster ->
the award-style regroup rule, train.py:306-344).

Each predicate additionally carries per-language *trigger phrases* used
by the deterministic scoring model (our stand-in for the trained CasRel
weights — see deepie_spark/functions/scoring.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Predicate:
    pid: int
    label: str  # slot-qualified for complex predicates ("award_at_value")
    base: str  # label with the slot stripped
    slot: str  # "@value" for simple/primary, else the slot name
    subject_type: str
    object_type: str
    triggers: dict = field(default_factory=dict)  # lang -> trigger phrase

    @property
    def is_complex_slot(self) -> bool:
        return self.label != self.base


class SpoSchema:
    """Queryable wrapper over a predicate list.

    ``affiliate_of`` encodes the reference's regroup arithmetic
    (train.py:312-314 ``p + 1 == p_`` and train.py:324-344
    ``p_ in [25, 26, 27]`` for ``p == 24``) as an explicit map.
    """

    def __init__(self, predicates: list[Predicate], affiliate_of: dict[int, int]):
        self.predicates = sorted(predicates, key=lambda p: p.pid)
        self.by_id = {p.pid: p for p in self.predicates}
        self.by_label = {p.label: p for p in self.predicates}
        self.affiliate_of = dict(affiliate_of)
        self.complex_affiliate_ids = sorted(affiliate_of)
        self.complex_primary_ids = sorted(set(affiliate_of.values()))
        self.num_labels = max(self.by_id) + 1

    def affiliates(self, primary_id: int) -> list[int]:
        return [a for a, p in self.affiliate_of.items() if p == primary_id]

    def to_rows(self) -> list[dict]:
        """Rows for the broadcast predicate dimension table."""
        return [
            {
                "predicate_id": p.pid,
                "predicate": p.label,
                "base_predicate": p.base,
                "slot": p.slot,
                "subject_type": p.subject_type,
                "object_type": p.object_type,
                "is_complex_primary": p.pid in self.complex_primary_ids,
                "is_complex_affiliate": p.pid in self.complex_affiliate_ids,
                "affiliate_of": self.affiliate_of.get(p.pid),
            }
            for p in self.predicates
        ]


def _p(pid, label, subj, obj, en, zh, base=None, slot="@value"):
    base = base or label
    return Predicate(
        pid=pid,
        label=label,
        base=base,
        slot=slot,
        subject_type=subj,
        object_type=obj,
        triggers={"en": en, "zh": zh},
    )


# Synthetic ASCII ontology mirroring the DuIE-2020 shape
# (config/spo_config_v2.py): simple predicates, one p/p+1 complex pair at
# ids 6/7 (and 8/9), and the 24/{25,26,27} cluster.  Ids are sparse on
# purpose — the label grid is sized max_id + 1, as in the reference where
# the grid is len(spo_config) (data_loader_v2.py:340).
SYNTH_PREDICATES = [
    _p(0, "founder", "Company", "Person", "was founded by", "的创始人是"),
    _p(1, "author", "Work", "Person", "was written by", "的作者是"),
    _p(2, "singer", "Song", "Person", "is sung by", "的演唱者是"),
    _p(3, "capital", "Country", "City", "has the capital", "的首都是"),
    _p(4, "ceo", "Company", "Person", "is led by", "的总裁是"),
    _p(5, "star", "Film", "Person", "is starring", "的主演是"),
    _p(6, "release_date", "Film", "Date", "was released on", "的上映时间是",
       base="release_date", slot="@value"),
    _p(7, "release_date_in_area", "Film", "Area", "in the region of", "上映地区为",
       base="release_date", slot="in_area"),
    _p(8, "box_office", "Film", "Number", "grossed a total of", "的票房是",
       base="box_office", slot="@value"),
    _p(9, "box_office_in_area", "Film", "Area", "within the market of", "票房地区为",
       base="box_office", slot="in_area"),
    _p(10, "nationality", "Person", "Country", "holds the nationality of", "的国籍是"),
    _p(11, "birthplace", "Person", "Place", "was born in", "的出生地是"),
    _p(24, "award", "Person", "Award", "won the award", "获得了奖项",
       base="award", slot="@value"),
    _p(25, "award_in_work", "Person", "Work", "for the work", "获奖作品为",
       base="award", slot="in_work"),
    _p(26, "award_on_date", "Person", "Date", "on the date", "获奖时间为",
       base="award", slot="on_date"),
    _p(27, "award_period", "Person", "Number", "for the period", "获奖届数为",
       base="award", slot="period"),
]

SYNTH_AFFILIATE_OF = {7: 6, 9: 8, 25: 24, 26: 24, 27: 24}

SYNTH_SCHEMA = SpoSchema(SYNTH_PREDICATES, SYNTH_AFFILIATE_OF)
