"""Cascade decode: grids -> spans, with the reference's exact
thresholds and tie-breaking.

``decode_subjects`` reproduces models/spo_net/multi_pointer_net.py:79-93:
start prob > 0.6, end prob > 0.5, each start pairs with the *first* end
>= start, spans touching [CLS]/[SEP] are dropped.

``decode_po`` reproduces run/DuIE/transformer_mpn_v2/train.py:371-379:
start > 0.6, end > 0.5 over the [L,P,2] grid, np.where row-major
candidate order, predicate equality, and *break after the first
matching end* — the subtle tie-break the survey flags as
P/R-drift-critical (SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np

SUBJ_START_T = 0.6
SUBJ_END_T = 0.5
PO_START_T = 0.6
PO_END_T = 0.5


# the non-BERT ETL-Span cascade decodes at 0.5/0.4 instead
# (models/spo_net/etl_span.py:106-107; etl_span/train.py:292-293)
ETL_SPAN_THRESHOLDS = (0.5, 0.4)


def decode_subjects(
    sub_grid: np.ndarray,
    n_wrapped: int,
    start_t: float = SUBJ_START_T,
    end_t: float = SUBJ_END_T,
) -> list[tuple[int, int]]:
    """sub_grid: [L,2]; returns inclusive (start, end) wrapped spans."""
    start = np.where(sub_grid[:, 0] > start_t)[0]
    end = np.where(sub_grid[:, 1] > end_t)[0]
    subjects: list[tuple[int, int]] = []
    for i in start:
        if i == 0 or i > n_wrapped - 2:
            continue
        j = end[end >= i]
        if len(j) > 0:
            j = j[0]
            if j > n_wrapped - 2:
                continue
            subjects.append((int(i), int(j)))
    return subjects


def decode_po(
    po_grid: np.ndarray,
    n_wrapped: int,
    start_t: float = PO_START_T,
    end_t: float = PO_END_T,
) -> list[tuple[int, int, int]]:
    """po_grid: [L,P,2]; returns (obj_start, obj_end, predicate_id) in
    wrapped token indices."""
    start = np.where(po_grid[:, :, 0] > start_t)
    end = np.where(po_grid[:, :, 1] > end_t)
    out: list[tuple[int, int, int]] = []
    for _start, predicate1 in zip(*start):
        if _start > n_wrapped - 2 or _start == 0:
            continue
        for _end, predicate2 in zip(*end):
            if _start <= _end <= n_wrapped - 2 and predicate1 == predicate2:
                out.append((int(_start), int(_end), int(predicate1)))
                break
    return out


# ---- sparse decode twins ----------------------------------------------------
#
# The scorer's grids are almost-all-zero: values exist only at
# scan-believed positions.  Materializing a dense [L,2] / [L,P,2] zeros
# array per subject and re-discovering its support with np.where was
# ~20% of the extraction kernel.  These twins consume the support
# directly — SAME values, SAME threshold comparisons, SAME candidate
# order (np.where over [L,2]/[L,P,2] enumerates row-major, i.e.
# ascending position / ascending (position, predicate) — exactly the
# sorted order of the support lists) — so they are output-identical to
# the dense forms for ANY values, not just the gate-margin ones
# (fuzz-tested against the dense forms in test_decode_sparse).


def decode_subjects_sparse(
    start_cands: list[tuple[int, float]],
    end_cands: list[tuple[int, float]],
    n_wrapped: int,
    start_t: float = SUBJ_START_T,
    end_t: float = SUBJ_END_T,
) -> list[tuple[int, int]]:
    """``start_cands``/``end_cands``: the grid columns' support as
    position-ascending (pos, value) lists.  Output == decode_subjects
    over the dense [L,2] grid with those values.

    The thresholds round through float32 first: comparing a float32
    grid against a python-float threshold demotes the SCALAR to float32
    under numpy's value-based promotion, so the dense comparison is
    ``float32(v) > float32(t)`` — the sparse twin must be too (caught
    by the fuzz test at v == float32(0.6))."""
    start_t = float(np.float32(start_t))
    end_t = float(np.float32(end_t))
    end_pos = [p for p, v in end_cands if v > end_t]
    subjects: list[tuple[int, int]] = []
    for i, v in start_cands:
        if v <= start_t or i == 0 or i > n_wrapped - 2:
            continue
        for j in end_pos:  # first end >= start (list is ascending)
            if j >= i:
                if j <= n_wrapped - 2:
                    subjects.append((i, j))
                break
    return subjects


def decode_po_sparse(
    start_cands: list[tuple[int, int, float]],
    end_cands: list[tuple[int, int, float]],
    n_wrapped: int,
    start_t: float = PO_START_T,
    end_t: float = PO_END_T,
) -> list[tuple[int, int, int]]:
    """``start_cands``/``end_cands``: the [L,P,2] grid's support as
    (pos, predicate_id, value) lists sorted by (pos, predicate_id) —
    np.where's row-major order.  Output == decode_po over the dense
    grid with those values (thresholds float32-rounded like the dense
    comparison — see decode_subjects_sparse)."""
    start_t = float(np.float32(start_t))
    end_t = float(np.float32(end_t))
    ends = [(p, pid) for p, pid, v in end_cands if v > end_t]
    out: list[tuple[int, int, int]] = []
    for pos, pid, v in start_cands:
        if v <= start_t or pos > n_wrapped - 2 or pos == 0:
            continue
        for epos, epid in ends:
            if pos <= epos <= n_wrapped - 2 and pid == epid:
                out.append((pos, epos, pid))
                break
    return out
