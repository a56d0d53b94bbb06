import numpy as np

from deepie_spark.operators.decode import decode_po, decode_subjects


def _sub_grid(n, starts, ends):
    g = np.zeros((n, 2), dtype=np.float32)
    for i in starts:
        g[i, 0] = 0.95
    for j in ends:
        g[j, 1] = 0.95
    return g


def test_subject_thresholds_and_pairing():
    # start pairs with FIRST end >= start (multi_pointer_net.py:79-93)
    g = _sub_grid(10, starts=[2, 5], ends=[3, 7])
    assert decode_subjects(g, 10) == [(2, 3), (5, 7)]


def test_subject_start_with_two_later_ends_takes_first():
    g = _sub_grid(10, starts=[2], ends=[4, 6])
    assert decode_subjects(g, 10) == [(2, 4)]


def test_subject_cls_sep_excluded():
    # i==0 skipped; i > n-2 skipped; end beyond n-2 skipped
    g = _sub_grid(6, starts=[0, 5], ends=[5])
    assert decode_subjects(g, 6) == []
    g2 = _sub_grid(6, starts=[2], ends=[5])  # end == n-1 -> dropped
    assert decode_subjects(g2, 6) == []


def test_subject_below_threshold_ignored():
    g = np.zeros((8, 2), dtype=np.float32)
    g[2, 0] = 0.55  # below 0.6 start threshold
    g[3, 1] = 0.95
    assert decode_subjects(g, 8) == []
    g[2, 0] = 0.95
    g[3, 1] = 0.45  # below 0.5 end threshold
    assert decode_subjects(g, 8) == []


def _po_grid(n, p, entries):
    g = np.zeros((n, p, 2), dtype=np.float32)
    for (s, e, pid) in entries:
        g[s, pid, 0] = 0.95
        g[e, pid, 1] = 0.95
    return g


def test_po_basic_and_predicate_equality():
    g = _po_grid(10, 4, [(2, 3, 1), (5, 6, 2)])
    assert decode_po(g, 10) == [(2, 3, 1), (5, 6, 2)]


def test_po_break_after_first_matching_end():
    # two ends for same predicate: the FIRST end >= start wins and the
    # scan breaks (train.py:374-379)
    g = np.zeros((10, 3, 2), dtype=np.float32)
    g[2, 1, 0] = 0.95
    g[4, 1, 1] = 0.95
    g[6, 1, 1] = 0.95
    assert decode_po(g, 10) == [(2, 4, 1)]


def test_po_bounds():
    g = _po_grid(6, 2, [(0, 2, 0), (5, 5, 1)])  # start 0 and start n-1 dropped
    assert decode_po(g, 6) == []


def test_po_end_before_start_skipped():
    g = np.zeros((10, 2, 2), dtype=np.float32)
    g[5, 0, 0] = 0.95
    g[3, 0, 1] = 0.95  # end < start, no match
    assert decode_po(g, 10) == []
