"""ETL-STL cascade: subject pointer + per-subject sequence-labeling
(CRF) object decode, assembled end-to-end.

Reference semantics (models/spo_net/etl_stl.py:37-203 + run/
relation_extraction/etl_stl/train.py:236-282 + config/
spo_config_v1.py:59-65):

  - input text is DuIE-1.0-normalized: ``text.lower().replace(' ','')``
    (etl_stl/data_loader.py:107) — char-level, no BERT wrap;
  - subject decode over a [L,2] grid: start prob > 0.5, end prob > 0.4,
    each start pairs with the FIRST end >= it, spans beyond the context
    are skipped (etl_stl.py:109-127);
  - per-subject object decode: a [L,K] emission matrix over the BIES
    label map {PAD:0, O:1, then B-rel/I-rel alternating so B ids are
    EVEN} (spo_config_v1.py:59-65), decoded by CRF Viterbi
    (etl_stl.py:185-186, our functions/crf.py kernel), then
    ``find_tag_position`` (train.py:263-282) scans the tag ids: a span
    opens at an even non-zero id, extends while the next id equals
    open-id+1, closes at the first mismatch (end=k-1) or runs to
    seq_len-1 if unbroken, and the scan resumes at end+1;
  - triples are (tokens[s1:s2+1], tag, tokens[o1:o2+1]) — flat s/p/o
    strings (train.py:247-253), no complex-object regrouping.

As with the flagship CasRel path, the trained net is replaced by a
deterministic trigger/alias scorer (see functions/scoring.py docstring
for the stance); every threshold, pairing rule, label-id layout and
the Viterbi + tag-scan decode are the reference's, exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from deepie_spark.config.schema import SpoSchema
from deepie_spark.functions.crf import viterbi_decode_batch
from deepie_spark.functions.trie import CharAhoCorasick

SUBJ_START_T = 0.5
SUBJ_END_T = 0.4
PROB = 0.95
PLANT_SCORE = 10.0
O_SCORE = 1.0

STL_TRIPLES_DDL = "url string, subject string, predicate string, object string"


def norm_duie1(text: str) -> str:
    """DuIE 1.0 ingest normalization (etl_stl/data_loader.py:107)."""
    return (text or "").lower().replace(" ", "")


def build_bies_labels(schema: SpoSchema) -> list[str]:
    """['PAD', 'O', 'B-rel0', 'I-rel0', 'B-rel1', ...] — B ids even,
    I ids odd, exactly the spo_config_v1.py:59-65 layout that
    ``find_tag_position``'s even/odd arithmetic depends on."""
    labels = ["PAD", "O"]
    for p in schema.predicates:  # sorted by pid
        labels.append(f"B-{p.label}")
        labels.append(f"I-{p.label}")
    return labels


def decode_subjects_stl(
    sub_grid: np.ndarray, seq_len: int,
    start_t: float = SUBJ_START_T, end_t: float = SUBJ_END_T,
) -> list[tuple[int, int]]:
    """Char-level subject pairing (etl_stl.py:109-127): no [CLS] wrap,
    bounds checked against the context length."""
    start = np.where(sub_grid[:, 0] > start_t)[0]
    end = np.where(sub_grid[:, 1] > end_t)[0]
    subjects: list[tuple[int, int]] = []
    for i in start:
        if i >= seq_len:
            continue
        j = end[end >= i]
        if len(j) > 0:
            j = j[0]
            if j >= seq_len:
                continue
            subjects.append((int(i), int(j)))
    return subjects


def find_tag_position(
    find_list, seq_len: int, id2label: list[str]
) -> list[tuple[int, int, str]]:
    """Tag-id scan -> [(start, end_inclusive, relation)] — the exact
    control flow of train.py:263-282 including the end=k-1 early close,
    the run-to-seq_len-1 tail, and the j=end+1 resume."""
    tag_list: list[tuple[int, int, str]] = []
    j = 0
    while j < seq_len:
        end = j
        flag = True
        if find_list[j] % 2 == 0 and find_list[j] != 0:
            start = j
            tag = id2label[find_list[start]].split("-")[1]
            for k in range(start + 1, seq_len):
                if find_list[k] != find_list[start] + 1:
                    end = k - 1
                    flag = False
                    break
            if flag:
                end = seq_len - 1
            tag_list.append((start, end, tag))
        j = end + 1
    return tag_list


class StlExtractor:
    """Picklable char-level deterministic scorer + exact STL decoder.

    Surfaces (entity aliases) and trigger phrases are normalized the
    same way as the text, so matching happens in the DuIE-1.0 space.
    """

    def __init__(self, schema: SpoSchema, alias_rows: list[dict], max_len: int = 512):
        self.schema = schema
        self.max_len = max_len
        self.labels = build_bies_labels(schema)
        self.label2id = {lb: i for i, lb in enumerate(self.labels)}
        # pid -> (B id, I id)
        self.tag_ids = {
            p.pid: (self.label2id[f"B-{p.label}"], self.label2id[f"I-{p.label}"])
            for p in schema.predicates
        }
        self.surfaces = sorted(
            {norm_duie1(r["alias"]) for r in alias_rows if norm_duie1(r["alias"])},
            key=lambda s: (-len(s), s),
        )
        self.triggers = sorted(
            {
                (norm_duie1(ph), p.pid)
                for p in schema.predicates
                for ph in p.triggers.values()
                if norm_duie1(ph)
            },
            key=lambda t: (-len(t[0]), t[0], t[1]),
        )
        # one-pass multi-pattern matchers: candidate generation is
        # O(|text| + matches) per page regardless of dictionary size
        # (per-surface str.find loops were O(|dict| * |text|) — the
        # executor-CPU scale-killer at a realistic million-alias dict)
        self._surface_ac = CharAhoCorasick({s: None for s in self.surfaces})
        trig_pids: dict[str, list[int]] = {}
        for ph, pid in self.triggers:
            trig_pids.setdefault(ph, []).append(pid)
        self._trigger_ac = CharAhoCorasick(
            {ph: sorted(pids) for ph, pids in trig_pids.items()}
        )

    # -- candidate spans ----------------------------------------------------

    def _value_spans(self, text: str) -> list[tuple[int, int]]:
        """Inclusive char spans: alias occurrences + maximal digit runs."""
        spans: set[tuple[int, int]] = {
            (at, at + ln - 1) for at, ln, _ in self._surface_ac.find_all(text)
        }
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
        return sorted(spans)

    def scan(self, text: str) -> list[tuple[int, int, int, int, int]]:
        """(s1, s2, o1, o2, pid) planted relations in char indices."""
        spans = self._value_spans(text)
        by_end: dict[int, tuple[int, int]] = {}
        by_start: dict[int, tuple[int, int]] = {}
        for s, e in spans:  # longest-from-same-edge wins
            cur = by_end.get(e)
            if cur is None or (e - s) > (cur[1] - cur[0]):
                by_end[e] = (s, e)
            cur = by_start.get(s)
            if cur is None or (e - s) > (cur[1] - cur[0]):
                by_start[s] = (s, e)
        # one AC pass over the text; sort key (pos, -len, pid) is
        # byte-identical to the original per-trigger str.find loop in
        # (-len, phrase, pid) order followed by a stable (pos, -len)
        # sort: equal (pos, len) implies the same phrase, leaving pid
        # ascending as the residual order either way
        hits = [
            (at, ln, pid)
            for at, ln, pids in self._trigger_ac.find_all(text)
            for pid in pids
        ]
        hits.sort(key=lambda h: (h[0], -h[1], h[2]))
        out, seen_spans = [], set()
        for pos, m, pid in hits:
            # nested shorter triggers at an already-claimed position lose
            if any(s <= pos < s + ln for s, ln in seen_spans):
                continue
            sub = by_end.get(pos - 1)
            obj = by_start.get(pos + m)
            if sub is None or obj is None:
                continue
            seen_spans.add((pos, m))
            out.append((sub[0], sub[1], obj[0], obj[1], pid))
        return out

    # -- grid/emission planting (the model stand-in) -------------------------

    def subject_grid(self, scan_result, seq_len: int) -> np.ndarray:
        g = np.zeros((seq_len, 2), dtype=np.float32)
        for s1, s2, _o1, _o2, _p in scan_result:
            g[s1, 0] = PROB
            g[s2, 1] = PROB
        return g

    def emissions(self, scan_result, subject: tuple[int, int], seq_len: int) -> np.ndarray:
        """[L, K] emission scores: O everywhere, planted B/I runs for
        the objects of this subject."""
        em = np.zeros((seq_len, len(self.labels)), dtype=np.float64)
        em[:, self.label2id["O"]] = O_SCORE
        for s1, s2, o1, o2, pid in scan_result:
            if (s1, s2) != subject:
                continue
            b_id, i_id = self.tag_ids[pid]
            em[o1, b_id] = PLANT_SCORE
            for k in range(o1 + 1, min(o2 + 1, seq_len)):
                em[k, i_id] = PLANT_SCORE
        return em

    # -- single-row oracle ----------------------------------------------------

    def extract_page_py(self, text: str) -> list[tuple[str, str, str]]:
        """text -> [(subject, predicate, object)] with the exact STL
        decode chain: thresholds -> Viterbi -> find_tag_position."""
        context = norm_duie1(text)[: self.max_len]
        seq_len = len(context)
        if seq_len == 0:
            return []
        scan = self.scan(context)
        subjects = decode_subjects_stl(self.subject_grid(scan, seq_len), seq_len)
        if not subjects:
            return []
        zeros = np.zeros((len(self.labels), len(self.labels)))
        # all subjects of the page decoded in ONE batched Viterbi (the
        # K x K DP step is shared; bit-identical to per-subject decode)
        ems = np.stack([self.emissions(scan, s, seq_len) for s in subjects])
        paths = viterbi_decode_batch(ems, zeros)
        out: list[tuple[str, str, str]] = []
        for subj, tag_ids in zip(subjects, paths):
            for o1, o2, rel in find_tag_position(tag_ids, seq_len, self.labels):
                out.append(
                    (context[subj[0] : subj[1] + 1], rel, context[o1 : o2 + 1])
                )
        return out


def extract_stl_triples(pages_df, extractor_bc, text_col: str = "text"):
    """pages -> flat STL triples in one mapInPandas pass (no shuffle),
    mirroring the flagship fused plan; ``extractor_bc`` broadcasts a
    :class:`StlExtractor`."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ex: StlExtractor = extractor_bc.value
        cols = ["url", "subject", "predicate", "object"]
        for pdf in it:
            rows: list[tuple] = []
            for url, text in zip(pdf["url"], pdf[text_col]):
                for s, p, o in ex.extract_page_py(text):
                    rows.append((url, s, p, o))
            yield pd.DataFrame(rows, columns=cols)

    return pages_df.select("url", text_col).mapInPandas(kernel, STL_TRIPLES_DDL)
