"""Alias dictionary as a broadcastable token trie.

This is the engine's entity-linking candidate generator: the analogue
of the reference's gazetteer trie (run/entity_extraction/
lexiconAugmentNER/utils/trie.py:8-43 + gazetteer.py:3-45).  Semantics
kept:

  - ``enumerate_matches(seq, i)`` returns every dictionary entry that is
    a prefix of ``seq[i:]``, longest first (trie.py:36-43 enumerates by
    repeatedly chopping the tail; we walk forward instead — same result
    set, O(longest-entry) instead of O(len(seq)^2)).
  - matching is over *normalized tokens* (the gazetteer lowercases when
    ``lower=True``, gazetteer.py:11-15); we normalize through the same
    WordPiece normalizer used for page text so alias and text token
    streams are directly comparable.
  - each entry carries (canonical_id, entity_type, weight) —
    ``ent2id`` / ``ent2type`` of gazetteer.py:17-25 plus the corpus
    count weighting of utils/data.py:236-249.

The structure is a plain nested dict so ``sc.broadcast`` pickles it
cheaply; built once on the driver from the alias dimension table and
shared read-only by every pandas-UDF worker.
"""

from __future__ import annotations

from dataclasses import dataclass

_LEAF = "\x00"  # key holding the payload list at a terminal node


@dataclass(frozen=True)
class AliasEntry:
    canonical_id: int
    entity_type: str
    weight: float
    alias: str  # original surface form


class AliasTrie:
    def __init__(self):
        self.root: dict = {}
        self.n_entries = 0

    def insert(self, token_seq: list[str], entry: AliasEntry) -> None:
        node = self.root
        for tok in token_seq:
            node = node.setdefault(tok, {})
        node.setdefault(_LEAF, []).append(entry)
        self.n_entries += 1

    def enumerate_matches(
        self, tokens: list[str], start: int
    ) -> list[tuple[int, list[AliasEntry]]]:
        """All dictionary entries that are prefixes of ``tokens[start:]``.

        Returns [(end_exclusive, entries), ...] sorted longest-first —
        the order the reference's enumerateMatch produces and that the
        longest-first subsumption dedup (data.py:237-249) relies on.
        """
        node = self.root
        out: list[tuple[int, list[AliasEntry]]] = []
        i = start
        n = len(tokens)
        while i < n:
            node = node.get(tokens[i])
            if node is None:
                break
            i += 1
            if _LEAF in node:
                out.append((i, node[_LEAF]))
        out.reverse()
        return out

    def match_all(
        self, tokens: list[str]
    ) -> list[tuple[int, int, AliasEntry]]:
        """Every (start, end_exclusive, entry) match in the token stream.

        Inlined trie walk: identical output (order included) to calling
        :meth:`enumerate_matches` at every position, without paying a
        python call + list allocation per position — the walk runs once
        per page position in the extraction kernel's hot loop, and most
        positions miss the root immediately."""
        out = []
        root = self.root
        n = len(tokens)
        append = out.append
        for i in range(n):
            node = root.get(tokens[i])
            if node is None:
                continue
            j = i
            hits = None
            while node is not None:
                j += 1
                entries = node.get(_LEAF)
                if entries is not None:
                    if hits is None:
                        hits = [(j, entries)]
                    else:
                        hits.append((j, entries))
                if j >= n:
                    break
                node = node.get(tokens[j])
            if hits is not None:
                for end, entries in reversed(hits):
                    for e in entries:
                        append((i, end, e))
        return out

    def match_longest_nonoverlap(
        self, tokens: list[str]
    ) -> list[tuple[int, int, AliasEntry]]:
        """Longest-first, subsumption-deduped matches (data.py:236-249):
        a match is kept only if no kept longer match covers any of its
        positions; ties broken by start position then entry weight."""
        all_matches = self.match_all(tokens)
        all_matches.sort(key=lambda m: (-(m[1] - m[0]), m[0], -m[2].weight))
        covered = [False] * len(tokens)
        kept = []
        for s, e, entry in all_matches:
            if any(covered[s:e]):
                continue
            for i in range(s, e):
                covered[i] = True
            kept.append((s, e, entry))
        kept.sort(key=lambda m: m[0])
        return kept


def build_alias_trie(
    rows: list[dict], tokenize_fn
) -> AliasTrie:
    """Build from alias-dimension rows
    (alias, canonical_id, entity_type, weight).

    ``tokenize_fn`` maps a surface alias to its normalized token
    sequence — pass the same tokenizer used on page text so the two
    token streams align (the gazetteer's ``lower`` handling,
    gazetteer.py:11-15, generalized).
    """
    trie = AliasTrie()
    for r in rows:
        toks = tokenize_fn(r["alias"])
        if not toks:
            continue
        trie.insert(
            toks,
            AliasEntry(
                canonical_id=int(r["canonical_id"]),
                entity_type=r["entity_type"],
                weight=float(r.get("weight", 1.0)),
                alias=r["alias"],
            ),
        )
    return trie


class CharAhoCorasick:
    """Char-level Aho-Corasick automaton: ALL occurrences of ALL
    patterns in one O(len(text) + matches) pass.

    Replaces per-pattern ``str.find`` scan loops (O(|dict| * |text|)
    per page — the executor-CPU scale-killer with a realistic
    million-entry alias dictionary; see StlExtractor).  Classic public
    algorithm (Aho & Corasick 1975), fresh implementation.

    Plain lists/dicts so ``sc.broadcast`` pickles it cheaply; built
    once on the driver, shared read-only by every pandas-UDF worker.
    """

    def __init__(self, patterns: dict[str, object]):
        """patterns: surface -> payload (any picklable object)."""
        # nodes: list of {char: next_state}; out: per-state list of
        # (pattern_len, payload) completed AT this state
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[tuple[int, object]]] = [[]]
        for pat, payload in patterns.items():
            if not pat:
                continue
            s = 0
            for ch in pat:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append((len(pat), payload))
        # BFS fail links; merge output sets down the fail chain so a
        # match emits every suffix-pattern too (overlap semantics of
        # repeated str.find over every pattern)
        self.fail = [0] * len(self.goto)
        queue = list(self.goto[0].values())
        for s in queue:
            self.fail[s] = 0
        i = 0
        while i < len(queue):
            s = queue[i]
            i += 1
            for ch, nxt in self.goto[s].items():
                queue.append(nxt)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0)
                if self.fail[nxt] == nxt:
                    self.fail[nxt] = 0
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]

    def find_all(self, text: str) -> list[tuple[int, int, object]]:
        """[(start, length, payload)] for every occurrence, in text
        order (ascending end position, then longest pattern first)."""
        hits: list[tuple[int, int, object]] = []
        s = 0
        goto, fail, out = self.goto, self.fail, self.out
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                for ln, payload in out[s]:
                    hits.append((i - ln + 1, ln, payload))
        return hits
