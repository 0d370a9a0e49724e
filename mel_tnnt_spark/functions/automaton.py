"""Aho-Corasick multi-pattern string matching (public-knowledge
algorithm: Aho & Corasick, CACM 1975).

The reference scans EVERY species name against EVERY document with a
per-name containment check (code/MEL/DoEE_Species.py:279-393, check at
287-303) — O(|vocab| * |text|) per document. This automaton makes the
per-document cost O(|text| + matches), independent of vocabulary size,
which is the difference between a usable and an unusable gazetteer at
10^5 surface forms. Used by
mel_tnnt_spark.operators.mentions.ac_gazetteer_detector; parity with
the naive running-offset detector is pinned by tests.
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    """Trie + failure links; find_all returns every occurrence of every
    pattern (including overlaps — callers apply their own overlap
    policy, e.g. the reference's non-overlapping find-advance)."""

    __slots__ = ("goto", "fail", "out")

    def __init__(self, patterns: list[str]):
        # goto: list of dict[ch -> state]; out: list of list[pattern]
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[str]] = [[]]
        for pat in patterns:
            if not pat:
                continue
            s = 0
            for ch in pat:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto[s][ch] = nxt
                    self.goto.append({})
                    self.out.append([])
                s = nxt
            self.out[s].append(pat)
        # BFS failure links
        self.fail = [0] * len(self.goto)
        q: deque[int] = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in self.goto[s].items():
                q.append(t)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[t] = self.goto[f].get(ch, 0)
                if self.fail[t] == t:
                    self.fail[t] = 0
                self.out[t] = self.out[t] + self.out[self.fail[t]]

    def find_all(self, text: str) -> list[tuple[int, int, str]]:
        """All (start, end, pattern) occurrences, in end order."""
        hits: list[tuple[int, int, str]] = []
        s = 0
        goto, fail, out = self.goto, self.fail, self.out
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                for pat in out[s]:
                    hits.append((i + 1 - len(pat), i + 1, pat))
        return hits
