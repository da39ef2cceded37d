"""From-scratch Aho-Corasick multi-pattern matcher (Aho & Corasick 1975).

Corpus scrubbing against large phrase blocklists (badword lists, license
boilerplate, benchmark canaries) needs every occurrence of every phrase in
one pass: scanning per-phrase is O(|text| * n_phrases) and a single
alternation regex degrades the same way in RE2's DFA when phrase counts
reach the tens of thousands.  The classical answer is the Aho-Corasick
automaton — a trie over the phrases with failure links — giving
O(|text| + matches) per document independent of phrase count.

Pure-Python, dict-transition nodes; built once per executor from the
broadcast phrase list (builds are microseconds for realistic lists) and
then applied per Arrow batch.  Matching is on raw character runs of the
given strings — callers own case folding (the operator lowercases both
sides so the oracle can replay with ``lower()``).

Every occurrence is reported, INCLUDING overlapping ones and phrases that
are substrings of other phrases (via output links): matching "a a" against
"a a a" yields 2 hits; patterns {"he","she","hers"} against "ushers"
yield one hit each.
"""

from __future__ import annotations

from typing import Iterable, Iterator

__all__ = ["AhoCorasick"]


class _Node:
    __slots__ = ("next", "fail", "out")

    def __init__(self) -> None:
        self.next: dict = {}
        self.fail: "_Node" = None  # type: ignore[assignment]
        self.out: list = []  # pattern indexes ending here (incl. via links)


class AhoCorasick:
    """Immutable automaton over a fixed pattern list.

    ``find_iter(text)`` yields ``(end_index, pattern_index)`` for every
    occurrence (end_index = index AFTER the last matched char);
    ``count_matches(text)`` folds that into a per-pattern count dict.
    """

    def __init__(self, patterns: Iterable[str]) -> None:
        self.patterns = list(patterns)
        if not self.patterns:
            raise ValueError("AhoCorasick: empty pattern list")
        for p in self.patterns:
            if not p:
                raise ValueError("AhoCorasick: empty pattern")
        if len(set(self.patterns)) != len(self.patterns):
            raise ValueError("AhoCorasick: duplicate patterns")
        root = _Node()
        for idx, pat in enumerate(self.patterns):
            node = root
            for ch in pat:
                node = node.next.setdefault(ch, _Node())
            node.out.append(idx)
        # BFS failure links; out lists absorb the fail target's outputs so
        # matching never walks the fail chain per position (output links
        # flattened at build time)
        root.fail = root
        queue = []
        for child in root.next.values():
            child.fail = root
            queue.append(child)
        qi = 0
        while qi < len(queue):
            node = queue[qi]
            qi += 1
            for ch, child in node.next.items():
                f = node.fail
                while f is not root and ch not in f.next:
                    f = f.fail
                child.fail = f.next[ch] if (ch in f.next
                                            and f.next[ch] is not child) \
                    else root
                child.out = child.out + child.fail.out
                queue.append(child)
        self._root = root

    def find_iter(self, text: str) -> Iterator[tuple]:
        root = self._root
        node = root
        for i, ch in enumerate(text):
            while node is not root and ch not in node.next:
                node = node.fail
            node = node.next.get(ch, root)
            if node.out:
                end = i + 1
                for idx in node.out:
                    yield end, idx

    def count_matches(self, text: str) -> dict:
        """pattern_index -> number of occurrences in ``text`` (all
        occurrences: overlaps and nested patterns each count)."""
        counts: dict = {}
        for _, idx in self.find_iter(text):
            counts[idx] = counts.get(idx, 0) + 1
        return counts
