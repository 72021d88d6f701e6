"""Aho-Corasick multi-pattern string automaton.

Replaces the reference's single giant alternation regex
(gazetteers.py:89-110) for gazetteer matching: a compiled alternation of N
escaped variants costs O(alternatives) per text position in the worst
case, while Aho-Corasick is O(len(text) + matches) regardless of
dictionary size.  The automaton is built once on the driver from the
gazetteer DataFrame and shipped to executors with ``sc.broadcast`` —
"broadcast Aho-Corasick gazetteer matching" per the north star.

The automaton reports *all* pattern occurrences; the caller re-imposes the
reference's selection semantics (word boundaries, leftmost scan,
type-priority + longest-match alternation order) — see
:mod:`islamic_ner_spark.sources.gazetteer`.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, Tuple


class AhoCorasick:
    """Dict-based trie with failure links; picklable for broadcast."""

    __slots__ = ("_goto", "_fail", "_out")

    def __init__(self, patterns: Iterable[str]) -> None:
        # _goto[node] : {char: next_node}; node 0 is the root.
        self._goto: list[dict[str, int]] = [{}]
        # _out[node] : lengths of patterns ending at this node.
        self._out: list[tuple[int, ...]] = [()]

        for pattern in patterns:
            if not pattern:
                continue
            node = 0
            for char in pattern:
                nxt = self._goto[node].get(char)
                if nxt is None:
                    nxt = len(self._goto)
                    self._goto[node][char] = nxt
                    self._goto.append({})
                    self._out.append(())
                node = nxt
            if len(pattern) not in self._out[node]:
                self._out[node] = self._out[node] + (len(pattern),)

        self._fail = [0] * len(self._goto)
        queue: deque[int] = deque()
        for child in self._goto[0].values():
            queue.append(child)
        while queue:
            node = queue.popleft()
            for char, child in self._goto[node].items():
                queue.append(child)
                fallback = self._fail[node]
                while fallback and char not in self._goto[fallback]:
                    fallback = self._fail[fallback]
                fail_to = self._goto[fallback].get(char, 0)
                if fail_to == child:
                    fail_to = 0
                self._fail[child] = fail_to
                # Merge output sets along the failure chain so each node
                # carries every pattern that ends here.
                if self._out[fail_to]:
                    merged = self._out[child] + tuple(
                        n for n in self._out[fail_to] if n not in self._out[child]
                    )
                    self._out[child] = merged

    def __len__(self) -> int:
        return len(self._goto)

    def occurrences(self, text: str) -> Iterator[Tuple[int, int]]:
        """Yield ``(start, end)`` for every pattern occurrence in ``text``."""
        goto = self._goto
        fail = self._fail
        out = self._out
        node = 0
        for index, char in enumerate(text):
            while node and char not in goto[node]:
                node = fail[node]
            node = goto[node].get(char, 0)
            if out[node]:
                end = index + 1
                for length in out[node]:
                    yield end - length, end
