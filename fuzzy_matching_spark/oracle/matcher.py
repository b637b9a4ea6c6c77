"""Single-machine oracle: faithful reimplementation of the reference matcher.

This is the pytest ground truth (SURVEY.md §5.2.2) for the distributed
matcher — it replays ``DataMatcher.match_and_consolidate``
(``/root/reference/fuzzy_matching/core/data_matcher.py:412-499``) exactly:

* optional stable pre-sort by sort_field / all match fields (``:170-184``)
* first-char-uppercase blocking; empty block values excluded (``:232-260``)
* block-key *intersection* only (``:438-441``)
* per block, greedy 1:1 assignment in input order, strict ``>`` argmax
  (first max wins ties), threshold at ``>=``, right exclusivity (``:640-685``)
* consolidation: cleaner record per match, then unmatched from both inputs
  in input order (``:447-499``); the dead low-similarity branch (``:456-486``)
  is omitted — ``process_block`` already filters to ``>= threshold`` so it
  is unreachable (SURVEY.md §2.4).

Scoring is delegated to :mod:`fuzzy_matching_spark.kernel.pairscore`, the
same kernel the Spark pandas UDFs use.

Known reference defect reproduced *by omission*: ``group_fields`` blocking
in the reference returns a nested dict which ``process_block`` cannot
consume (it would iterate group-key tuples, ``data_matcher.py:651``), i.e.
the feature is unusable there; the oracle treats ``group_fields`` as extra
exact-match block-key components, which is the reference's documented
intent.
"""

from __future__ import annotations

from collections import defaultdict

from fuzzy_matching_spark.config import MatchConfig
from fuzzy_matching_spark.kernel import pairscore

__all__ = ["OracleMatcher"]


class OracleMatcher:
    """In-memory reference-semantics matcher over ``list[dict[str, str]]``."""

    def __init__(self, config: MatchConfig):
        self.config = config
        self.threshold = config.threshold
        self.match_fields = [fc.field for fc in config.fields]
        self.weights = {fc.field: fc.weight for fc in config.fields}

    # -- stages ---------------------------------------------------------

    def _sort(self, records: list[dict]) -> list[dict]:
        keys = [self.config.sort_field] if self.config.sort_field else self.match_fields
        return sorted(records, key=lambda r: tuple(r.get(k, "") for k in keys))

    def _blocks(self, records: list[dict]) -> dict:
        blocks: dict = defaultdict(list)
        for rec in records:
            val = rec.get(self.config.block_field, "")
            if not val:
                continue
            key = val[0].upper()
            if self.config.group_fields:
                key = (key, tuple(rec.get(f, "") for f in self.config.group_fields))
            blocks[key].append(rec)
        return blocks

    def _process_block(self, block1: list[dict], block2: list[dict]) -> list[dict]:
        matches = []
        taken: set[int] = set()
        for rec1 in block1:
            best_sim = 0.0
            best = None
            best_j = None
            for j, rec2 in enumerate(block2):
                if j in taken:
                    continue
                sim, _ = pairscore.weighted_similarity(rec1, rec2, self.config)
                if sim > best_sim:
                    best_sim, best, best_j = sim, rec2, j
            if best_sim >= self.threshold and best is not None:
                matches.append({"Оригинал": rec1, "Вариант": best, "Схожесть": best_sim})
                taken.add(best_j)
        return matches

    # -- entry point ----------------------------------------------------

    def match_and_consolidate(self, data1: list[dict], data2: list[dict]):
        data1 = [dict(r) for r in data1]
        data2 = [dict(r) for r in data2]
        if self.config.sort_before_match:
            data1 = self._sort(data1)
            data2 = self._sort(data2)

        matches: list[dict] = []
        if self.config.block_field:
            blocks1 = self._blocks(data1)
            blocks2 = self._blocks(data2)
            for key, b1 in blocks1.items():
                if key in blocks2:
                    matches.extend(self._process_block(b1, blocks2[key]))
        else:
            matches.extend(self._process_block(data1, data2))

        consolidated: list[dict] = []
        used1: set[int] = set()
        used2: set[int] = set()
        for m in matches:
            r1, r2 = m["Оригинал"], m["Вариант"]
            consolidated.append(pairscore.select_cleaner(r1, r2, self.match_fields, self.weights))
            used1.add(id(r1))
            used2.add(id(r2))
        for rec in data1:
            if id(rec) not in used1:
                consolidated.append(dict(rec))
        for rec in data2:
            if id(rec) not in used2:
                consolidated.append(dict(rec))
        return matches, consolidated
