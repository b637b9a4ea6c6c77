"""Oracle matcher invariants + hand-verified micro-cases.

The oracle is the pytest ground truth for the distributed matcher
(SURVEY.md §5.2.2), so it gets its own semantic pins: greedy order,
tie handling, right-exclusivity, block intersection, consolidation counts.
"""

import pytest

from fuzzy_matching_spark.config import (
    FuzzyAlgorithm,
    MatchConfig,
    MatchFieldConfig,
    TransliterationConfig,
)
from fuzzy_matching_spark.fixtures.persons import generate_person_pair
from fuzzy_matching_spark.oracle.matcher import OracleMatcher


def cfg(**kw):
    base = dict(
        fields=[
            MatchFieldConfig("name", 0.7),
            MatchFieldConfig("email", 0.3),
        ],
        threshold=0.7,
        fuzzy_algorithm=FuzzyAlgorithm.RATIO,
    )
    base.update(kw)
    return MatchConfig(**base)


def test_exact_match_and_consolidation_counts():
    d1 = [{"name": "ivan petrov", "email": "a@x.com"}]
    d2 = [{"name": "ivan petrov", "email": "a@x.com"}]
    matches, consolidated = OracleMatcher(cfg()).match_and_consolidate(d1, d2)
    assert len(matches) == 1
    assert matches[0]["Схожесть"] == pytest.approx(1.0)
    assert len(consolidated) == 1  # pair collapses to one record


def test_no_match_keeps_both():
    d1 = [{"name": "ivan", "email": "a@x.com"}]
    d2 = [{"name": "zzzz", "email": "q@y.org"}]
    matches, consolidated = OracleMatcher(cfg()).match_and_consolidate(d1, d2)
    assert matches == []
    assert len(consolidated) == 2


def test_greedy_right_exclusivity():
    # two identical lefts compete for one right: only the first (input order) wins
    d1 = [
        {"name": "anna", "email": "a@x.com"},
        {"name": "anna", "email": "a@x.com"},
    ]
    d2 = [{"name": "anna", "email": "a@x.com"}]
    matches, consolidated = OracleMatcher(cfg()).match_and_consolidate(d1, d2)
    assert len(matches) == 1
    assert matches[0]["Оригинал"] is not None
    # consolidated: 1 winner + 1 unmatched left
    assert len(consolidated) == 2


def test_first_max_wins_ties():
    # left record ties against two identical rights -> first right (index order) taken
    d1 = [{"name": "anna", "email": "a@x.com"}]
    d2 = [
        {"name": "anna", "email": "a@x.com", "tag": "first"},
        {"name": "anna", "email": "a@x.com", "tag": "second"},
    ]
    matches, _ = OracleMatcher(cfg()).match_and_consolidate(d1, d2)
    assert len(matches) == 1
    assert matches[0]["Вариант"]["tag"] == "first"


def test_blocking_intersection_only():
    # same name initial 'A' on both sides matches; 'Z' block exists only left
    c = cfg(block_field="name")
    d1 = [
        {"name": "anna", "email": "a@x.com"},
        {"name": "zoe", "email": "z@x.com"},
    ]
    d2 = [{"name": "anna", "email": "a@x.com"}]
    matches, consolidated = OracleMatcher(c).match_and_consolidate(d1, d2)
    assert len(matches) == 1
    assert len(consolidated) == 2  # winner + zoe


def test_blocking_excludes_empty_block_values():
    c = cfg(block_field="name")
    d1 = [{"name": "", "email": "a@x.com"}]
    d2 = [{"name": "", "email": "a@x.com"}]
    matches, consolidated = OracleMatcher(c).match_and_consolidate(d1, d2)
    assert matches == []  # never entered a block
    assert len(consolidated) == 2  # both re-enter via the unmatched union


def test_threshold_is_inclusive():
    # craft sim exactly 0.75: ratio("abcd","abc_") -> 2*3/8? pick simpler:
    d1 = [{"name": "abcd", "email": ""}]
    d2 = [{"name": "abc", "email": ""}]
    # ratio = 2*3/7 = 0.857 on name; email empty -> 0; weighted 0.7*0.857/1.0
    c = cfg(threshold=0.857 * 0.7)
    matches, _ = OracleMatcher(c).match_and_consolidate(d1, d2)
    assert len(matches) == 1


def test_cleaner_record_selection():
    # right record has special chars -> left (clean) wins consolidation
    d1 = [{"name": "anna", "email": "a@x.com"}]
    d2 = [{"name": "ann-a!", "email": "a@x.com"}]
    matches, consolidated = OracleMatcher(cfg(threshold=0.5)).match_and_consolidate(d1, d2)
    assert len(matches) == 1
    assert consolidated[0]["name"] == "anna"


def test_sort_before_match_changes_left_order():
    c = cfg(sort_before_match=True)
    d1 = [
        {"name": "bob", "email": "b@x.com"},
        {"name": "alice", "email": "a@x.com"},
    ]
    d2 = [{"name": "alice", "email": "a@x.com"}]
    matches, _ = OracleMatcher(c).match_and_consolidate(d1, d2)
    assert len(matches) == 1
    assert matches[0]["Оригинал"]["name"] == "alice"


def test_person_fixture_end_to_end_counts():
    """Macro regression: same shape as the reference's benchmark goldens —
    most variants should match their originals at threshold 0.7."""
    originals, variants = generate_person_pair(200, seed=42)
    c = MatchConfig(
        fields=[
            MatchFieldConfig("Фамилия", 0.4),
            MatchFieldConfig("Имя", 0.3),
            MatchFieldConfig("Отчество", 0.2),
            MatchFieldConfig("email", 0.1),
        ],
        threshold=0.7,
        block_field="Фамилия",
        sort_before_match=True,
        fuzzy_algorithm=FuzzyAlgorithm.RATIO,
    )
    matches, consolidated = OracleMatcher(c).match_and_consolidate(originals, variants)
    # reference benchmarks find ~43-45% of n matches at n records per side
    # with these probabilities (BASELINE.md); ours is the same distortion
    # model so the bulk of non-replaced variants must match.
    assert len(matches) > 100
    assert len(matches) + (len(originals) + len(variants) - 2 * len(matches)) == len(consolidated)


def test_transliterated_matching():
    c = MatchConfig(
        fields=[MatchFieldConfig("name", 1.0, transliterate=True)],
        threshold=0.7,
        transliteration=TransliterationConfig(enabled=True, standard="Passport"),
        fuzzy_algorithm=FuzzyAlgorithm.RATIO,
    )
    d1 = [{"name": "Иванов"}]
    d2 = [{"name": "Ivanov"}]
    matches, _ = OracleMatcher(c).match_and_consolidate(d1, d2)
    assert len(matches) == 1
    assert matches[0]["Схожесть"] > 0.9
