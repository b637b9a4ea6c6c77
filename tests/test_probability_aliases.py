"""G9: legacy probability-key aliases (reference utils/data_generator.py:107-126)."""

from fuzzy_matching_spark.fixtures.persons import (
    DEFAULT_PROBABILITIES,
    generate_person_pair,
    normalize_probabilities,
)


def test_each_alias_maps_to_canonical():
    cases = {
        "double_letter": "double_char_probability",
        "typo_probability": "double_char_probability",
        "change_letter": "change_char_probability",
        "swap": "change_char_probability",
        "character_probability": "change_char_probability",
        "change_name": "change_name_probability",
        "change_name_domain": "change_domain_probability",
        "double_number": "double_number_probability",
        "suffix_addition": "suffix_probability",
    }
    for old, new in cases.items():
        got = normalize_probabilities({old: 0.77})
        assert got == {new: 0.77}, old


def test_precedence_rules():
    # typo_probability wins over double_letter (applied later)
    assert normalize_probabilities(
        {"double_letter": 0.1, "typo_probability": 0.2}
    ) == {"double_char_probability": 0.2}
    # swap wins over change_letter
    got = normalize_probabilities({"change_letter": 0.1, "swap": 0.2})
    assert got["change_char_probability"] == 0.2
    # character_probability wins over swap
    got = normalize_probabilities({"swap": 0.1, "character_probability": 0.3})
    assert got["change_char_probability"] == 0.3
    # canonical keys pass through untouched
    assert normalize_probabilities({"change_char_probability": 0.5}) == {
        "change_char_probability": 0.5
    }


def test_generator_accepts_legacy_keys():
    legacy = generate_person_pair(50, seed=1, probabilities={"change_name": 1.0})
    canonical = generate_person_pair(
        50, seed=1, probabilities={"change_name_probability": 1.0}
    )
    assert legacy == canonical
    # change_name=1.0 -> every variant is a full replacement, so ids match
    # but names differ from originals with overwhelming probability
    orig, var = legacy
    assert len(orig) == len(var) == 50


def test_defaults_unchanged_by_aliasing():
    assert set(DEFAULT_PROBABILITIES) == {
        "double_char_probability",
        "change_char_probability",
        "change_name_probability",
        "change_domain_probability",
        "double_number_probability",
        "suffix_probability",
        "swap_char_probability",
    }
