"""Transliteration kernel tests mirroring the reference's unit tests
(``/root/reference/fuzzy_matching/tests/test_transliteration.py:39-108``)
plus map/round-trip invariants."""

import pytest

from fuzzy_matching_spark.config import MatchConfig, MatchFieldConfig, TransliterationConfig
from fuzzy_matching_spark.kernel import pairscore, translit


def test_detect_language():
    assert translit.detect_language("Иванов") == "ru"
    assert translit.detect_language("Ivanov") == "en"
    assert translit.detect_language("Иванов Ivanov") == "mixed"
    assert translit.detect_language("") is None
    assert translit.detect_language(None) is None
    assert translit.detect_language("12345 !@#") is None
    # >0.7 dominance rule
    assert translit.detect_language("Приветx") == "ru"  # 6/7 ru


def test_ru_to_en_passport():
    assert translit.transliterate_ru_to_en("Иванов") == "ivanov"  # lowercased first
    assert translit.transliterate_ru_to_en("Щедрин") == "shchedrin"
    assert translit.transliterate_ru_to_en("Ёлкин") == "elkin"
    assert translit.transliterate_ru_to_en("Юрий") == "iurii"
    assert translit.transliterate_ru_to_en("Семьянов") == "semianov"  # ь -> ''
    assert translit.transliterate_ru_to_en("abc123") == "abc123"  # passthrough


def test_ru_to_en_gost_and_scientific():
    g = translit.GOST_STANDARD
    s = translit.SCIENTIFIC_STANDARD
    assert translit.transliterate_ru_to_en("Жуков", g) == "žukov"
    assert translit.transliterate_ru_to_en("Хрущёв", g) == "hruŝёv"
    assert translit.transliterate_ru_to_en("Юлия", s) == "julija"
    assert translit.transliterate_ru_to_en("Ёж", s) == "ëž"


def test_en_to_ru_passport_case_preserving():
    assert translit.transliterate_en_to_ru("Shchedrin") == "Щедрин"
    assert translit.transliterate_en_to_ru("shchedrin") == "щедрин"
    assert translit.transliterate_en_to_ru("Ivanov") == "Иванов"
    assert translit.transliterate_en_to_ru("IVANOV") == "ИВАНОВ"
    # digraph aliases yu/ya and iu/ia both map
    assert translit.transliterate_en_to_ru("Yurii") == "Юрии"
    assert translit.transliterate_en_to_ru("Iurii") == "Юрии"
    # bare y -> й (passport reverse map quirk, reproduce)
    assert translit.transliterate_en_to_ru("y") == "й"
    assert translit.transliterate_en_to_ru("") == ""


def test_en_to_ru_greedy_longest_match():
    # 'shch' must win over 'sh' + 'ch' and over 's'+'h'+...
    assert translit.transliterate_en_to_ru("shch") == "щ"
    assert translit.transliterate_en_to_ru("sh") == "ш"
    assert translit.transliterate_en_to_ru("skh") == "сх"


def test_standard_lookup():
    assert translit.get_standard_by_name("passport") is translit.PASSPORT_STANDARD
    assert translit.get_standard_by_name("GOST") is translit.GOST_STANDARD
    assert translit.get_standard_by_name("nope") is None


def test_normalizers():
    assert translit.normalize_name_ru("  Ёлкин   Пётр ") == "елкин петр"
    assert translit.normalize_name_en("  John   SMITH ") == "john smith"
    assert translit.normalize_name_ru("") == ""
    assert translit.normalize_name_ru(None) == ""


def test_is_valid_transliteration():
    assert translit.is_valid_transliteration("Иванов", "Ivanov")
    assert not translit.is_valid_transliteration("Иванов", "Smith")
    assert not translit.is_valid_transliteration("", "Ivanov")
    assert not translit.is_valid_transliteration("Ivanov", "Ivanov")  # lang gate


def test_get_all_possible_transliterations():
    out = translit.get_all_possible_transliterations("Щедрин", "ru")
    assert set(out) == {"GOST", "Scientific", "Passport"}
    assert out["Passport"] == "shchedrin"


def test_get_best_transliteration_match():
    best, score = translit.get_best_transliteration_match(
        "Иванов", ["Ivanov", "Smith"], "ru"
    )
    assert best == "Ivanov"
    assert score > 0.7


# --- quality metric (reference tests assert > 0.7 on known pairs) -----------

@pytest.mark.parametrize(
    "ru,en",
    [("Иванов", "Ivanov"), ("Михаил", "Mikhail"), ("Санкт-Петербург", "Sankt-Peterburg")],
)
def test_transliteration_quality_known_pairs(ru, en):
    trans = translit.transliterate_ru_to_en(ru)
    assert pairscore.transliteration_quality(ru, trans, en) > 0.7


def test_transliteration_quality_empty_operands():
    assert pairscore.transliteration_quality("", "x", "y") == 0.0
    assert pairscore.transliteration_quality("x", "", "y") == 0.0
    assert pairscore.transliteration_quality("x", "y", "") == 0.0


def _cfg(normalize=True, standard="Passport"):
    return MatchConfig(
        fields=[MatchFieldConfig("name", 1.0, transliterate=True)],
        transliteration=TransliterationConfig(
            enabled=True, standard=standard, normalize_names=normalize
        ),
    )


def test_process_transliteration_cross_language():
    v1, v2, q = pairscore.process_transliteration("Иванов", "Ivanov", _cfg())
    # one side got transliterated into the other's language
    assert translit.detect_language(v1) == translit.detect_language(v2)
    assert q > 0.7


def test_process_transliteration_same_language_passthrough():
    v1, v2, sim = pairscore.process_transliteration("Ivanov", "Ivanov", _cfg())
    assert (v1, v2) == ("ivanov", "ivanov")  # normalized
    assert sim == pytest.approx(1.0)


def test_process_transliteration_empty_returns_zero():
    v1, v2, sim = pairscore.process_transliteration("", "Ivanov", _cfg())
    assert (v1, v2, sim) == ("", "Ivanov", 0.0)


def test_select_best_transliteration_variant():
    from fuzzy_matching_spark.kernel.pairscore import select_best_transliteration_variant as f

    assert f([]) is None
    assert f(["Ivanov"]) == "Ivanov"
    # a variant already in the target language wins outright
    assert f(["Ivanov", "Иванов"], "ru") == "Иванов"
    assert f(["Иванов", "Ivanov"], "en") == "Ivanov"
    # otherwise quality vs the first variant's transliteration decides
    assert f(["Ivanov", "Zzz"], "ru") == "Ivanov"
