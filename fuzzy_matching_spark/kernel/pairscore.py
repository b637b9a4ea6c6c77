"""Record-pair scoring kernel shared by the oracle and the Spark pandas UDFs.

Reimplements the reference's scoring path (SURVEY.md §3.1):

* :func:`get_similarity`        — ``DataMatcher._get_similarity``  (``data_matcher.py:601-638``)
* :func:`transliteration_quality` — ``_evaluate_transliteration_quality`` (``:283-329``)
* :func:`process_transliteration` — ``_process_transliteration``   (``:331-410``)
* :func:`weighted_similarity`   — ``_weighted_average_similarity`` (``:186-230``)
* :func:`cleanliness_score` / :func:`select_cleaner`
                                — ``select_cleaner_record``        (``:262-281``)

Keeping this pure-Python/stateless means the distributed pipeline scores
pairs with *exactly* the same arithmetic as the single-machine oracle, so
parity tests only exercise orchestration differences.
"""

from __future__ import annotations

import re

from fuzzy_matching_spark.config import FuzzyAlgorithm, MatchConfig
from fuzzy_matching_spark.kernel import fuzz, translit

__all__ = [
    "get_similarity",
    "transliteration_quality",
    "process_transliteration",
    "weighted_similarity",
    "cleanliness_score",
    "select_cleaner",
]

_SPECIAL = re.compile(r"[^a-zA-Zа-яА-Я0-9\s]")
_RU_PAT = re.compile(r"[а-яА-ЯёЁ]")
_EN_PAT = re.compile(r"[a-zA-Z]")


def get_similarity(s1: str | None, s2: str | None, algorithm: FuzzyAlgorithm | None, default: FuzzyAlgorithm) -> float:
    """Similarity in [0, 1]; empty/None operands score 0 (reference ``:611-616``)."""
    if not s1 or not s2:
        return 0.0
    algo = algorithm if algorithm is not None else default
    fn = fuzz.SCORERS.get(algo.value, fuzz.ratio)
    return fn(s1.lower(), s2.lower()) / 100.0


def transliteration_quality(source_text: str, transliterated_text: str, target_text: str) -> float:
    """0.6*token_sort + 0.3*charclass ratio + 0.1*length ratio (F17)."""
    if not source_text or not transliterated_text or not target_text:
        return 0.0
    semantic = fuzz.token_sort_ratio(transliterated_text.lower(), target_text.lower()) / 100.0
    pattern = _RU_PAT if translit.detect_language(target_text) == "ru" else _EN_PAT
    total_chars = len(transliterated_text.strip())
    if total_chars == 0:
        return 0.0
    char_quality = len(pattern.findall(transliterated_text)) / total_chars
    target_len = len(target_text.strip())
    trans_len = len(transliterated_text.strip())
    if target_len == 0:
        length_ratio = 0.0
    else:
        length_ratio = max(0.0, 1.0 - abs(trans_len - target_len) / target_len)
    return semantic * 0.6 + char_quality * 0.3 + length_ratio * 0.1


def process_transliteration(value1: str, value2: str, config: MatchConfig):
    """Cross-language value alignment (F18, reference ``:331-410``).

    Returns ``(value1', value2', similarity)``; in the match path only the
    values are consumed (the similarity is recomputed by the field scorer).
    """
    if not value1 or not value2:
        return value1, value2, 0.0

    lang1 = translit.detect_language(value1)
    lang2 = translit.detect_language(value2)
    if lang1 is None or lang2 is None:
        sim = fuzz.token_sort_ratio(value1.lower(), value2.lower()) / 100.0
        return value1, value2, sim

    tcfg = config.transliteration
    if tcfg.normalize_names:
        value1 = translit.normalize_name_ru(value1) if lang1 == "ru" else translit.normalize_name_en(value1)
        value2 = translit.normalize_name_ru(value2) if lang2 == "ru" else translit.normalize_name_en(value2)

    standard = translit.get_standard_by_name(tcfg.standard) or translit.PASSPORT_STANDARD

    if lang1 != lang2 and {lang1, lang2} == {"ru", "en"}:
        # variant 1 transliterates value1 toward lang2; variant 2 the reverse;
        # ties prefer variant 1 (reference ``:386-389`` / ``:403-406``).
        if lang1 == "ru":
            v1_t = translit.transliterate_ru_to_en(value1, standard)
            v2_t = translit.transliterate_en_to_ru(value2, standard)
        else:
            v1_t = translit.transliterate_en_to_ru(value1, standard)
            v2_t = translit.transliterate_ru_to_en(value2, standard)
        quality1 = transliteration_quality(value1, v1_t, value2)
        quality2 = transliteration_quality(value2, v2_t, value1)
        if quality1 >= quality2:
            return v1_t, value2, quality1
        return value1, v2_t, quality2

    sim = fuzz.token_sort_ratio(value1.lower(), value2.lower()) / 100.0
    return value1, value2, sim


def weighted_similarity(record1: dict, record2: dict, config: MatchConfig):
    """Weighted-mean field similarity; returns ``(score, field_detail)``.

    ``field_detail`` is ``[(field, v1, v2, sim), ...]`` with post-translit
    values, matching the reference (``:186-230``).
    """
    sims: list[float] = []
    weights: list[float] = []
    detail = []
    for fc in config.fields:
        v1 = record1.get(fc.field, "")
        v2 = record2.get(fc.field, "")
        if fc.transliterate and config.transliteration.enabled:
            v1, v2, _ = process_transliteration(v1, v2, config)
        sim = get_similarity(v1, v2, fc.fuzzy_algorithm, config.fuzzy_algorithm)
        detail.append((fc.field, v1, v2, sim))
        sims.append(sim)
        weights.append(fc.weight)
    if not sims:
        return 0.0, []
    total_w = sum(weights)
    if total_w <= 0:
        return 0.0, detail
    return sum(s * w for s, w in zip(sims, weights)) / total_w, detail


def select_best_transliteration_variant(
    variants: list[str], target_lang: str = "ru", standard=None
) -> str | None:
    """Pick the variant best representing the name in ``target_lang`` (F20,
    reference ``data_matcher.py:549-599``): a variant already in the target
    language wins outright; otherwise each variant is transliterated toward
    the target and scored by :func:`transliteration_quality` against the
    transliteration of the first variant (the reference's baseline choice).
    """
    if not variants:
        return None
    if len(variants) == 1:
        return variants[0]
    for v in variants:
        if translit.detect_language(v) == target_lang:
            return v
    standard = standard or translit.PASSPORT_STANDARD
    tr = (
        translit.transliterate_en_to_ru
        if target_lang == "ru"
        else translit.transliterate_ru_to_en
    )
    reference_text = tr(variants[0], standard)
    best, best_score = variants[0], 0.0
    for v in variants:
        quality = transliteration_quality(v, tr(v, standard), reference_text)
        if quality > best_score:
            best_score, best = quality, v
    return best


def cleanliness_score(record: dict, match_fields: list[str], weights: dict[str, float]) -> float:
    """special-char count + len * weights.get('length', 0).

    Reproduces the reference's dead ``length_weight`` (``data_matcher.py:270``):
    the length term only fires if a match field is literally named 'length'.
    """
    combined = " ".join(str(record.get(f, "")) for f in match_fields)
    special = len(_SPECIAL.findall(combined))
    return special + len(combined) * weights.get("length", 0)


def select_cleaner(record1: dict, record2: dict, match_fields: list[str], weights: dict[str, float]) -> dict:
    """Lower cleanliness wins; tie -> shorter total field length; tie -> left."""
    s1 = cleanliness_score(record1, match_fields, weights)
    s2 = cleanliness_score(record2, match_fields, weights)
    if s1 < s2:
        return record1
    if s2 < s1:
        return record2
    len1 = sum(len(str(record1.get(f, ""))) for f in match_fields)
    len2 = sum(len(str(record2.get(f, ""))) for f in match_fields)
    return record1 if len1 <= len2 else record2
