"""RU<->EN transliteration standards, language detection and normalizers.

Semantics mirror the reference module
``/root/reference/fuzzy_matching/utils/transliteration/transliteration_utils.py``
(F8-F16 in SURVEY.md §2.6); the mapping tables are public standards data
(GOST 7.79-2000 System A, scientific ISO/R 9, RF passport order № 2113).

Behavioral contracts reproduced exactly:

* ``ru_to_en`` lowercases its input first (reference ``:212``), so the output
  is always lowercase; every ru->en map is a single-char map, so greedy
  longest-match degenerates to a character translation.
* ``en_to_ru`` is case-insensitive greedy longest-match over the reverse map
  and *preserves* case: an uppercase first letter of a matched sequence
  capitalizes the result (reference ``:257-274``).
* ``detect_language`` counts cyrillic vs latin letters; >0.7 dominance picks
  the language, otherwise ``'mixed'``; no letters at all -> ``None``
  (reference ``:282-310``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = [
    "TransliterationStandard",
    "GOST_STANDARD",
    "SCIENTIFIC_STANDARD",
    "PASSPORT_STANDARD",
    "STANDARDS",
    "get_standard_by_name",
    "transliterate_ru_to_en",
    "transliterate_en_to_ru",
    "detect_language",
    "normalize_name_ru",
    "normalize_name_en",
    "is_valid_transliteration",
    "get_all_possible_transliterations",
    "get_best_transliteration_match",
]

_RU_LOWER = "абвгдежзийклмнопрстуфхцчшщъыьэюя"


def _ru_map(latin_for_lower: str | list[str]) -> dict[str, str]:
    """Zip the 32 non-ё lowercase cyrillic letters with their latin forms."""
    return dict(zip(_RU_LOWER, latin_for_lower))


# --- GOST 7.79-2000 System A (diacritics; fully reversible) -----------------
_GOST_RU2EN = _ru_map(
    ["a", "b", "v", "g", "d", "e", "ž", "z", "i", "j", "k", "l", "m", "n",
     "o", "p", "r", "s", "t", "u", "f", "h", "c", "č", "š", "ŝ", "ʺ", "y",
     "ʹ", "è", "û", "â"]
)
_GOST_RU2EN["ё"] = "ё"  # reference keeps ё as-is in System A map

# --- Scientific (ISO/R 9) ----------------------------------------------------
_SCI_RU2EN = _ru_map(
    ["a", "b", "v", "g", "d", "e", "ž", "z", "i", "j", "k", "l", "m", "n",
     "o", "p", "r", "s", "t", "u", "f", "x", "c", "č", "š", "ŝ", "″", "y",
     "′", "è", "ju", "ja"]
)
_SCI_RU2EN["ё"] = "ë"

# --- RF passport (MID order 2020 № 2113; no diacritics) ----------------------
_PASS_RU2EN = _ru_map(
    ["a", "b", "v", "g", "d", "e", "zh", "z", "i", "i", "k", "l", "m", "n",
     "o", "p", "r", "s", "t", "u", "f", "kh", "ts", "ch", "sh", "shch",
     "ie", "y", "", "e", "iu", "ia"]
)
_PASS_RU2EN["ё"] = "e"

# Passport reverse map is *not* the auto-inverse: it accepts extra digraphs
# (yu/ya aliases) and maps bare 'y' -> 'й' (reference ``:140-162``).
_PASS_EN2RU = {
    "shch": "щ",
    "zh": "ж", "kh": "х", "ts": "ц", "ch": "ч", "sh": "ш",
    "yu": "ю", "ya": "я", "iu": "ю", "ia": "я",
    "a": "а", "b": "б", "v": "в", "g": "г", "d": "д", "z": "з", "i": "и",
    "k": "к", "l": "л", "m": "м", "n": "н", "o": "о", "p": "п", "r": "р",
    "s": "с", "t": "т", "u": "у", "f": "ф", "e": "е", "y": "й",
}


def _invert(ru2en: dict[str, str]) -> dict[str, str]:
    """First-occurrence-wins reverse map (reference ``:51-58``)."""
    out: dict[str, str] = {}
    for ru, en in ru2en.items():
        if en and en not in out:
            out[en] = ru
    return out


@dataclass
class TransliterationStandard:
    """A named pair of forward/reverse transliteration maps.

    ``en_to_ru_map`` keys are lowercase sequences ordered for greedy
    longest-match; case restoration happens at transliteration time.
    """

    name: str
    description: str
    ru_to_en_map: dict[str, str]
    en_to_ru_map: dict[str, str] = field(default_factory=dict)
    _en_keys_desc: list[str] = field(default_factory=list, repr=False)

    def __post_init__(self):
        if not self.en_to_ru_map:
            self.en_to_ru_map = _invert(self.ru_to_en_map)
        # longest-first, stable within a length class (dict insertion order)
        self._en_keys_desc = sorted(
            self.en_to_ru_map, key=len, reverse=True
        )


GOST_STANDARD = TransliterationStandard(
    "GOST", "GOST 7.79-2000 System A (diacritics, reversible)", _GOST_RU2EN
)
SCIENTIFIC_STANDARD = TransliterationStandard(
    "Scientific", "Scientific transliteration (ISO/R 9)", _SCI_RU2EN
)
PASSPORT_STANDARD = TransliterationStandard(
    "Passport", "RF passport transliteration (MID-2113)", _PASS_RU2EN, _PASS_EN2RU
)

STANDARDS = [GOST_STANDARD, SCIENTIFIC_STANDARD, PASSPORT_STANDARD]
_BY_NAME = {s.name.lower(): s for s in STANDARDS}


def get_standard_by_name(name: str) -> TransliterationStandard | None:
    """Case-insensitive lookup; None for unknown names (reference ``:190-200``)."""
    if name is None:
        return None
    return _BY_NAME.get(name.lower())


def transliterate_ru_to_en(text: str, standard: TransliterationStandard = PASSPORT_STANDARD) -> str:
    """Lowercase the input, then map each cyrillic char; others pass through."""
    out = []
    for ch in text.lower():
        out.append(standard.ru_to_en_map.get(ch, ch))
    return "".join(out)


def transliterate_en_to_ru(text: str, standard: TransliterationStandard = PASSPORT_STANDARD) -> str:
    """Greedy longest-match, case-insensitive, case-preserving (reference F10)."""
    if not text:
        return ""
    lowered = text.lower()
    n = len(text)
    out = []
    i = 0
    keys = standard._en_keys_desc
    en2ru = standard.en_to_ru_map
    while i < n:
        matched = False
        for seq in keys:
            ln = len(seq)
            if lowered.startswith(seq, i):
                ru = en2ru[seq]
                if text[i].isupper():
                    out.append(ru.capitalize() if ln > 1 else ru.upper())
                else:
                    out.append(ru)
                i += ln
                matched = True
                break
        if not matched:
            out.append(text[i])
            i += 1
    return "".join(out)


_RU_CHARS = re.compile(r"[а-яА-ЯёЁ]")
_EN_CHARS = re.compile(r"[a-zA-Z]")
_WS = re.compile(r"\s+")


def detect_language(text: str | None) -> str | None:
    """'ru' / 'en' at >0.7 letter dominance, else 'mixed'; no letters -> None."""
    if not text:
        return None
    ru = len(_RU_CHARS.findall(text))
    en = len(_EN_CHARS.findall(text))
    total = ru + en
    if total == 0:
        return None
    if ru / total > 0.7:
        return "ru"
    if en / total > 0.7:
        return "en"
    return "mixed"


def normalize_name_ru(name: str | None) -> str:
    """lower, trim, collapse whitespace, ё->е (reference F12)."""
    if not name:
        return ""
    return _WS.sub(" ", name.lower().strip()).replace("ё", "е")


def normalize_name_en(name: str | None) -> str:
    """lower, trim, collapse whitespace (reference F13)."""
    if not name:
        return ""
    return _WS.sub(" ", name.lower().strip())


def is_valid_transliteration(
    ru_text: str,
    en_text: str,
    standard: TransliterationStandard = PASSPORT_STANDARD,
    threshold: float = 0.8,
) -> bool:
    """Positional char-match ratio of translit(ru) vs en, space-stripped (F14)."""
    if not ru_text or not en_text:
        return False
    if detect_language(ru_text) != "ru" or detect_language(en_text) != "en":
        return False
    trans = transliterate_ru_to_en(ru_text, standard).lower().replace(" ", "")
    target = en_text.lower().replace(" ", "")
    max_len = max(len(trans), len(target))
    if max_len == 0:
        return False
    matches = sum(1 for a, b in zip(trans, target) if a == b)
    return matches / max_len >= threshold


def get_all_possible_transliterations(text: str, from_lang: str = "ru") -> dict[str, str]:
    """Apply every standard in the given direction (F15)."""
    if from_lang == "ru":
        return {s.name: transliterate_ru_to_en(text, s) for s in STANDARDS}
    return {s.name: transliterate_en_to_ru(text, s) for s in STANDARDS}


def get_best_transliteration_match(
    source_text: str, target_texts: list[str], from_lang: str = "ru"
):
    """Best positional-match variant across standards x targets (F16)."""
    if not source_text or not target_texts:
        return None, 0.0
    variants = {
        name: t.lower()
        for name, t in get_all_possible_transliterations(source_text, from_lang).items()
    }
    best_match, best_score = None, 0.0
    for target in target_texts:
        if not target:
            continue
        tl = target.lower()
        for trans in variants.values():
            max_len = max(len(trans), len(tl))
            if max_len == 0:
                continue
            sim = sum(1 for a, b in zip(trans, tl) if a == b) / max_len
            if sim > best_score:
                best_score = sim
                best_match = target
    return best_match, best_score
