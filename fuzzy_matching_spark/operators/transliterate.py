"""Dataset transliteration operator (F19, ``data_matcher.py:501-547``).

Per configured field: detect the value's language; skip values already in
the target language; transliterate ru<->en with the configured standard
(undetected language is pushed toward the target); re-capitalize iff the
source value's first character was uppercase.  Executed as an Arrow-batched
pandas UDF over the kernel transliterators (greedy multi-char matching is
not expressible as Catalyst expressions).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from fuzzy_matching_spark.config import MatchConfig
from fuzzy_matching_spark.kernel import translit

__all__ = ["transliterate_dataset"]


def _translit_value(value: str, target_lang: str, standard) -> str:
    if not value:
        return value
    source = str(value)
    lang = translit.detect_language(source)
    if lang == target_lang:
        return source
    if target_lang == "en" and lang in ("ru", None):
        out = translit.transliterate_ru_to_en(source, standard)
    elif target_lang == "ru" and lang in ("en", None):
        out = translit.transliterate_en_to_ru(source, standard)
    else:
        out = source
    if source and source[0].isupper():
        out = out.capitalize()
    return out


def transliterate_dataset(
    df: DataFrame,
    config: MatchConfig,
    target_lang: str = "ru",
    fields: list[str] | None = None,
) -> DataFrame:
    """Spark twin of ``DataMatcher.transliterate_data`` (no-op when disabled)."""
    if not config.transliteration.enabled:
        return df
    if not fields:
        fields = [fc.field for fc in config.fields if fc.transliterate]
    standard = (
        translit.get_standard_by_name(config.transliteration.standard)
        or translit.PASSPORT_STANDARD
    )

    @pandas_udf("string")
    def tr(col: pd.Series) -> pd.Series:
        return col.map(
            lambda v: _translit_value(v, target_lang, standard) if v is not None else None
        )

    out = df
    for f in fields:
        if f in df.columns:
            out = out.withColumn(f, tr(F.col(f)))
    return out
