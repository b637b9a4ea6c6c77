"""Sinks: match triples and consolidated records (S3-S5 in SURVEY.md §2.1).

Shapes mirror the reference writers (``data_matcher.py:116-168``): the match
triple keys are ``Оригинал`` / ``Вариант`` / ``Схожесть``; the CSV sink
stringifies the record structs and formats similarity with two decimals.
``single_file=True`` coalesces to one partition for byte-level parity with
the single-file reference outputs (small results only — never at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["save_matches_json", "save_matches_csv", "save_consolidated_json", "save_consolidated_csv"]


def _maybe_single(df: DataFrame, single_file: bool) -> DataFrame:
    return df.coalesce(1) if single_file else df


def save_matches_json(matches: DataFrame, path: str, single_file: bool = False) -> None:
    _maybe_single(matches, single_file).write.mode("overwrite").json(path)


def save_matches_csv(matches: DataFrame, path: str, single_file: bool = False) -> None:
    out = matches.select(
        F.to_json("Оригинал").alias("Оригинал"),
        F.to_json("Вариант").alias("Вариант"),
        F.format_number(F.col("Схожесть"), 2).alias("Схожесть"),
    )
    _maybe_single(out, single_file).write.mode("overwrite").option("header", True).csv(path)


def save_consolidated_json(consolidated: DataFrame, path: str, single_file: bool = False) -> None:
    _maybe_single(consolidated, single_file).write.mode("overwrite").json(path)


def save_consolidated_csv(consolidated: DataFrame, path: str, single_file: bool = False) -> None:
    _maybe_single(consolidated, single_file).write.mode("overwrite").option("header", True).csv(path)
