"""Spark matcher vs oracle parity (SURVEY.md §5.2.2).

The distributed matcher must reproduce the reference semantics *exactly* on
the person fixtures: same match pairs, same similarities, same consolidated
multiset.  Scoring is shared kernel code, so this exercises orchestration:
blocking, cogroup intersection, per-block order, greedy exclusivity,
cleanliness winner pick and anti-join re-entry.
"""

import pytest

from fuzzy_matching_spark.config import (
    FuzzyAlgorithm,
    MatchConfig,
    MatchFieldConfig,
    TransliterationConfig,
)
from fuzzy_matching_spark.fixtures.persons import generate_person_pair
from fuzzy_matching_spark.operators.greedy_match import SparkMatcher
from fuzzy_matching_spark.oracle.matcher import OracleMatcher

FIELDS = [
    MatchFieldConfig("Фамилия", 0.4),
    MatchFieldConfig("Имя", 0.3),
    MatchFieldConfig("Отчество", 0.2),
    MatchFieldConfig("email", 0.1),
]


def base_config(**kw):
    base = dict(
        fields=FIELDS,
        threshold=0.7,
        block_field="Фамилия",
        sort_before_match=True,
        fuzzy_algorithm=FuzzyAlgorithm.RATIO,
    )
    base.update(kw)
    return MatchConfig(**base)


def spark_df(spark, records):
    cols = list(records[0].keys())
    return spark.createDataFrame(
        [tuple(r.get(c, "") for c in cols) for r in records],
        schema=", ".join(f"`{c}` string" for c in cols),
    )


def match_key(rec_pair):
    return (rec_pair[0]["id"], rec_pair[1]["id"])


def run_both(spark, config, n=150, seed=42):
    originals, variants = generate_person_pair(n, seed=seed)
    o_matches, o_cons = OracleMatcher(config).match_and_consolidate(originals, variants)

    df1 = spark_df(spark, originals)
    df2 = spark_df(spark, variants)
    # driver_match_max_rows=0: this suite's purpose is the DISTRIBUTED
    # plan vs the oracle; without the pin, small simple configs would
    # silently dispatch to the driver-local path (tests/test_local_match.py
    # covers that path and the dispatch gate)
    matcher = SparkMatcher(config, driver_match_max_rows=0)
    s_matches_df, s_cons_df = matcher.match_and_consolidate(df1, df2)
    assert matcher.last_strategy == "distributed"
    s_matches = [
        (r["Оригинал"].asDict(), r["Вариант"].asDict(), r["Схожесть"])
        for r in s_matches_df.collect()
    ]
    s_cons = [r.asDict() for r in s_cons_df.collect()]
    return (o_matches, o_cons), (s_matches, s_cons)


@pytest.mark.parametrize(
    "config_kw",
    [
        {},  # flagship: blocked + sorted + RATIO
        {"fuzzy_algorithm": FuzzyAlgorithm.TOKEN_SORT},
        {"fuzzy_algorithm": FuzzyAlgorithm.PARTIAL_RATIO},
        {"fuzzy_algorithm": FuzzyAlgorithm.WRatio},
        {"threshold": 0.9},
        {"sort_before_match": False},
        {"block_field": None},  # single ALL block
        {
            "fields": [
                MatchFieldConfig("Фамилия", 0.4, transliterate=True),
                MatchFieldConfig("Имя", 0.3, transliterate=True),
                MatchFieldConfig("Отчество", 0.2, transliterate=True),
                MatchFieldConfig("email", 0.1),
            ],
            "transliteration": TransliterationConfig(enabled=True, standard="Passport"),
        },
    ],
    ids=["flagship", "token_sort", "partial", "wratio", "thr09", "nosort", "noblock", "translit"],
)
def test_spark_matches_oracle(spark, config_kw):
    config = base_config(**config_kw)
    n = 60 if config_kw.get("block_field", "x") is None else 150
    (o_matches, o_cons), (s_matches, s_cons) = run_both(spark, config, n=n)

    o_pairs = sorted(
        (m["Оригинал"]["id"], m["Вариант"]["id"], round(m["Схожесть"], 9)) for m in o_matches
    )
    s_pairs = sorted((m[0]["id"], m[1]["id"], round(m[2], 9)) for m in s_matches)
    assert s_pairs == o_pairs

    o_ids = sorted(r["id"] for r in o_cons)
    s_ids = sorted(r["id"] for r in s_cons)
    assert s_ids == o_ids


def test_per_field_algorithm_override(spark):
    config = base_config(
        fields=[
            MatchFieldConfig("Фамилия", 0.4, fuzzy_algorithm=FuzzyAlgorithm.TOKEN_SET),
            MatchFieldConfig("Имя", 0.3),
            MatchFieldConfig("Отчество", 0.2, fuzzy_algorithm=FuzzyAlgorithm.PARTIAL_RATIO),
            MatchFieldConfig("email", 0.1, fuzzy_algorithm=FuzzyAlgorithm.RATIO),
        ],
        fuzzy_algorithm=FuzzyAlgorithm.TOKEN_SORT,
    )
    (o_matches, _), (s_matches, _) = run_both(spark, config, n=100)
    o_pairs = sorted(
        (m["Оригинал"]["id"], m["Вариант"]["id"], round(m["Схожесть"], 9)) for m in o_matches
    )
    s_pairs = sorted((m[0]["id"], m[1]["id"], round(m[2], 9)) for m in s_matches)
    assert s_pairs == o_pairs
    assert len(s_pairs) > 0


def test_parallelism_invariance(spark):
    """local[8] session at two shuffle-partition settings -> identical output
    (stand-in for the N vs 4N determinism requirement at test scale)."""
    config = base_config()
    originals, variants = generate_person_pair(120, seed=7)
    df1 = spark_df(spark, originals)
    df2 = spark_df(spark, variants)

    results = []
    for parts in ("2", "16"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        m, c = SparkMatcher(config, driver_match_max_rows=0).match_and_consolidate(df1, df2)
        results.append(
            (
                sorted((r["Оригинал"]["id"], r["Вариант"]["id"], round(r["Схожесть"], 9)) for r in m.collect()),
                sorted(r["id"] for r in c.collect()),
            )
        )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert results[0] == results[1]


def _pairs_and_ids(m_df, c_df):
    pairs = sorted(
        (r["Оригинал"]["id"], r["Вариант"]["id"], round(r["Схожесть"], 9))
        for r in m_df.collect()
    )
    ids = sorted(r["id"] for r in c_df.collect())
    return pairs, ids


def test_scoring_join_plans_agree(spark):
    """Pre-spread + broadcast scoring join == shuffle join + rebalance.

    The strategy gate (broadcast_join_max_rows/_char_budget) only picks the
    physical join; output must be identical.  n=1600+1600 crosses
    rebalance_min_rows so the non-small branch of both plans runs."""
    config = base_config()
    originals, variants = generate_person_pair(1600, seed=11)
    df1 = spark_df(spark, originals)
    df2 = spark_df(spark, variants)

    bcast = SparkMatcher(config, driver_match_max_rows=0)
    bres = _pairs_and_ids(*bcast.match_and_consolidate(df1, df2))
    bcast.unpersist()

    shuf = SparkMatcher(config, driver_match_max_rows=0, broadcast_join_max_rows=0)
    sres = _pairs_and_ids(*shuf.match_and_consolidate(df1, df2))
    shuf.unpersist()

    assert bres == sres
    assert len(bres[0]) > 0


def test_scoring_join_left_broadcast_orientation(spark):
    """When only the LEFT side fits the broadcast bounds (right too many
    rows), the plan broadcasts the left and spreads the right — still
    output-identical to the shuffle plan."""
    config = base_config()
    originals, _ = generate_person_pair(120, seed=13)
    _, variants = generate_person_pair(900, seed=13)
    df1 = spark_df(spark, originals)
    df2 = spark_df(spark, variants)

    lb = SparkMatcher(config, driver_match_max_rows=0, broadcast_join_max_rows=500)
    lres = _pairs_and_ids(*lb.match_and_consolidate(df1, df2))
    lb.unpersist()

    shuf = SparkMatcher(config, driver_match_max_rows=0, broadcast_join_max_rows=0)
    sres = _pairs_and_ids(*shuf.match_and_consolidate(df1, df2))
    shuf.unpersist()

    assert lres == sres
    assert len(lres[0]) > 0
