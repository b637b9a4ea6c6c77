"""Command-line interface — parity with the reference CLI
(``/root/reference/fuzzy_matching/cli/process_data.py:222-871``).

Modes: ``match`` / ``transliterate`` / ``generate``.  Field specs use the
reference's mini-languages:

* ``--match-fields "field:weight:translit[:ALGO],..."``
  (``process_data.py:178-219``) — ALGO one of RATIO, PARTIAL_RATIO,
  TOKEN_SORT, TOKEN_SET, WRatio; unknown names warn and fall back.
* ``--name-fields "src1:dst1,src2:dst2"`` (``:137-175``).

Run: ``python -m fuzzy_matching_spark.cli --mode match --input1 a.csv ...``
"""

from __future__ import annotations

import argparse
import sys
import warnings

from fuzzy_matching_spark.config import (
    FuzzyAlgorithm,
    MatchConfig,
    MatchFieldConfig,
    TransliterationConfig,
)

__all__ = ["parse_match_fields", "parse_name_fields", "main"]


def parse_match_fields(fields_str: str | None) -> list[MatchFieldConfig]:
    """'field:weight:translit[:ALGO],...' -> [MatchFieldConfig]."""
    if not fields_str:
        return [
            MatchFieldConfig(field="id", weight=0.0, transliterate=False),
            MatchFieldConfig(field="email", weight=0.1, transliterate=False),
        ]
    out = []
    for pair in fields_str.split(","):
        parts = pair.split(":")
        field = parts[0].strip()
        weight = float(parts[1]) if len(parts) > 1 else 1.0
        transliterate = parts[2].strip().lower() == "true" if len(parts) > 2 else False
        algorithm = None
        if len(parts) > 3 and parts[3].strip():
            try:
                algorithm = FuzzyAlgorithm[parts[3].strip()]
            except KeyError:
                warnings.warn(
                    f"unknown algorithm '{parts[3].strip()}' for field '{field}'; "
                    "using the default"
                )
        out.append(
            MatchFieldConfig(
                field=field, weight=weight, transliterate=transliterate,
                fuzzy_algorithm=algorithm,
            )
        )
    return out


def parse_name_fields(
    fields_str: str | None, match_fields: list[MatchFieldConfig] | None = None
) -> dict[str, str] | None:
    """'src:dst,...' -> mapping; defaults to identity over match fields."""
    if not fields_str:
        if match_fields:
            return {fc.field: fc.field for fc in match_fields}
        return None
    out: dict[str, str] = {}
    for pair in fields_str.split(","):
        src, dst = pair.split(":")
        out[src.strip()] = dst.strip()
    return out


def _demo_datasets(kind: str):
    """Canned demo inputs (reference ``cli/demo.py:252-733``): small personal /
    business / transliteration examples with typos, suffixes and RU<->EN
    variants.  The reference drives these through an interactive menu; a
    cluster tool cannot block on stdin, so the Spark port runs them
    non-interactively and prints the match tables."""
    if kind == "personal":
        d1 = [
            {"id": "1", "Фамилия": "Иванов", "Имя": "Александр", "email": "ivanov@example.ru"},
            {"id": "2", "Фамилия": "Петров", "Имя": "Дмитрий", "email": "petrov@example.ru"},
            {"id": "3", "Фамилия": "Сидорова", "Имя": "Елена", "email": "sidorova@example.ru"},
        ]
        d2 = [
            {"id": "a", "Фамилия": "Иваноов", "Имя": "Александр", "email": "ivanov@example.ru"},
            {"id": "b", "Фамилия": "Петров", "Имя": "Дмитри", "email": "petrov@mail.ru"},
            {"id": "c", "Фамилия": "Кузнецов", "Имя": "Сергей", "email": "kuznetsov@example.ru"},
        ]
        fields = [
            MatchFieldConfig("Фамилия", 0.5),
            MatchFieldConfig("Имя", 0.4),
            MatchFieldConfig("email", 0.1),
        ]
        return d1, d2, MatchConfig(fields=fields, threshold=0.7, block_field="Фамилия")
    if kind == "translit":
        d1 = [
            {"id": "ru_1", "Фамилия": "Иванов", "Имя": "Александр", "email": "ivanov@example.ru"},
            {"id": "ru_2", "Фамилия": "Петров", "Имя": "Дмитрий", "email": "petrov@example.ru"},
        ]
        d2 = [
            {"id": "en_1", "Фамилия": "Ivanov", "Имя": "Aleksandr", "email": "ivanov@example.ru"},
            {"id": "en_2", "Фамилия": "Petrov", "Имя": "Dmitrii", "email": "petrov@example.ru"},
        ]
        fields = [
            MatchFieldConfig("Фамилия", 0.5, transliterate=True),
            MatchFieldConfig("Имя", 0.4, transliterate=True),
            MatchFieldConfig("email", 0.1),
        ]
        return d1, d2, MatchConfig(
            fields=fields, threshold=0.6,
            transliteration=TransliterationConfig(enabled=True, standard="Passport"),
        )
    # business (reference demo.py:373-493): org names with suffix/punct noise
    d1 = [
        {"id": "o1", "name": 'ООО "Ромашка"', "inn": "7701234567"},
        {"id": "o2", "name": "АО ТехноСервис", "inn": "7812345678"},
    ]
    d2 = [
        {"id": "x1", "name": "ООО Ромашка", "inn": "7701234567"},
        {"id": "x2", "name": 'АО "Техно-Сервис"', "inn": "7812345678"},
    ]
    fields = [MatchFieldConfig("name", 0.7), MatchFieldConfig("inn", 0.3)]
    return d1, d2, MatchConfig(fields=fields, threshold=0.6)


def run_demo(spark, kind: str) -> int:
    """Run one (or all) canned demos end-to-end and print the results."""
    from fuzzy_matching_spark.operators.greedy_match import SparkMatcher

    kinds = ["personal", "business", "translit"] if kind == "all" else [kind]
    for k in kinds:
        d1, d2, config = _demo_datasets(k)
        matches, consolidated = SparkMatcher(config).match_and_consolidate(
            spark.createDataFrame(d1), spark.createDataFrame(d2)
        )
        rows = matches.collect()
        print(f"--- demo: {k} ---")
        for r in rows:
            o, v = r["Оригинал"], r["Вариант"]
            print(f"  {dict(o.asDict())} <~> {dict(v.asDict())}  sim={r['Схожесть']:.3f}")
        print(f"  matches: {len(rows)}, consolidated: {consolidated.count()}")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fuzzy-matching-spark")
    ap.add_argument(
        "--mode", choices=["match", "transliterate", "generate", "demo"], required=True
    )
    ap.add_argument(
        "--demo", default="all", choices=["personal", "business", "translit", "all"]
    )
    ap.add_argument("--input1")
    ap.add_argument("--input2")
    ap.add_argument("--match-fields", dest="match_fields")
    ap.add_argument("--name-fields", dest="name_fields")
    ap.add_argument("--threshold", type=float, default=0.7)  # CLI default, process_data.py:291
    ap.add_argument("--block-field", dest="block_field")
    ap.add_argument(
        "--candidate-source", dest="candidate_source", default="block",
        choices=["block", "lsh"],
        help="candidate generation: 'block' = reference blocking semantics; "
        "'lsh' = MinHash/LSH band collisions over the match fields "
        "(corpus-scale path; same scoring + greedy assignment either way)",
    )
    ap.add_argument("--algorithm", default="RATIO")  # CLI default, process_data.py:332
    ap.add_argument("--transliteration", action="store_true")
    ap.add_argument("--standard", default="Passport")
    ap.add_argument("--target-lang", default="en")
    ap.add_argument("--sort", action="store_true")
    ap.add_argument("--output-matches")
    ap.add_argument("--output-consolidated")
    ap.add_argument("--output")
    ap.add_argument("--format", default="json", choices=["json", "csv"])
    ap.add_argument("--count", type=int, default=100)
    ap.add_argument("--language", default="ru")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from fuzzy_matching_spark import api
    from fuzzy_matching_spark.pipeline.session import build_session

    spark = build_session(master=args.master, app_name=f"fms-cli-{args.mode}")

    if args.mode == "demo":
        return run_demo(spark, args.demo)

    match_fields = parse_match_fields(args.match_fields)
    name_fields = parse_name_fields(args.name_fields, match_fields if args.match_fields else None)

    try:
        main_algorithm = FuzzyAlgorithm[args.algorithm]
    except KeyError:
        warnings.warn(f"unknown main algorithm '{args.algorithm}'; using RATIO")
        main_algorithm = FuzzyAlgorithm.RATIO

    if args.mode == "match":
        config = MatchConfig(
            fields=match_fields,
            threshold=args.threshold,
            block_field=args.block_field,
            sort_before_match=args.sort,
            transliteration=TransliterationConfig(
                enabled=args.transliteration, standard=args.standard
            ),
            fuzzy_algorithm=main_algorithm,
        )
        matches, consolidated = api.match_datasets(
            spark, args.input1, args.input2, config=config, field_mapping=name_fields,
            candidate_source=args.candidate_source,
        )
        n_matches = matches.persist().count()
        api.save_results(
            matches, consolidated, args.output_matches, args.output_consolidated,
            file_format=args.format, single_file=True,
        )
        print(f"matches: {n_matches}, consolidated: {consolidated.count()}")
    elif args.mode == "transliterate":
        fields = [fc.field for fc in match_fields if fc.transliterate] or None
        out = api.transliterate_dataset(
            spark, args.input1, target_lang=args.target_lang,
            transliteration_standard=args.standard, fields=fields,
            field_mapping=name_fields,
        )
        if args.output:
            if args.format == "csv":
                out.coalesce(1).write.mode("overwrite").option("header", True).csv(args.output)
            else:
                out.coalesce(1).write.mode("overwrite").json(args.output)
        print(f"transliterated rows: {out.count()}")
    else:  # generate
        d1, d2 = api.generate_test_datasets(
            spark, n=args.count, language=args.language, seed=args.seed
        )
        if args.output:
            d1.coalesce(1).write.mode("overwrite").json(f"{args.output}/original")
            d2.coalesce(1).write.mode("overwrite").json(f"{args.output}/variant")
        print(f"generated: {d1.count()} originals, {d2.count()} variants")
    return 0


if __name__ == "__main__":
    sys.exit(main())
