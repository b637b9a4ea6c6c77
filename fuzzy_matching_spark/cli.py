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


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fuzzy-matching-spark")
    ap.add_argument("--mode", choices=["match", "transliterate", "generate"], required=True)
    ap.add_argument("--input1")
    ap.add_argument("--input2")
    ap.add_argument("--match-fields", dest="match_fields")
    ap.add_argument("--name-fields", dest="name_fields")
    ap.add_argument("--threshold", type=float, default=0.7)  # CLI default, process_data.py:291
    ap.add_argument("--block-field", dest="block_field")
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
            spark, args.input1, args.input2, config=config, field_mapping=name_fields
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
