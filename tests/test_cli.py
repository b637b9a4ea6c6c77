"""CLI parser parity + end-to-end mode drives (small, shared session not
used — the CLI builds its own; keep inputs tiny)."""

import json
import subprocess
import sys

import pytest

from fuzzy_matching_spark.cli import parse_match_fields, parse_name_fields
from fuzzy_matching_spark.config import FuzzyAlgorithm


def test_parse_match_fields_full_spec():
    out = parse_match_fields("Фамилия:0.4:true:TOKEN_SET,email:0.1:false")
    assert out[0].field == "Фамилия"
    assert out[0].weight == 0.4
    assert out[0].transliterate is True
    assert out[0].fuzzy_algorithm == FuzzyAlgorithm.TOKEN_SET
    assert out[1].fuzzy_algorithm is None


def test_parse_match_fields_unknown_algorithm_warns():
    with pytest.warns(UserWarning):
        out = parse_match_fields("x:1.0:false:NOPE")
    assert out[0].fuzzy_algorithm is None


def test_parse_match_fields_default():
    out = parse_match_fields(None)
    assert [f.field for f in out] == ["id", "email"]


def test_parse_name_fields():
    assert parse_name_fields("a:b, c:d") == {"a": "b", "c": "d"}
    mf = parse_match_fields("x:1.0")
    assert parse_name_fields(None, mf) == {"x": "x"}
    assert parse_name_fields(None) is None


def test_cli_match_end_to_end(tmp_path):
    d1 = [{"name": "ivan petrov", "email": "a@x.com"}]
    d2 = [{"name": "ivan petrov", "email": "a@x.com"}, {"name": "zzz", "email": "q@q.q"}]
    p1 = tmp_path / "a.json"
    p2 = tmp_path / "b.json"
    p1.write_text(json.dumps(d1))
    p2.write_text(json.dumps(d2))
    proc = subprocess.run(
        [sys.executable, "-m", "fuzzy_matching_spark.cli", "--mode", "match",
         "--input1", str(p1), "--input2", str(p2),
         "--match-fields", "name:0.7,email:0.3",
         "--threshold", "0.7", "--master", "local[2]",
         "--output-matches", str(tmp_path / "m")],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "matches: 1, consolidated: 2" in proc.stdout


def test_demo_mode_runs_all(capsys, spark):
    from fuzzy_matching_spark.cli import run_demo

    assert run_demo(spark, "all") == 0
    out = capsys.readouterr().out
    for kind in ("personal", "business", "translit"):
        assert f"--- demo: {kind} ---" in out
    assert "matches: 2" in out
