"""Pure-Python locks on the scaling-artifact math in bench.py.

No SparkSession: these tests exercise the floor/composite-ceiling
arithmetic and the calibration staleness guards that BENCH/BASELINE.md
rests on — the renderer must never silently mis-normalize a 2.5-hour
measurement.
"""

import importlib.util
import json
import os

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    (tmp_path / "BENCH").mkdir()
    return mod


def _pair(floor_eff=0.676, tn=164.1, tm=60.7, phases=True):
    pf_n = {"ingest.tag": 10.0, "minhash.sig8": 40.0, "minhash.estimate": 88.0,
            "edges.total_edges": 18.0, "cluster.components": 1.2,
            "cluster.finalize": 1.6}
    pf_m = {"ingest.tag": 3.0, "minhash.sig8": 12.0, "minhash.estimate": 29.0,
            "edges.total_edges": 5.6, "cluster.components": 0.7,
            "cluster.finalize": 1.1}
    rounds = [{"order": "AB", "t2": tn, "t8": tm, "eff": floor_eff}] * 5
    p = {"n": 2, "m": 8, "rounds": rounds, "floor_eff": floor_eff,
         "median_ratio_eff": floor_eff, "floor_tn": tn, "floor_tm": tm,
         "fastest3_tn": [tn] * 3, "fastest3_tm": [tm] * 3}
    if phases:
        p["phase_floors"] = {"2": pf_n, "8": pf_m}
    return p


def _write_cal(bench, fname, ceiling, rows=264471, protocol=None):
    with open(os.path.join(bench.REPO, "BENCH", fname), "w") as f:
        json.dump({"rows": rows,
                   "protocol": protocol or bench.PROTOCOL_NAME,
                   "ceilings": {"2->8": ceiling}, "floors": {}}, f)


def test_composite_ceiling_weighs_phases(bench, capsys):
    """cpu phases use the null ceiling, exchange the shuffle ceiling,
    serial + unattributed wall stay at 1.0."""
    _write_cal(bench, "calibration.json", 0.937)
    _write_cal(bench, "calibration_shuffle.json", 0.75)
    pair = _pair()
    bench._finish_scaling(264471, [pair], [120063], "dedup")
    # hand-computed: attributed=51.4, resid=60.7-51.4=9.3
    # num = 12*0.937 + (3+29+5.6+1.1)*0.75 + (0.7)*1.0 + 9.3*1.0
    pf = pair["phase_floors"]["8"]
    attributed = sum(pf.values())
    resid = 60.7 - attributed
    num = (pf["minhash.sig8"] * 0.937
           + (pf["ingest.tag"] + pf["minhash.estimate"]
              + pf["edges.total_edges"] + pf["cluster.finalize"]) * 0.75
           + pf["cluster.components"] * 1.0 + resid * 1.0)
    expected = round(num / 60.7, 3)
    assert pair["ceiling"] == expected
    assert pair["ceiling_kind"].startswith("composite")
    assert pair["norm_eff"] == round(min(0.676 / expected, 1.0), 3)
    # ceiling must sit strictly between the two instruments
    assert 0.75 < pair["ceiling"] < 1.0


def test_falls_back_to_flat_null_without_shuffle_cal(bench):
    _write_cal(bench, "calibration.json", 0.937)
    pair = _pair()
    bench._finish_scaling(264471, [pair], [120063], "dedup")
    assert pair["ceiling"] == 0.937
    assert pair["ceiling_kind"] == "null-flat"


def test_stale_calibration_is_refused(bench, capsys):
    """A ceiling from a different corpus size or protocol must not
    normalize this run (ADVICE r4)."""
    _write_cal(bench, "calibration.json", 0.937, rows=999)
    _write_cal(bench, "calibration_shuffle.json", 0.75,
               protocol="some_older_protocol")
    pair = _pair()
    bench._finish_scaling(264471, [pair], [120063], "dedup")
    assert pair["ceiling"] is None and pair["norm_eff"] is None
    err = capsys.readouterr().err
    assert "stale" in err


def test_missing_phases_degrades_to_flat(bench):
    """Raw files persisted by an older bench.py carry no phase floors —
    the renderer must fall back, not crash or fabricate."""
    _write_cal(bench, "calibration.json", 0.937)
    _write_cal(bench, "calibration_shuffle.json", 0.75)
    pair = _pair(phases=False)
    bench._finish_scaling(264471, [pair], [120063], "dedup")
    assert pair["ceiling"] == 0.937
    assert pair["ceiling_kind"] == "null-flat"


def test_baseline_md_reports_raw_first_and_phase_table(bench):
    _write_cal(bench, "calibration.json", 0.937)
    _write_cal(bench, "calibration_shuffle.json", 0.75)
    bench._finish_scaling(264471, [_pair()], [120063], "dedup")
    md = open(os.path.join(bench.REPO, "BENCH", "BASELINE.md")).read()
    # raw number appears before the normalized one, and both are labeled
    assert md.index("Floor efficiency 2 -> 8: 0.676") < md.index(
        "Box-normalized 2 -> 8:")
    assert "Phase attribution" in md
    assert "| minhash.sig8 | cpu |" in md
    assert "| minhash.estimate | exchange |" in md
    assert "unattributed" in md
    # the gate line is computed on the RAW worst pair, never the
    # normalized one
    assert "Worst N -> 4N pair (raw floor estimate): 0.676" in md


def test_every_pipeline_phase_is_classified(bench):
    """New barrier labels must be added to PHASE_KIND deliberately —
    unknown labels default to 'serial' (ceiling 1.0), which silently
    deflates the normalized number."""
    expected = {"ingest.tag", "minhash.sig8", "minhash.estimate",
                "minhash.ambiguous_pairs", "edges.total_edges",
                "cluster.components", "cluster.finalize"}
    assert expected == set(bench.PHASE_KIND)


def test_shuffle_cal_writer_persists_json(bench):
    pair = _pair(phases=False)
    bench._write_shuffle_calibration_md(264471, [pair], {2: 164.1, 8: 60.7})
    cal = json.load(open(os.path.join(bench.REPO, "BENCH",
                                      "calibration_shuffle.json")))
    assert cal["rows"] == 264471
    assert cal["protocol"] == bench.PROTOCOL_NAME
    assert cal["ceilings"] == {"2->8": 0.676}
