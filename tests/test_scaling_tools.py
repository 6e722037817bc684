"""Pure-python tests for the scaling-bench tooling (no Spark): log
re-aggregation, the cleanliness gate disclosure, and the fail-fast
level-set validation. These paths guard multi-hour collections, so a
regression costs a whole bench window — test them cheaply here."""

import json
import subprocess
import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import scaling_bench as sb  # noqa: E402


def _rep(cpus, base, gate=None, alloc=0.3, scale=1.0):
    times = {
        "compact": 100.0 * scale,
        "cluster": 120.0 * scale,
        "merge": 40.0 * scale,
        "scan": 10.0 * scale,
        "verify": 60.0 * scale,
        "cpu_baseline": base,
        "cpu_gate": gate if gate is not None else base,
        "io_baseline": 20.0 * scale,
        "alloc_gate": alloc,
    }
    total = sum(times[s] for s in ("compact", "cluster", "merge", "verify"))
    return {
        "cpus": cpus,
        "times": times,
        "phases": {},
        "rows": 96000,
        "rows_per_sec": round(96000 / total, 1),
        "scan_gbps": 1.0,
        "merge_rows_per_sec": 100.0,
    }


def test_count_clean_gate():
    # rep with gate >1.25x the level's best cpu_baseline is not clean;
    # alloc_gate > 1 s is not clean; others are
    runs = {
        2: [
            _rep(2, base=1.0, gate=1.0),
            _rep(2, base=1.0, gate=1.5),  # noisy window around the rep
            _rep(2, base=1.1, gate=1.2),
            _rep(2, base=1.0, gate=1.0, alloc=2.5),  # host page-fault storm
        ],
        8: [],
    }
    clean = sb.count_clean(runs, [2, 8])
    assert clean == {2: 2, 8: 0}


def test_count_clean_prefers_fresh_probe():
    # a rep carrying the JVM-independent fresh pair is judged on THAT
    # ratio: a contaminated in-JVM post-probe (gate 1.6x) no longer
    # fails a rep whose fresh probes show a quiet box — and vice versa
    contaminated_jvm = _rep(2, base=1.0, gate=1.6)
    contaminated_jvm["times"]["cpu_fresh"] = 2.0
    contaminated_jvm["times"]["cpu_fresh_gate"] = 2.1  # box quiet
    truly_noisy = _rep(2, base=1.0, gate=1.0)
    truly_noisy["times"]["cpu_fresh"] = 2.0
    truly_noisy["times"]["cpu_fresh_gate"] = 3.5  # external load
    legacy_ok = _rep(2, base=1.0, gate=1.1)  # no fresh fields: old rule
    runs = {2: [contaminated_jvm, truly_noisy, legacy_ok]}
    assert sb.count_clean(runs, [2]) == {2: 2}


def test_aggregate_per_stage_minima():
    runs = {
        2: [_rep(2, base=1.0, scale=1.0), _rep(2, base=1.0, scale=2.0)],
        8: [_rep(8, base=0.5, scale=0.5)],
    }
    best = sb.aggregate(runs, [2, 8])
    # minima come from the least-contended rep per stage
    assert best[2]["times"]["compact"] == 100.0
    assert best[2]["n_reps"] == 2
    assert best[8]["times"]["compact"] == 50.0


def test_parse_log_roundtrip(tmp_path):
    # a log line exactly as the live loop prints it (incl. NOISY tag)
    r = _rep(4, base=2.0, gate=3.5)
    line = (
        f"rep0 local[4] [NOISY, discarded]: {r['times']} -> "
        f"{r['rows_per_sec']} rows/s\n"
    )
    p = tmp_path / "bench.log"
    p.write_text(line)
    runs = sb.parse_log(str(p), 96000, [4])
    assert len(runs[4]) == 1
    assert runs[4][0]["times"]["cpu_gate"] == 3.5
    assert sb.count_clean(runs, [4]) == {4: 0}


def test_levels_without_pair_fail_fast():
    # a level set with no N->4N pair must exit BEFORE any collection
    out = subprocess.run(
        [sys.executable, os.path.join("tools", "scaling_bench.py"),
         "96000", "--levels", "3,5,9"],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert out.returncode != 0
    assert "no N->4N pair" in (out.stderr + out.stdout)


def test_report_disclosure_fields(capsys):
    runs = {
        2: [_rep(2, base=1.0)],
        8: [_rep(8, base=0.3, scale=0.25)],
    }
    best = sb.aggregate(runs, [2, 8])
    sb.report(best, [2, 8], 96000, 1, sb.count_clean(runs, [2, 8]))
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["clean_reps"] == {"2": 1, "8": 1}
    assert summary["all_levels_have_clean_reps"] is True
    assert "2->8" in summary["pairs"]
