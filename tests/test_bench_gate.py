"""Unit tests for the round-workflow bench regression gate
(tools/bench_gate.py) — the check that a perf regression outside
measured run-to-run variance blocks a round commit."""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "bench_gate.py",
)
spec = importlib.util.spec_from_file_location("bench_gate", _TOOL)
bench_gate = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_gate)


PRIOR = {
    "queries": {"q_fast": 0.5, "q_spready": 1.0, "q_nospread": 2.0},
    "spread": {"q_fast": [0.4, 0.6], "q_spready": [0.9, 2.0]},
}


def test_gate_passes_within_bounds():
    cur = {"queries": {"q_fast": 0.85, "q_spready": 2.9, "q_nospread": 2.9}}
    failures, notes = bench_gate.gate(cur, PRIOR)
    # 0.85 <= 1.5*0.6, 2.9 <= 1.5*2.0, 2.9 <= 1.5*2.0 (median fallback)
    assert failures == []
    assert len(notes) == 3


def test_gate_fails_beyond_upper_spread_factor():
    cur = {
        "queries": {"q_fast": 0.91, "q_spready": 3.1, "q_nospread": 2.0}
    }
    failures, _ = bench_gate.gate(cur, PRIOR)
    assert len(failures) == 2
    assert any("q_fast" in f for f in failures)
    assert any("q_spready" in f for f in failures)


def test_gate_ignores_new_queries():
    cur = {
        "queries": {
            "q_brand_new": 99.0,
            "q_fast": 0.5,
            "q_spready": 1.0,
            "q_nospread": 2.0,
        }
    }
    failures, notes = bench_gate.gate(cur, PRIOR)
    assert failures == []
    assert any("NEW" in n and "q_brand_new" in n for n in notes)


def test_gate_cli_end_to_end(tmp_path):
    """The CLI must read a saved bench line, compare against the repo's
    newest BENCH artifact, and exit 0/1 accordingly."""
    prior = bench_gate.load_prior()
    assert prior is not None, "repo should carry BENCH_r*.json artifacts"
    rnd, parsed = prior
    # a 'current' identical to the prior medians always passes
    ok_line = json.dumps(
        {"queries": parsed["queries"], "metric": "x", "value": 1}
    )
    p = tmp_path / "ok.json"
    p.write_text(ok_line + "\n")
    r = subprocess.run(
        [sys.executable, _TOOL, str(p)], capture_output=True, text=True
    )
    assert r.returncode == 0, r.stdout + r.stderr
    # a 100x regression on every query must fail
    bad = {k: v * 100 for k, v in parsed["queries"].items()}
    p2 = tmp_path / "bad.json"
    p2.write_text(json.dumps({"queries": bad}) + "\n")
    r2 = subprocess.run(
        [sys.executable, _TOOL, str(p2)], capture_output=True, text=True
    )
    assert r2.returncode == 1
    assert "FAIL" in r2.stdout


def test_gate_fails_on_vanished_query():
    """A query the prior round measured but the current run omitted
    (bench fault-isolated it) must FAIL the gate, not silently pass."""
    cur = {"queries": {"q_fast": 0.5, "q_spready": 1.0}}  # q_nospread gone
    failures, _ = bench_gate.gate(cur, PRIOR)
    assert len(failures) == 1
    assert "q_nospread" in failures[0] and "MISSING" in failures[0]
