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


def test_recover_from_tail_start_truncated():
    """Round 8's failure mode: the driver's 2,000-char tail capture cut
    the START of the bench line (mid-`queries`). Recovery must rebuild a
    payload with the surviving queries plus spread/components."""
    full = json.dumps(
        {
            "metric": "headline_queries_wall_clock",
            "value": 9.9,
            "unit": "sec",
            "queries": {f"q{i:02d}": 0.1 * i for i in range(30)},
            "spread": {f"q{i:02d}": [0.1 * i, 0.2 * i] for i in range(30)},
            "reps": 3,
            "sf": 0.1,
            "components": {"c1": 1.0},
        }
    )
    cut = full.find('"q10"') - 2  # start cut off inside the queries map
    doc = bench_gate.recover_from_tail(full[cut:])
    assert doc is not None
    assert isinstance(doc["queries"], dict) and doc["queries"]
    assert doc["queries"]["q29"] == 0.1 * 29
    assert doc["components"] == {"c1": 1.0}
    assert "q05" not in doc["queries"]  # lost to truncation, by design
    assert len(doc["spread"]) == 30  # spread survived whole

    # a cut landing inside `spread` instead must NOT mislabel the
    # [min,max] pairs as query medians — queries degrades to empty
    cut2 = full.find('"q10": [') - 2
    doc2 = bench_gate.recover_from_tail(full[cut2:])
    assert doc2 is not None
    assert doc2["queries"] == {}
    assert doc2["spread"]["q29"] == [0.1 * 29, 0.2 * 29]


def test_recover_from_tail_cut_past_queries_never_mislabels():
    """A tail whose cut lands INSIDE pipelines/components (an r8-style
    line only slightly over the capture) must not relabel those
    section entries as headline queries — gate() would otherwise
    report each as a vanished query and fail a healthy commit."""
    full = json.dumps(
        {
            "metric": "m",
            "value": 9.9,
            "queries": {f"q{i:02d}": 0.5 for i in range(20)},
            "reps": 3,
            "sf": 0.1,
            "pipelines": {"dedup_e2e": 6.44},
            "components": {f"c{i}": 1.0 for i in range(8)},
        }
    )
    # cut inside pipelines: the queries-rewrap parses but lacks the
    # reps/sf markers, so it must be rejected; recovery degrades to
    # the bare wrap at the components boundary — empty queries (the
    # gate then skips with a warning), components preserved
    cut = full.find('"dedup_e2e"') - 2
    doc = bench_gate.recover_from_tail(full[cut:])
    assert doc is not None
    assert doc["queries"] == {}
    assert doc["components"] == {f"c{i}": 1.0 for i in range(8)}
    # cut inside components (the LAST section): nothing labelable
    # survives — recovery must return None, never a mislabeled doc
    cut2 = full.find('"c3"') - 2
    assert bench_gate.recover_from_tail(full[cut2:]) is None


def test_load_prior_merges_spread_when_parsed_null(tmp_path):
    """An r9+-shaped artifact with parsed:null whose tail still holds
    BOTH lines: the rebuilt main payload must pick the spread line up
    too, or the gate silently tightens to 1.5x-median."""
    spread_line = json.dumps({"spread": {"a": [0.4, 0.6], "b": [1.0, 1.2]}})
    main_line = json.dumps(
        {
            "metric": "m",
            "value": 1,
            "queries": {"a": 0.5, "b": 1.1},
            "reps": 3,
            "sf": 0.1,
        }
    )
    art = {
        "n": 9,
        "rc": 1,
        "parsed": None,
        "tail": spread_line + "\n" + main_line,
    }
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(art))
    rnd, parsed = bench_gate.load_prior(root=str(tmp_path))
    assert rnd == 9
    assert parsed["queries"] == {"a": 0.5, "b": 1.1}
    assert parsed["spread"] == {"a": [0.4, 0.6], "b": [1.0, 1.2]}


def test_recover_from_tail_full_line_present():
    line = json.dumps({"metric": "x", "value": 1, "queries": {"a": 0.5}})
    doc = bench_gate.recover_from_tail("noise\n" + line)
    assert doc == {"metric": "x", "value": 1, "queries": {"a": 0.5}}


def test_load_prior_recovers_bench_r08_shape(tmp_path):
    """A driver artifact with parsed:null but a raw tail (the literal
    BENCH_r08 shape) must still produce a usable prior."""
    full = json.dumps(
        {
            "metric": "m",
            "value": 5,
            "queries": {f"q{i}": float(i) for i in range(40)},
            "spread": {f"q{i}": [float(i), float(i) + 0.1] for i in range(40)},
            "components": {"c": 2.0},
        }
    )
    art = {"n": 8, "rc": 0, "parsed": None, "tail": full[-2000:]}
    (tmp_path / "BENCH_r08.json").write_text(json.dumps(art))
    prior = bench_gate.load_prior(root=str(tmp_path))
    assert prior is not None
    rnd, parsed = prior
    assert rnd == 8
    assert parsed["queries"] and parsed["spread"]


def test_load_prior_merges_spread_from_tail(tmp_path):
    """bench.py ≥ r9 prints spread on its own line; when the driver's
    parsed payload lacks it, load_prior picks it up from the raw tail."""
    spread_line = json.dumps({"spread": {"a": [0.4, 0.6]}})
    main_line = json.dumps({"metric": "m", "value": 1, "queries": {"a": 0.5}})
    art = {
        "n": 9,
        "rc": 0,
        "parsed": json.loads(main_line),
        "tail": spread_line + "\n" + main_line,
    }
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(art))
    rnd, parsed = bench_gate.load_prior(root=str(tmp_path))
    assert rnd == 9
    assert parsed["spread"] == {"a": [0.4, 0.6]}


def test_load_prior_recovers_truncated_spread_line(tmp_path):
    """THE realistic r9+ artifact shape at the full catalog census:
    spread line + main line together exceed the 2,000-char tail
    capture, so the spread line's START is cut off. load_prior must
    still recover the surviving spread entries (partial is fine — the
    gate medians-fallback only the lost ones); without this the gate
    silently tightens from 1.5x-upper-bound to 1.5x-median for every
    query and host noise starts failing commits."""
    import bench  # noqa: F401  (census source)

    names = bench.HEADLINE + bench.OPTIONAL
    spread_line = json.dumps(
        {
            "spread": {
                n: [9.111, 9.999]
                for n in names + bench.PIPELINES + bench.COMPONENTS
            }
        }
    )
    main_line = json.dumps(
        {
            "metric": "headline_queries_wall_clock",
            "value": 99.9,
            "unit": "sec",
            "queries": {n: 9.5 for n in names},
            "reps": 3,
            "sf": 0.1,
            "pipelines": {n: 9.5 for n in bench.PIPELINES},
            "components": {n: 9.5 for n in bench.COMPONENTS},
        }
    )
    two_lines = spread_line + "\n" + main_line
    assert len(two_lines) > 2000, "census shrank; adjust the test"
    art = {
        "n": 9,
        "rc": 0,
        "parsed": json.loads(main_line),
        "tail": two_lines[-2000:],
    }
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(art))
    rnd, parsed = bench_gate.load_prior(root=str(tmp_path))
    assert rnd == 9
    spread = parsed.get("spread")
    assert spread, "truncated spread line must still yield entries"
    # assert on the LAST-written spread entry: it survives any
    # truncation depth, so this stays valid as the census grows (a
    # fixed mid-line key would fall off the 2,000-char window whenever
    # COMPONENTS gains entries after it)
    assert spread[bench.COMPONENTS[-1]] == [9.111, 9.999]
    assert all(isinstance(v, list) for v in spread.values())


def test_bench_final_line_fits_driver_tail_capture():
    """The driver records only the last 2,000 stdout chars; the parsed
    bench line must stay under 1,800 with headroom. Simulate the line at
    the current catalog's full key census with worst-case-width values."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    val = 99.999  # wider than any real sf0.1 median
    # growth headroom: simulate FIVE future components beyond the live
    # census (each new catalog key adds ~30 chars to the parsed line),
    # so registry growth trips this test several keys BEFORE it trips
    # the driver's capture
    headroom = [f"future_component_padding_{i}" for i in range(5)]
    out = {
        "metric": "headline_queries_wall_clock",
        "value": 9999.999,
        "unit": "sec",
        "queries": {n: val for n in bench.HEADLINE + bench.OPTIONAL},
        "reps": 3,
        "sf": 0.1,
        "pipelines": {n: val for n in bench.PIPELINES},
        "components": {n: val for n in bench.COMPONENTS + headroom},
        # error DETAILS go on their own line; the parsed line carries
        # only this count, so a failing run stays under the capture too
        "n_errors": 99,
    }
    line = json.dumps(out)
    assert len(line) < 1800, (
        f"bench line would be {len(line)} chars (incl. 5-component "
        "headroom) — trim COMPONENTS or move another section to its "
        "own line before the driver's 2,000-char tail capture "
        "truncates the artifact again"
    )


def test_gate_fails_on_vanished_query():
    """A query the prior round measured but the current run omitted
    (bench fault-isolated it) must FAIL the gate, not silently pass."""
    cur = {"queries": {"q_fast": 0.5, "q_spready": 1.0}}  # q_nospread gone
    failures, _ = bench_gate.gate(cur, PRIOR)
    assert len(failures) == 1
    assert "q_nospread" in failures[0] and "MISSING" in failures[0]


def test_cli_skips_with_warning_when_prior_unrecoverable(tmp_path):
    """An artifact whose medians cannot be recovered must make the CLI
    exit 0 with an explicit SKIPPED warning — never the misleading
    'nothing to gate against', and never a vacuous all-NEW pass."""
    import shutil

    # tmp_path acts as the repo root: the copied tool's REPO_ROOT is
    # dirname(dirname(tool)) = tmp_path, whose only artifact has an
    # unusable tail
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"n": 8, "rc": 1, "parsed": None, "tail": "garbage }}"})
    )
    tool_copy = tmp_path / "tools" / "bench_gate.py"
    tool_copy.parent.mkdir()
    shutil.copy(_TOOL, tool_copy)
    cur = tmp_path / "cur.json"
    cur.write_text(json.dumps({"queries": {"a": 0.5}}) + "\n")
    r = subprocess.run(
        [sys.executable, str(tool_copy), str(cur)],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SKIPPED" in r.stdout
    assert "nothing to gate against" not in r.stdout
