#!/usr/bin/env python3
"""Bench regression gate — run before committing a round's perf work.

Compares a fresh bench result against the newest committed
BENCH_r*.json artifact and FAILS (exit 1) if any headline query's
median exceeds 1.5x the prior round's UPPER SPREAD BOUND for that
query — i.e. a regression that can't be explained by the measured
run-to-run variance. Queries new this round (no prior entry) and
queries the prior round lacked spread data for are reported but never
fail the gate.

Usage:
    python tools/bench_gate.py fresh.json     # gate a saved bench line
    python bench.py | tail -1 > /tmp/b.json && python tools/bench_gate.py /tmp/b.json
    python tools/bench_gate.py                # runs bench.py itself

The prior artifact is whichever BENCH_r{N}.json in the repo root has
the highest N; its payload sits under the driver's "parsed" key (a
raw bench.py line is also accepted, so the gate can compare two local
runs). The 1.5x-of-upper-bound rule is deliberately loose: the gate
exists to catch structural regressions (a lost broadcast, a new
shuffle, an extra batch), not to flag host noise.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

FACTOR = 1.5

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_prior(root: str = REPO_ROOT) -> tuple[int, dict] | None:
    """(round, parsed bench payload) of the newest BENCH_r*.json, or
    None when no artifact exists (round 1)."""
    best = None
    for path in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, path)
    if best is None:
        return None
    with open(best[1]) as f:
        doc = json.load(f)
    parsed = doc.get("parsed", doc)  # accept a raw bench.py line too
    if not isinstance(parsed, dict) or "queries" not in parsed:
        return None
    return best[0], parsed


def gate(current: dict, prior: dict) -> tuple[list[str], list[str]]:
    """(failures, notes) comparing current medians to prior bounds."""
    failures: list[str] = []
    notes: list[str] = []
    prior_q = prior.get("queries", {})
    prior_spread = prior.get("spread", {})
    # The worst regression class first: a query the prior round
    # measured that this run did not produce at all (bench.py fault-
    # isolates a broken query out of 'queries') — a silent pass here
    # would hide exactly the structural breakage the gate exists for.
    cur_q = current.get("queries", {})
    for name in sorted(set(prior_q) - set(cur_q)):
        failures.append(
            f"FAIL  {name}: present in prior round but MISSING from this "
            "run (errored or dropped) — a vanished query is a regression, "
            "not a skip"
        )
    for name, cur_med in sorted(cur_q.items()):
        if name not in prior_q:
            notes.append(f"NEW   {name}: {cur_med}s (no prior entry)")
            continue
        bounds = prior_spread.get(name)
        upper = bounds[1] if isinstance(bounds, list) and len(bounds) == 2 \
            else prior_q[name]
        limit = FACTOR * upper
        if cur_med > limit:
            failures.append(
                f"FAIL  {name}: median {cur_med}s > {FACTOR}x prior upper "
                f"{upper}s (limit {round(limit, 3)}s)"
            )
        else:
            notes.append(
                f"ok    {name}: {cur_med}s <= {round(limit, 3)}s"
            )
    return failures, notes


def main(argv: list[str]) -> int:
    if len(argv) > 1:
        with open(argv[1]) as f:
            # last non-empty line = the bench JSON (bench.py contract)
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        current = json.loads(lines[-1])
    else:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "bench.py")],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        lines = [ln for ln in out.splitlines() if ln.strip().startswith("{")]
        current = json.loads(lines[-1])

    prior = load_prior()
    if prior is None:
        print("bench_gate: no prior BENCH_r*.json — nothing to gate against")
        return 0
    rnd, prior_parsed = prior
    failures, notes = gate(current, prior_parsed)
    print(f"bench_gate: current vs BENCH_r{rnd:02d} "
          f"(rule: median <= {FACTOR}x prior upper spread)")
    for line in notes:
        print("  " + line)
    for line in failures:
        print("  " + line)
    if failures:
        print(f"bench_gate: {len(failures)} regression(s) — investigate "
              "before committing (a lost broadcast / new shuffle / extra "
              "micro-batch, not host noise, is the usual cause)")
        return 1
    print("bench_gate: PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
