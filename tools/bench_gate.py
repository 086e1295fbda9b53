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


def recover_from_tail(tail: str) -> dict | None:
    """Best-effort payload recovery from a driver artifact's raw 2,000-char
    stdout ``tail`` when ``parsed`` is null (round 8's failure mode: the
    bench line outgrew the tail capture, so its START is cut off).

    Two shapes are tried, in order:

    1. The full line survived somewhere in the tail — parse the last
       ``{"metric"...}`` span directly.
    2. Only a suffix survived. bench.py's line is
       ``{"metric": ..., "queries": {...}, ["spread": {...},] ...}`` and a
       long line truncates INSIDE the flat ``queries`` map, so the suffix
       looks like ``<partial pair>, "name": 0.265, ...}, "spread": ...}``.
       Re-wrap each candidate cut point (every ``, "``) as either
       ``{"queries": {"<suffix>`` (cut inside queries) or ``{"<suffix>``
       (cut after queries closed) and keep the first candidate that parses
       to a dict containing a dict ``queries``. The recovered payload
       misses the pairs before the cut plus metric/value — enough for the
       gate, which only needs per-query medians and spread bounds.
    """
    m = re.search(r'\{"metric".*\}\s*$', tail, re.S)
    if m:
        try:
            doc = json.loads(m.group(0))
            if isinstance(doc, dict) and "queries" in doc:
                return doc
        except json.JSONDecodeError:
            pass
    last = tail.rstrip().rsplit("\n", 1)[-1]
    for suffix in _rewrap_suffixes(last):
        # wrapper order matters: a cut inside `queries` parses under the
        # spread wrapper too (and vice versa), so each candidate is
        # shape-checked — queries values are scalars, spread values are
        # [min, max] lists — before being trusted. The reps/sf guard
        # pins the cut to the section it claims: those keys FOLLOW
        # queries and spread in bench.py's layout, so a rewrap that
        # lacks them actually cut inside a LATER section (pipelines/
        # components) and would mislabel its entries — gate() would
        # then fail healthy commits with spurious 'vanished query'
        # reports.
        for prefix, section in (
            ('{"queries": {"', "queries"),
            ('{"spread": {"', "spread"),
            ('{"', None),
        ):
            try:
                doc = json.loads(prefix + suffix)
            except json.JSONDecodeError:
                continue
            if not isinstance(doc, dict):
                continue
            if section is not None:
                inner = doc.get(section)
                if not isinstance(inner, dict) or not inner:
                    continue
                want = (int, float) if section == "queries" else list
                if not all(isinstance(v, want) for v in inner.values()):
                    continue
                if "reps" not in doc and "sf" not in doc:
                    continue  # cut landed past the claimed section
                doc.setdefault("queries", {})
                return doc
            if isinstance(doc.get("queries"), dict) and (
                "reps" in doc or "sf" in doc
            ):
                return doc
            if isinstance(doc.get("spread"), dict) or isinstance(
                doc.get("components"), dict
            ):
                # cut after `queries` closed — medians lost, bounds kept
                doc.setdefault("queries", {})
                return doc
    return None


def _rewrap_suffixes(line: str):
    """Candidate suffixes of a START-truncated JSON line: the text
    after each ``, "`` separator begins at a clean ``key": value``
    boundary, so a caller can try re-wrapping each as the interior of
    a known section. Shared by both recovery paths — ONE cut
    heuristic, not two drifting copies."""
    pos = line.find(', "')
    while pos != -1:
        yield line[pos + 3:]
        pos = line.find(', "', pos + 1)


def recover_spread_from_tail(tail: str) -> dict | None:
    """The spread map from an artifact tail, tolerating a START-
    truncated spread line. bench.py prints spread on its own line
    before the parsed line, and at the full catalog census
    spread-line + main-line together EXCEED the driver's 2,000-char
    capture — so the spread line's beginning is routinely cut off.
    A partial spread is still useful: the gate falls back to the
    median bound only for the queries whose [min, max] was lost."""
    # intact line first (spread values are lists, so the inner dict
    # has no nested braces)
    m = re.search(r'\{"spread": (\{[^{}]*\})\}', tail)
    if m:
        try:
            return json.loads(m.group(1))
        except json.JSONDecodeError:
            pass
    first = tail.splitlines()[0] if tail else ""
    if not first.rstrip().endswith("}}"):
        return None
    for suffix in _rewrap_suffixes(first):
        try:
            doc = json.loads('{"spread": {"' + suffix)
        except json.JSONDecodeError:
            continue
        if isinstance(doc, dict):
            inner = doc.get("spread")
            if (
                isinstance(inner, dict)
                and inner
                and all(isinstance(v, list) for v in inner.values())
            ):
                return inner
    return None


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
    tail = doc.get("tail") if isinstance(doc, dict) else None
    if not isinstance(parsed, dict) or "queries" not in parsed:
        # driver couldn't parse the line (it outgrew the tail capture) —
        # reconstruct from the raw tail instead of going blind
        parsed = recover_from_tail(tail) if isinstance(tail, str) else None
        if parsed is None:
            return None
    if "spread" not in parsed and isinstance(tail, str):
        # bench.py ≥ r9 emits spread on its own preceding line to keep
        # the parsed line under the capture limit; pick it back up from
        # the tail — including a start-truncated spread line (the
        # normal case at the full catalog census) and the case where
        # the MAIN payload itself was just rebuilt from the tail
        # (r9+-shaped artifact with parsed:null): without the merge the
        # gate silently tightens to 1.5x-median and host noise starts
        # failing healthy commits
        spread = recover_spread_from_tail(tail)
        if spread is not None:
            parsed = {**parsed, "spread": spread}
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
        # Distinguish 'no artifact' (round 1, a clean pass) from
        # 'artifact exists but its medians were unrecoverable' — the
        # latter is a SKIPPED gate, and saying 'nothing to gate
        # against' there would hide that a regression could be
        # shipping unchecked.
        if glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json")):
            print(
                "bench_gate: WARNING a prior BENCH artifact exists but "
                "its query medians were unrecoverable (tail truncated "
                "beyond recovery) — gate SKIPPED, not passed"
            )
        else:
            print(
                "bench_gate: no prior BENCH_r*.json — nothing to gate "
                "against"
            )
        return 0
    rnd, prior_parsed = prior
    if not prior_parsed.get("queries"):
        print(
            f"bench_gate: WARNING BENCH_r{rnd:02d}'s query medians were "
            "unrecoverable (empty after tail recovery) — gate SKIPPED, "
            "not passed"
        )
        return 0
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
