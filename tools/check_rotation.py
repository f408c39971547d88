#!/usr/bin/env python
"""Audit the catalog's first-50 oracle-window rotation.

The driver's correctness harness verifies only the FIRST 50 registered
catalog queries per round (CORRECTNESS_r{N}.json), so registration
order in catalog._load_modules is load-bearing.  The rotation contract:

  A. every query whose defining module changed since the last round
     boundary registers INSIDE the window (touched code gets re-proven);
  B. the remaining slots go to the queries whose last driver-green row
     is OLDEST (nothing goes unverified for rounds on end).

This tool checks A mechanically and reports the data for B: for every
query, its window position and the last round with a green
(rows+schema+hash) row in the CORRECTNESS artifacts.  COVERAGE.md's
rotation statement cites this output instead of hand-counted numbers
(a hand count was wrong in r4: "21 outside" vs the true 23).

Usage:  python tools/check_rotation.py   (run from the repo root)
Exit 1 if rule A is violated or an out-of-window query has no green row
in the last two recorded rounds.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_round_boundary() -> str | None:
    """Commit hash of the most recent driver round-artifact commit."""
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(r"round \d+: verdict", subject):
            return sha
    return None


def _touched_modules(since: str | None) -> set[str]:
    if since is None:
        return set()
    out = subprocess.run(
        ["git", "diff", "--name-only", f"{since}..HEAD"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    # uncommitted work counts as touched too
    out += subprocess.run(
        ["git", "diff", "--name-only", "HEAD"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    mods = set()
    for path in out.splitlines():
        m = re.match(r"debezium_nats_cdc_spark/operators/(\w+)\.py$", path)
        if m:
            mods.add(f"debezium_nats_cdc_spark.operators.{m.group(1)}")
    return mods


def _green_rounds() -> dict[str, int]:
    """query -> last round number with rows+schema+hash all true."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for q, rec in data.items():
            if rec.get("rows_match") and rec.get("schema_match") \
                    and rec.get("hash_match"):
                last[q] = max(last.get(q, 0), rnd)
    return last


def main() -> int:
    sys.path.insert(0, REPO)
    from debezium_nats_cdc_spark import catalog

    entries = catalog.entries()
    names = list(entries)
    window = set(names[:WINDOW])
    outside = names[WINDOW:]

    boundary = _last_round_boundary()
    touched = _touched_modules(boundary)
    green = _green_rounds()
    recorded_rounds = sorted(
        {int(re.search(r"_r(\d+)\.json$", p).group(1))
         for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))}
    )
    latest = recorded_rounds[-1] if recorded_rounds else 0

    violations = []
    for i, name in enumerate(names):
        mod = entries[name].fn.__module__
        if mod in touched and i >= WINDOW:
            violations.append(
                f"rule A: {name} (from touched {mod}) sits at position "
                f"{i + 1}, outside the {WINDOW}-query window"
            )

    stale = [
        (q, green.get(q))
        for q in outside
        if green.get(q) is None or green[q] <= latest - 2
    ]

    print(f"catalog: {len(names)} queries; window = first {WINDOW}; "
          f"{len(outside)} outside")
    print(f"round boundary: {boundary[:9] if boundary else '<none>'}; "
          f"touched operator modules: "
          f"{sorted(m.rsplit('.', 1)[-1] for m in touched) or '[]'}")
    by_round: dict[int | None, list[str]] = {}
    for q in outside:
        by_round.setdefault(green.get(q), []).append(q)
    for rnd in sorted(by_round, key=lambda r: (r is None, r)):
        qs = by_round[rnd]
        label = f"r{rnd}" if rnd else "never"
        print(f"  outside window, last green {label}: {len(qs)} "
              f"({', '.join(qs)})")

    ok = True
    for v in violations:
        ok = False
        print(f"FAIL {v}")
    if stale:
        ok = False
        for q, rnd in stale:
            print(f"FAIL rule B: {q} outside the window with last green "
                  f"{'r' + str(rnd) if rnd else 'never'} "
                  f"(latest recorded round is r{latest})")
    print("rotation OK" if ok else "rotation VIOLATED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
