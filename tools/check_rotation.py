#!/usr/bin/env python
"""Audit the first-50 oracle-window rotation, driver-effectively.

The driver's correctness harness verifies only the FIRST 50 entries of
``__spark_entry__.queries()`` per round (CORRECTNESS_r{N}.json).  Round 5
showed why this tool must model the DRIVER's view, not the plan: the
planned catalog order was silently displaced by a module-scope import in
__spark_entry__, and the r4-planned rotation never reached the driver
(VERDICT r5).  Since round 6 the order is pinned by
catalog._WINDOW_ORDER, and this auditor:

  * imports __spark_entry__ exactly the way the driver does (by file
    path, with the repo root on sys.path) and reads queries() from it —
    any future registration-order side effect shows up here;
  * rule A: every query whose defining module changed since the last
    round boundary is inside the window;
  * rule B: every out-of-window query has a green row no older than
    latest-recorded-round − 1 (nothing rots unverified);
  * rule C: the window is cross-checked against the CORRECTNESS
    artifact.  If the current window set equals the latest artifact's
    key set (i.e. the artifact was produced from this catalog), every
    in-window query must have a green row.  Mid-round, right after a
    rotation, the sets legitimately differ — that is reported but not
    fatal unless --expect-artifact-match is given (use it post-round /
    in the judge's run to enforce "the rotation actually happened").

Usage:  python tools/check_rotation.py [--expect-artifact-match]
Exit 1 on any rule A/B violation, on rule C when the sets match but a
row is not green, or (with the flag) when the sets do not match.
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import re
import subprocess
import sys

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_effective_names() -> tuple[list[str], dict[str, str]]:
    """queries() order exactly as the driver sees it, plus defining module."""
    sys.path.insert(0, REPO)
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)
    names = list(entry_mod.queries().keys())
    from debezium_nats_cdc_spark import catalog

    mods = {n: e.fn.__module__ for n, e in catalog.entries().items()}
    return names, mods


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


def _artifacts() -> list[tuple[int, dict]]:
    out = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            out.append((rnd, json.load(f)))
    return out


def _is_green(rec: dict) -> bool:
    return bool(rec.get("rows_match") and rec.get("schema_match")
                and rec.get("hash_match"))


def main() -> int:
    expect_match = "--expect-artifact-match" in sys.argv[1:]
    names, mods = _driver_effective_names()
    window = names[:WINDOW]
    outside = names[WINDOW:]

    boundary = _last_round_boundary()
    touched = _touched_modules(boundary)
    arts = _artifacts()
    latest_rnd, latest_art = (arts[-1] if arts else (0, {}))
    green: dict[str, int] = {}
    for rnd, data in arts:
        for q, rec in data.items():
            if _is_green(rec):
                green[q] = max(green.get(q, 0), rnd)

    print(f"catalog (driver-effective via __spark_entry__): {len(names)} "
          f"queries; window = first {WINDOW}; {len(outside)} outside")
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
    for i, name in enumerate(names):
        if mods[name] in touched and i >= WINDOW:
            ok = False
            print(f"FAIL rule A: {name} (from touched {mods[name]}) sits at "
                  f"position {i + 1}, outside the {WINDOW}-query window")
    for q in outside:
        rnd = green.get(q)
        if rnd is None or rnd < latest_rnd - 1:
            ok = False
            print(f"FAIL rule B: {q} outside the window with last green "
                  f"{'r' + str(rnd) if rnd else 'never'} "
                  f"(latest recorded round is r{latest_rnd})")

    # rule C: window vs artifact
    wset, aset = set(window), set(latest_art)
    if wset == aset:
        bad = [q for q in window if not _is_green(latest_art.get(q, {}))]
        if bad:
            ok = False
            for q in bad:
                print(f"FAIL rule C: {q} is in the window and in "
                      f"CORRECTNESS_r{latest_rnd:02d} but NOT green")
        else:
            print(f"rule C: window set == CORRECTNESS_r{latest_rnd:02d} key "
                  f"set, all {WINDOW} green")
    else:
        msg = (f"rule C: window set != CORRECTNESS_r{latest_rnd:02d} key set "
               f"(window-only: {sorted(wset - aset)}; artifact-only: "
               f"{sorted(aset - wset)})")
        if expect_match:
            ok = False
            print(f"FAIL {msg}")
        else:
            print(f"{msg} — expected mid-round right after a rotation; "
                  f"rerun with --expect-artifact-match once the round's "
                  f"artifact lands")

    print("rotation OK" if ok else "rotation VIOLATED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
