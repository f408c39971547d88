"""CI pin for the oracle-window rotation rules.

tools/check_rotation.py enforces rule A (touched modules in-window),
rule B (nothing >1 round stale) and rule C (window vs latest artifact)
— previously run only from the CLI/verify sweep; a forgotten run let
the r5 rotation silently fail.  This wrapper makes a rotation violation
a red pytest.  No Spark session: the tool is pure catalog + git + JSON.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rotation_rules_hold():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_rotation.py")],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, f"rotation violated:\n{r.stdout}\n{r.stderr}"
