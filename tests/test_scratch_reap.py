"""Scratch state/index dirs are reaped at process exit and never
shared across invocations (VERDICT r13 task 4: the
`ann_lifecycle._scratch_index_dir` atexit pattern, now also on
`monitor_publish._state_root`).  Reap-on-exit is observed from a real
child process — atexit can't be exercised in-process without ending
the test run."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _exits_reap(snippet: str) -> None:
    out = subprocess.run(
        [sys.executable, "-c", snippet],
        capture_output=True, text=True, check=True, cwd=REPO)
    path = out.stdout.strip().splitlines()[-1]
    assert path.startswith("/"), out.stdout
    assert not os.path.exists(path)


def test_monitor_state_root_reaped_on_exit():
    _exits_reap(
        "from debezium_nats_cdc_spark.operators.monitor_publish "
        "import _state_root\n"
        "import os\n"
        "d = _state_root('reaptest')\n"
        "assert os.path.isdir(d)\n"
        "print(d)\n")


def test_ann_lifecycle_scratch_reaped_on_exit():
    _exits_reap(
        "from debezium_nats_cdc_spark.operators.ann_lifecycle "
        "import _scratch_index_dir\n"
        "import os\n"
        "d = _scratch_index_dir()\n"
        "assert os.path.isdir(d)\n"
        "print(d)\n")


def test_state_roots_never_shared_across_invocations():
    from debezium_nats_cdc_spark.operators.monitor_publish import \
        _state_root

    a, b = _state_root("iso"), _state_root("iso")
    assert a != b
    assert os.path.isdir(a) and os.path.isdir(b)
    assert not os.listdir(a) and not os.listdir(b)
