"""Foreign-session regression gate (see tools/vanilla_gate.py).

Every query the driver will verify this round must run on a VANILLA
SparkSession — none of session.py:get_spark's confs. The engine's own
582-test suite runs on its own session, so a query that silently
depends on a builder conf (ANSI off, Arrow on, python.filterPushdown,
nanosAsLong …) passes locally and fails in the driver's environment;
that was `delta_pysource_pruned_batch` in rounds 7-8.

The gate runs in a SUBPROCESS: `getOrCreate()` in this process would
return the already-built engine session, which is exactly what must NOT
happen here.
"""
from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_driver_window_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "vanilla_gate.py"),
         "/root/testdata/sf0.001", "50"],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=str(REPO),
    )
    # a crash before the JSON line (session startup, import error, OOM
    # kill) must surface its stderr, not a bare length-assert failure
    assert proc.stdout.strip(), (
        f"vanilla gate produced no output (rc={proc.returncode})\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert not result.get("failed"), (
        f"queries fail on a vanilla (foreign) session: {result['failed']}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    assert len(result.get("passed", [])) == 50
    assert proc.returncode == 0, proc.stderr[-2000:]
