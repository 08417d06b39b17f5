"""Opt-in scale-stress gate: runs stress.py (adversarial hot-key shapes
with task-input assertions from the Spark status REST API) in its own
JVM, because the shared test session runs with the UI disabled.

Slow (~2-4 min) and orthogonal to correctness, so it is gated behind
SPARK_GRAFT_STRESS=1 rather than slowing every suite run:

    SPARK_GRAFT_STRESS=1 python -m pytest tests/test_scale_stress.py
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_STRESS"),
    reason="set SPARK_GRAFT_STRESS=1 to run the ~3-min stress kit",
)
def test_stress_bounds_hold():
    proc = subprocess.run(
        [sys.executable, "/root/repo/stress.py"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stress kit failed:\n{proc.stdout[-3000:]}"
    assert "ALL BOUNDS HOLD" in proc.stdout
