"""CI-style smoke for the user-facing examples (round-4 opener): each
flagship example must run end-to-end at sf0.001 in its own process
(every example owns and stops a SparkSession, so subprocess isolation
keeps them from killing the pytest session fixture) and exit 0 with
non-empty stdout. This is bit-rot insurance for the documented API
surface, not a correctness gate — the registered queries the examples
compose are oracle-gated elsewhere."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

FLAGSHIPS = [
    "quickstart.py",
    "curation_report.py",
    "data_readiness.py",
    "sketch_monitoring.py",
    "telemetry_forecasting.py",
    "i18n_health_check.py",
]


@pytest.mark.parametrize("script", FLAGSHIPS)
def test_example_runs(script):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), SF],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert len(proc.stdout.strip()) > 0, "example printed nothing"
