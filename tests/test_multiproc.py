"""2-process jax.distributed dry run (parallel/multihost.py end to end)."""

import json
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_dryrun():
    r = subprocess.run(
        [sys.executable, "-m", "tneq_tpu.bench.multiproc_dryrun"],
        capture_output=True, text=True, timeout=480,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["n_processes"] == 2 and rec["n_devices"] == 8
