"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so sharding / multi-chip code
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path).  Note: this container's sitecustomize registers the axon
TPU plugin and sets ``jax_platforms=axon,cpu`` at interpreter start, so the
env var alone is not enough — we must update the jax config explicitly.
"""

import os
import tempfile

# isolate the advisory TPU-channel lockfile and bench-priority flag: tests
# exercising register_cli/acquire in-process must never see (or clear!) the
# REAL /tmp lock held by a live background lane on this host
_lockdir = tempfile.mkdtemp(prefix="tneq_test_locks_")
os.environ.setdefault("TNEQ_TPU_LOCK_PATH", os.path.join(_lockdir, "tpu.lock"))
os.environ.setdefault(
    "TNEQ_TPU_PRIORITY_PATH", os.path.join(_lockdir, "bench_priority.flag"))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"


@pytest.fixture(autouse=True)
def _isolated_tpu_lock(monkeypatch):
    """Re-pin the isolated lock/priority paths before EVERY test.

    The module-level ``setdefault`` above is not enough: a full-suite run
    on 2026-08-19 had ``test_run_all_cli`` read the REAL
    ``/tmp/tneq_tpu_client.lock`` (held by a live background protocol
    lane) and fail with its BUSY exit — the env var had been perturbed
    mid-session.  Pinning per-test makes that class of pollution
    structurally impossible; tests that want their own path (e.g.
    ``test_tpulock``) still override via their own ``monkeypatch``.
    """
    monkeypatch.setenv("TNEQ_TPU_LOCK_PATH", os.path.join(_lockdir, "tpu.lock"))
    monkeypatch.setenv(
        "TNEQ_TPU_PRIORITY_PATH", os.path.join(_lockdir, "bench_priority.flag"))
