"""`core/dist.py` launch-configuration validation (ADVICE r4).

The hazards these pin: a PARTIAL launcher config (FPG_COORDINATOR without
FPG_NUM_PROCESSES, or similar) silently running single-process per host —
every host then claims process_index 0, passes the `is_coordinator()`
gate, and clobbers shared checkpoints; and a failed real-pod
auto-detection degrading the same way on a host that managed-job env vars
say is part of a pod. Both must raise, not no-op.

These tests never actually initialize jax.distributed — every failure
path raises BEFORE touching the backend, which is exactly the property
under test. The happy paths (full triple, real bring-up) are covered by
tests/test_pod_rehearsal.py in real subprocesses.
"""

import pytest

from faceposegenerator_tpu.core import dist


def test_partial_config_coordinator_only_raises(monkeypatch):
    monkeypatch.setenv("FPG_COORDINATOR", "localhost:9999")
    monkeypatch.delenv("FPG_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("FPG_PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="partial multi-process"):
        dist.maybe_init_from_env()


def test_partial_config_numprocs_without_coordinator_raises(monkeypatch):
    monkeypatch.delenv("FPG_COORDINATOR", raising=False)
    monkeypatch.setenv("FPG_NUM_PROCESSES", "4")
    monkeypatch.delenv("FPG_PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="partial multi-process"):
        dist.maybe_init_from_env()


def test_contradictory_single_process_with_coordinator_raises(monkeypatch):
    monkeypatch.setenv("FPG_COORDINATOR", "localhost:9999")
    monkeypatch.setenv("FPG_NUM_PROCESSES", "1")
    monkeypatch.delenv("FPG_PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="contradictory"):
        dist.maybe_init_from_env()


def test_no_env_is_a_noop(monkeypatch):
    for v in ("FPG_COORDINATOR", "FPG_NUM_PROCESSES", "FPG_PROCESS_ID"):
        monkeypatch.delenv(v, raising=False)
    info = dist.maybe_init_from_env()
    # conftest pins a single-process 8-virtual-device CPU backend
    assert info.process_count == 1 and info.is_coordinator


def test_failed_autodetect_on_pod_host_raises(monkeypatch):
    """Auto-detection failure must NOT degrade to single-process when the
    env says this is a managed pod host (ADVICE r4, medium)."""
    for v in ("FPG_COORDINATOR", "FPG_NUM_PROCESSES", "FPG_PROCESS_ID"):
        monkeypatch.delenv(v, raising=False)
    monkeypatch.setenv("SLURM_JOB_ID", "12345")
    monkeypatch.setattr(dist, "_INITIALIZED", False)

    import jax

    def boom(*a, **k):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="managed pod host"):
        dist.init_distributed()
    # the module must remain re-initializable after the failure
    assert dist._INITIALIZED is False


def test_failed_autodetect_on_plain_host_is_single_process(monkeypatch):
    """On a host with NO pod env vars, a no-cluster detection failure means
    single-process — the normal laptop/single-VM path."""
    for v in ("FPG_COORDINATOR", "FPG_NUM_PROCESSES", "FPG_PROCESS_ID",
              *dist._POD_ENV_VARS):
        monkeypatch.delenv(v, raising=False)
    monkeypatch.setattr(dist, "_INITIALIZED", False)

    import jax

    def no_cluster(*a, **k):
        raise ValueError("no cluster detected")

    monkeypatch.setattr(jax.distributed, "initialize", no_cluster)
    info = dist.init_distributed()
    assert info.process_count == 1
