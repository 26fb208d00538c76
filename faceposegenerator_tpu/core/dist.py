"""Multi-host (pod) runtime initialization.

The reference's multi-process story is implicit: HF Accelerate wraps the
trainer and torch.distributed/NCCL is configured from the `LOCAL_RANK`
env (`train_ID-Booth.py:226-228,511`; `FR_training/train_FR.py:64`), with
rank-0 gating via `accelerator.is_main_process` (`train_ID-Booth.py:1181`)
and a `wait_for_everyone()` barrier before the final export (`:1241`).

The TPU-native equivalent is JAX's multi-controller model: every host runs
the SAME program, `jax.distributed.initialize()` connects the processes
(coordinator + N workers), and from then on `jax.devices()` is the GLOBAL
device list — `core.mesh.make_mesh` lays the ("data", "model") mesh over
it, each host loads only its `host_row_slice` of the batch, and
`form_global_batch` assembles host-local rows into globally-sharded arrays
with zero cross-host data movement. Collectives ride ICI/DCN via XLA; on
the CPU backend (tests, the pod rehearsal) they ride Gloo.

This module is the one place process topology is decided:

- `init_distributed()` — idempotent `jax.distributed.initialize` wrapper.
  On a real TPU pod, call it with no arguments (cluster auto-detection).
  For the CPU rehearsal (and any explicit launch), pass coordinator
  address + process counts or set FPG_COORDINATOR / FPG_NUM_PROCESSES /
  FPG_PROCESS_ID.
- `proc_info()` — (process_index, process_count, local/global devices).
- `is_coordinator()` — rank-0 gate for checkpoint writes and logging,
  the `accelerator.is_main_process` equivalent.
- `barrier(name)` — `wait_for_everyone()` equivalent
  (`multihost_utils.sync_global_devices`).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax

_INITIALIZED = False

# Env vars whose presence means this host is part of a managed multi-host
# job (GKE/GCE TPU pod, SLURM, OpenMPI). When any is set, a FAILED
# auto-detection must surface — silently degrading to N independent
# single-process jobs gives every host process_index 0, so all of them
# pass the is_coordinator() gate and clobber each other's checkpoints
# (ADVICE r4, medium).
_POD_ENV_VARS = (
    "TPU_WORKER_HOSTNAMES",   # GCE/GKE TPU pod metadata
    "TPU_WORKER_ID",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "CLOUD_TPU_TASK_ID",
    "SLURM_JOB_ID",
    "OMPI_COMM_WORLD_SIZE",
)


@dataclasses.dataclass(frozen=True)
class ProcInfo:
    process_index: int
    process_count: int
    local_device_count: int
    global_device_count: int

    @property
    def is_coordinator(self) -> bool:
        return self.process_index == 0


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    platform: Optional[str] = None,
) -> ProcInfo:
    """Connect this process to the job. Idempotent: a second call returns
    the current topology without re-initializing (single-process runs call
    this too and get the trivial 1-process topology).

    Args default from FPG_COORDINATOR / FPG_NUM_PROCESSES / FPG_PROCESS_ID
    so one launcher can fan out identical worker command lines. With all
    three absent this is a no-op on a single host and auto-detection on a
    real TPU pod (where the TPU runtime supplies the topology).

    `platform="cpu"` forces the CPU backend BEFORE backend init and
    selects Gloo cross-process collectives — the pod-rehearsal path; the
    container's sitecustomize pins the axon TPU platform, so plain env
    vars are not enough (CLAUDE.md).
    """
    global _INITIALIZED
    coordinator_address = coordinator_address or os.environ.get("FPG_COORDINATOR")
    if num_processes is None and os.environ.get("FPG_NUM_PROCESSES"):
        num_processes = int(os.environ["FPG_NUM_PROCESSES"])
    if process_id is None and os.environ.get("FPG_PROCESS_ID"):
        process_id = int(os.environ["FPG_PROCESS_ID"])

    if platform == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except RuntimeError:
            pass  # backend already up; proc_info below reports what we got

    # Partial launcher config is an error, not a silent single-process run
    # (ADVICE r4, low): FPG_COORDINATOR set with FPG_NUM_PROCESSES unset
    # (or =1) would otherwise take NEITHER branch below, mark the module
    # initialized, and leave every host believing it is rank 0.
    explicit = (coordinator_address, num_processes, process_id)
    if any(v is not None for v in explicit):
        if num_processes is None or (num_processes > 1 and (
                coordinator_address is None or process_id is None)):
            raise ValueError(
                "partial multi-process configuration: coordinator_address="
                f"{coordinator_address!r} num_processes={num_processes!r} "
                f"process_id={process_id!r} — a multi-process launch needs "
                "all three (FPG_COORDINATOR / FPG_NUM_PROCESSES / "
                "FPG_PROCESS_ID); unset all of them for single-process or "
                "real-pod auto-detection"
            )
        if num_processes == 1 and (coordinator_address is not None
                                   or (process_id or 0) != 0):
            raise ValueError(
                "contradictory configuration: num_processes=1 with a "
                f"coordinator_address={coordinator_address!r} / "
                f"process_id={process_id!r} — did the launcher mean to set "
                "FPG_NUM_PROCESSES?"
            )

    if not _INITIALIZED:
        if num_processes is not None and num_processes > 1:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif (coordinator_address is None and num_processes is None
              and process_id is None and platform is None):
            # real-pod path: cluster auto-detection. MUST happen before any
            # backend touch (so no jax.devices()/default_backend() here);
            # on a plain single host detection finds no cluster and raises —
            # that simply means single-process. On a MANAGED pod host a
            # failed bring-up must NOT degrade silently (ADVICE r4, medium).
            try:
                jax.distributed.initialize()
            except (ValueError, RuntimeError) as e:
                pod_vars = [v for v in _POD_ENV_VARS if os.environ.get(v)]
                if pod_vars:
                    raise RuntimeError(
                        "jax.distributed.initialize() auto-detection failed "
                        f"on what looks like a managed pod host ({', '.join(pod_vars)} "
                        "set). Refusing to continue single-process: every "
                        "host would claim rank 0 and clobber shared "
                        f"checkpoints. Underlying error: {e}"
                    ) from e
        _INITIALIZED = True
    return proc_info()


def maybe_init_from_env() -> ProcInfo:
    """Driver entry hook: initialize multi-process topology ONLY when a
    launcher asked for it (FPG_COORDINATOR / FPG_NUM_PROCESSES set) — the
    `LOCAL_RANK`-env pattern of the reference (`train_ID-Booth.py:226-228`)
    without Accelerate. Single-host runs see a no-op, so every driver can
    call this unconditionally first thing."""
    if os.environ.get("FPG_COORDINATOR") or os.environ.get("FPG_NUM_PROCESSES"):
        return init_distributed()
    return proc_info()


def proc_info() -> ProcInfo:
    return ProcInfo(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )


def is_coordinator() -> bool:
    return jax.process_index() == 0


def coordination_barrier(name: str, timeout_s: float = 1200.0) -> None:
    """Control-plane barrier through the coordination service — NO device
    collective, no Gloo/ICI. Use it to align processes across large
    bring-up skew BEFORE the first device collective: XLA's Gloo context
    init has a fixed ~30 s key-value timeout, so if one process reaches a
    collective while peers are still importing/compiling (minutes apart
    under CPU contention), the whole job dies with "Gloo context
    initialization failed: GetKeyValue() timed out" (measured: 4-process
    rehearsal on the 1-core host). `barrier()` below cannot serve this
    purpose — `sync_global_devices` IS a device collective. No-op
    single-process."""
    from jax._src import distributed as _distributed

    client = _distributed.global_state.client
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def shutdown() -> None:
    """Explicit, synchronized teardown of the distributed runtime. JAX also
    shuts down at interpreter exit, but that path races: the coordination
    service's shutdown barrier times out when process teardown is skewed
    (measured: a 4-process CPU rehearsal on the 1-core host passed every
    leg, then died with "Shutdown barrier ... 1/4 reached" because worker 0
    exited minutes before the others). Call this right after a final
    `barrier()` so every process enters the shutdown barrier together.
    Idempotent; single-process runs no-op."""
    global _INITIALIZED
    if jax.process_count() > 1:
        jax.distributed.shutdown()
    _INITIALIZED = False


def barrier(name: str = "fpg_barrier") -> None:
    """Block until every process reaches this point (the
    `accelerator.wait_for_everyone()` equivalent, `train_ID-Booth.py:1241`).
    No-op in single-process runs."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
