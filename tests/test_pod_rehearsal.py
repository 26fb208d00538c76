"""Multi-process pod rehearsal: real `jax.distributed` bring-up.

Everything else in the suite runs ONE process with 8 virtual devices; this
is the only test that exercises the actual pod topology — N OS processes,
a coordinator, Gloo cross-process collectives, host-local data loading,
rank-0 checkpointing (the reference's Accelerate/NCCL equivalent,
`train_ID-Booth.py:226-228,511,1181,1241`). See
`faceposegenerator_tpu/parallel/pod_rehearsal.py`.

Runs in subprocesses so the parent's pinned 8-device single-process CPU
backend (conftest) is irrelevant.
"""

import numpy as np

from faceposegenerator_tpu.parallel.pod_rehearsal import launch


def test_pod_rehearsal_2x2():
    verdict = launch(num_processes=2, local_devices=2, port=18417)
    assert verdict["ok"]
    assert verdict["processes"] == 2
    assert verdict["global_devices"] == 4
    assert verdict["mesh"] == {"data": 2, "model": 2}
    assert np.isfinite(verdict["loss1"]) and np.isfinite(verdict["loss2"])
    # checkpoint round-trip continued training bit-identically
    assert verdict["loss2"] == verdict["loss2_restored"]
