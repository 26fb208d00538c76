"""Device mesh and sharding utilities.

Replaces the reference's HF Accelerate data-parallel wrapping
(`train_ID-Booth.py:511-516,890-898`; `FR_training/train_FR.py:64,227-229`)
with first-class JAX sharding: a `Mesh` over ("data", "model") axes,
`NamedSharding` annotations, and jit-implicit collectives over ICI.

The reference only ever uses data parallelism (SURVEY.md §2.5); we expose a
"model" axis as well so the UNet attention heads / MLPs can be tensor-sharded
for multi-chip inference, and the batch axis shards over "data".
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ("data", "model") mesh over the available devices.

    With `data=None` the data axis absorbs all devices not used by `model`.
    On a single chip this degenerates to a 1x1 mesh, so the same pjit code
    path runs everywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis; replicate the rest."""
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch dim sharded over "data"."""

    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree.map(_put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. model params) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data != 0:
        raise ValueError(f"global batch {global_batch} % data axis {n_data} != 0")
    return global_batch // n_data


def host_row_slice(global_rows: int, num_hosts: int, host_id: int) -> slice:
    """The contiguous row range of a global batch that host `host_id` owns.

    Replaces Accelerate's dataloader wrap (`train_ID-Booth.py:890-898`):
    each host loads ONLY its slice; concatenating the slices in host order
    reconstructs the exact single-process batch (the contract the sharded
    dataset tests pin). Contiguous (not round-robin) so host h's rows land
    on host h's devices when the mesh "data" axis is process-major —
    `form_global_batch` then needs no cross-host data movement."""
    if global_rows % num_hosts != 0:
        raise ValueError(f"global rows {global_rows} % hosts {num_hosts} != 0")
    per = global_rows // num_hosts
    if not (0 <= host_id < num_hosts):
        raise ValueError(f"host_id {host_id} not in [0, {num_hosts})")
    return slice(host_id * per, (host_id + 1) * per)


def form_global_batch(mesh: Mesh, host_local_batch):
    """Assemble each host's local batch rows into globally-sharded arrays
    (batch dim over "data"). Multi-process: zero-copy placement of the
    host-local shard via `jax.make_array_from_process_local_data`;
    single-process (tests, one host): plain sharded device_put."""
    if jax.process_count() == 1:
        return shard_batch(mesh, host_local_batch)

    def _put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, x.ndim), x
        )

    return jax.tree.map(_put, host_local_batch)
