"""Device mesh construction and sharding helpers.

The reference scales with single-process ``nn.DataParallel``
(reference: train.py:42); the TPU-native equivalent is a
``jax.sharding.Mesh`` over the pod slice with named axes

* ``data``  — batch dimension (data parallelism; gradients reduced by XLA
  collectives over ICI, loss psum),
* ``model`` — reserved for sharding the vocoder's channel/time axes when a
  synthesis batch exceeds one chip's HBM (SURVEY.md §2.7).

Multi-host: call :func:`initialize_distributed` first on every host, then
``make_mesh`` sees the global device set; per-host data loading uses
``jax.process_index()`` (see data/dataset.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper; no-op for single process."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(model_parallel: int = 1, devices=None) -> Mesh:
    """Mesh over all (or given) devices: ('data', 'model')."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def mesh_for_batch(batch_size: int, model_parallel: int = 1,
                   devices=None) -> Mesh:
    """Largest mesh whose data axis divides ``batch_size`` (small batches on
    big meshes would otherwise fail to shard)."""
    devices = list(devices if devices is not None else jax.devices())
    n_model = model_parallel
    n_data_max = len(devices) // n_model
    n_data = max(d for d in range(1, n_data_max + 1) if batch_size % d == 0)
    return make_mesh(n_model, devices[: n_data * n_model])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def _place(x, sh: NamedSharding):
    """Single process: device_put the global value. Multi-process: each host
    holds only its row slice (BucketedDataset shard_rows mode), so assemble
    the global array from process-local data — ``jax.device_put`` would
    wrongly treat each host's slice as the whole global value."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    try:
        return jax.device_put(x, sh)
    except jax.errors.JaxRuntimeError:
        # Experimental remote backends occasionally reject device_put with
        # shardings under load (observed: axon "UNIMPLEMENTED" mid-training
        # while the same call succeeds in isolation). jit commits host
        # arrays itself, so passing the host buffer through only costs the
        # async-H2D overlap for this one batch.
        return np.asarray(x)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place every array in the batch with its batch dim on the data axis."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: _place(x, sh), batch)


def shard_batch_chunk(mesh: Mesh, batches: dict) -> dict:
    """Shard a stacked (n_steps, batch, ...) chunk: scan axis replicated,
    batch axis on the data axis."""
    sh = NamedSharding(mesh, P(None, "data"))
    return jax.tree.map(lambda x: _place(x, sh), batches)
