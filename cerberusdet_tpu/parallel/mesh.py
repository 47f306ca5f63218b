"""Device-mesh data parallelism (the TPU-native replacement for DDP/NCCL).

Behavioral parity target: the reference's distributed layer (SURVEY.md §2.2) —
torch.distributed.launch + DDP allreduce + DistributedSampler
(train.py:376-384, samplers.py:137-184). Here there are no processes, ranks or
explicit collectives: batches are sharded over a 1-D `data` axis of a
jax.sharding.Mesh, params are replicated, and XLA inserts the gradient
all-reduces over ICI when the jitted train step consumes sharded inputs.

Host-sharded data loading (multi-process JAX) uses jax.process_index() to
split file lists — see data/loaders.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / train state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = DATA_AXIS):
    """Shard every array in the batch along its leading (batch) dimension.

    Single process: `batch` is the full global batch (device_put scatters it
    over the mesh). Multi-process (one JAX process per TPU host): `batch` is
    THIS HOST's rows — the loaders already yield disjoint per-host slices via
    HostShardSampler — and the global array (global batch = host rows x
    process_count) is assembled without any cross-host data movement; XLA's
    collectives see one logical batch. Replaces the reference's
    DistributedSampler + per-rank DDP batches (samplers.py:137-184)."""
    nproc = jax.process_count()

    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        sharding = NamedSharding(mesh, spec)
        if nproc == 1:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        global_shape = (x.shape[0] * nproc, *x.shape[1:])
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def shard_task_batches(batches: Dict[str, Dict[str, Any]], mesh: Mesh,
                       axis: str = DATA_AXIS):
    return {t: shard_batch(b, mesh, axis) for t, b in batches.items()}


def pad_batch_to(batch: Dict[str, Any], size: int):
    """Pad the leading dim to `size` (divisibility by mesh size). The emitted
    'img_mask' (1 for real rows, 0 for padding) makes the padded step compute
    EXACTLY the unpadded gradients: the loss zeroes padded rows' terms and
    normalizes by valid-row count (train/loss.py) and BatchNorm excludes them
    from batch statistics (nn/module.py batch_norm)."""
    n = next(iter(batch.values())).shape[0]

    def pad(x):
        if x.shape[0] == size:
            return x
        widths = [(0, size - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        if isinstance(x, jax.Array):
            # device-born arrays (e.g. --augment-device images) stay on
            # device: a np.pad here would round-trip them through the host
            return jnp.pad(x, widths)
        return np.pad(np.asarray(x), widths)

    out = {k: pad(v) for k, v in batch.items()}
    if "mask" in out:
        out["mask"][n:] = False
    img_mask = np.zeros(size, np.float32)
    img_mask[:n] = 1.0
    out["img_mask"] = img_mask
    return out
