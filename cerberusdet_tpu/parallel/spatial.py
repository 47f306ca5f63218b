"""Spatial (image-height) sharding for very-high-resolution inference.

Beyond reference parity (SURVEY.md §2.2/§5.7 notes TP/PP/SP are absent
upstream and names spatial conv sharding as the natural TPU answer if large
images ever matter): when one image is too large for a chip's HBM — or a
single low-latency request can't use batch parallelism — the conv graph
itself can be sharded over the mesh along H. Under GSPMD this needs NO model
changes: annotating the input's H axis makes XLA partition every conv and
insert the halo exchanges for the 3x3 receptive fields at shard boundaries;
outputs are bit-identical to the single-device forward (asserted in
tests/test_spatial.py).

Practical notes:
  * H must divide by the mesh size times the deepest stride (32) so every
    feature level shards evenly — `check_spatial_shape` validates.
  * Throughput-oriented serving should still prefer batch data parallelism
    (parallel/mesh.py); spatial sharding is the latency/memory lever.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cerberusdet_tpu.nn.module import Ctx

SPATIAL_AXIS = "sp"


def make_spatial_mesh(devices: Optional[Sequence] = None,
                      axis: str = SPATIAL_AXIS) -> Mesh:
    """1-D mesh whose single axis shards the image height."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def make_data_spatial_mesh(n_spatial: int,
                           devices: Optional[Sequence] = None,
                           data_axis: str = "data",
                           axis: str = SPATIAL_AXIS) -> Mesh:
    """2-D (data x spatial) mesh: batch parallelism and height sharding
    COMPOSE — e.g. 4 groups of 2 chips each halving every image. The two
    shardings are orthogonal GSPMD annotations, so outputs stay bit-exact
    (tests/test_spatial.py)."""
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) % n_spatial:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"n_spatial={n_spatial}")
    arr = np.array(devices).reshape(len(devices) // n_spatial, n_spatial)
    return Mesh(arr, (data_axis, axis))


def check_spatial_shape(h: int, n_devices: int, max_stride: int = 32) -> None:
    """H must split evenly across devices at EVERY feature level."""
    quantum = n_devices * max_stride
    if h % quantum:
        raise ValueError(
            f"spatial sharding needs H divisible by n_devices*max_stride = "
            f"{n_devices}*{max_stride} = {quantum}; got H={h}"
        )


def make_spatial_forward(model, mesh: Mesh, tasks=None,
                         dtype=jnp.bfloat16, axis: str = SPATIAL_AXIS):
    """Jitted all-heads (or task-subset) eval forward with the input image's
    H axis sharded over `mesh`; params replicated, outputs replicated.

    Returns fn(params, img NHWC) -> {task: (B, N, 4+nc) decoded predictions}.

    On a 2-D mesh from make_data_spatial_mesh, the batch axis additionally
    shards over the 'data' mesh axis (batch must divide it).
    """
    batch_axis = next((a for a in mesh.axis_names if a != axis), None)
    n_sp = mesh.shape[axis]

    def forward(params, img):
        out = model(params, img, Ctx(train=False, dtype=dtype), tasks=tasks)
        return {t: pred for t, (pred, _feats) in out.items()}

    jitted = jax.jit(
        forward,
        in_shardings=(NamedSharding(mesh, P()),
                      NamedSharding(mesh, P(batch_axis, axis, None, None))),
        out_shardings=NamedSharding(mesh, P()),
    )

    def run(params, img):
        check_spatial_shape(img.shape[1], n_sp, int(max(model.strides)))
        if batch_axis and img.shape[0] % mesh.shape[batch_axis]:
            raise ValueError(
                f"batch {img.shape[0]} not divisible by the mesh "
                f"'{batch_axis}' axis ({mesh.shape[batch_axis]})")
        with mesh:
            return jitted(params, img)

    return run
