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
    """
    n_dev = mesh.devices.size

    def forward(params, img):
        out = model(params, img, Ctx(train=False, dtype=dtype), tasks=tasks)
        return {t: pred for t, (pred, _feats) in out.items()}

    jitted = jax.jit(
        forward,
        in_shardings=(NamedSharding(mesh, P()),
                      NamedSharding(mesh, P(None, axis, None, None))),
        out_shardings=NamedSharding(mesh, P()),
    )

    def run(params, img):
        check_spatial_shape(img.shape[1], n_dev, int(max(model.strides)))
        with mesh:
            return jitted(params, img)

    return run
