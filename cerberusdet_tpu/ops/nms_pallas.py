"""Pallas TPU kernel for greedy NMS — the eval/inference hot op.

The XLA fori_loop formulation (ops/nms.py:greedy_nms) re-reads candidate
boxes/scores from HBM on every one of the max_det sequential iterations.
This kernel pins the candidate set in VMEM and runs the whole greedy loop
on-chip. Layout is the key: each grid program processes EIGHT images as the
eight VPU sublanes of (8, K) tiles, so every per-iteration pass (row-wise
argmax, masked box extraction, IoU, suppression) runs at full vector width
with zero HBM traffic inside the loop.

Exactness: identical selection to ops/nms.py:greedy_nms (argmax order =
descending score, lowest-index tie-break).

Measured on TPU v5e (batch 32, K=16384 candidates, max_det=300, steady state,
interleaved rounds): 11-13 ms/batch for this kernel vs ~118 ms for the XLA
fori_loop version — ~10x; the full non_max_suppression eval path drops from
~7.3 ms/img (XLA, max_nms=30000) to ~0.8 ms/img.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8            # images per grid program = VPU sublanes (hard TPU tile req)
MAX_K = 16384       # VMEM budget: 8 rows of 16k f32 candidates fit comfortably


def _nms_kernel(boxes_ref, scores_ref, idx_out_ref, valid_out_ref, *,
                iou_thres: float, max_det: int, rows: int):
    """boxes_ref: (rows, 4, K) [x1,y1,x2,y2] per row; scores_ref: (rows, K).
    Outputs: idx/valid (rows, max_det) int32."""
    x1 = boxes_ref[:, 0, :]
    y1 = boxes_ref[:, 1, :]
    x2 = boxes_ref[:, 2, :]
    y2 = boxes_ref[:, 3, :]
    area = (x2 - x1) * (y2 - y1)
    k = scores_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)
    md_col = jax.lax.broadcasted_iota(jnp.int32, (rows, max_det), 1)

    def body(i, carry):
        live, idx_acc, val_acc = carry
        # per-row argmax with lowest-index tie-break (matches jnp.argmax)
        m = jnp.max(live, axis=1, keepdims=True)                      # (R, 1)
        j = jnp.min(jnp.where(live >= m, col, k), axis=1, keepdims=True)
        sel = (col == j).astype(jnp.float32)                          # (R, K)
        # selected box per row via masked reductions (no dynamic_slice on TPU)
        bx1 = jnp.sum(x1 * sel, axis=1, keepdims=True)
        by1 = jnp.sum(y1 * sel, axis=1, keepdims=True)
        bx2 = jnp.sum(x2 * sel, axis=1, keepdims=True)
        by2 = jnp.sum(y2 * sel, axis=1, keepdims=True)
        barea = (bx2 - bx1) * (by2 - by1)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / (area + barea - inter + 1e-7)
        live = jnp.where((iou > iou_thres) | (col == j), 0.0, live)
        # scalar stores to VMEM are unsupported: accumulate lanes in the carry
        write = md_col == i
        idx_acc = jnp.where(write, j, idx_acc)
        val_acc = jnp.where(write, (m > 0.0).astype(jnp.int32), val_acc)
        return live, idx_acc, val_acc

    _, idx_acc, val_acc = jax.lax.fori_loop(
        0, max_det, body,
        (scores_ref[:, :],
         jnp.zeros((rows, max_det), jnp.int32),
         jnp.zeros((rows, max_det), jnp.int32)),
    )
    idx_out_ref[:, :] = idx_acc
    valid_out_ref[:, :] = val_acc


def _greedy_nms_impl(boxes, scores, iou_thres: float, max_det: int,
                     interpret: bool):
    """Per-shard kernel launch (see greedy_nms_pallas)."""
    b, k, _ = boxes.shape
    if k > MAX_K:
        raise ValueError(f"pallas NMS supports up to {MAX_K} candidates, got {k}")
    rows = ROWS
    pad = (-b) % rows
    if pad:
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, k, 4), boxes.dtype)], 0)
        scores = jnp.concatenate([scores, jnp.zeros((pad, k), scores.dtype)], 0)
    bb = boxes.shape[0]
    boxes_t = jnp.transpose(boxes, (0, 2, 1)).astype(jnp.float32)  # (B', 4, K)
    scores = scores.astype(jnp.float32)
    kernel = partial(_nms_kernel, iou_thres=float(iou_thres), max_det=int(max_det),
                     rows=rows)
    idx, valid = pl.pallas_call(
        kernel,
        grid=(bb // rows,),
        in_specs=[
            pl.BlockSpec((rows, 4, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, max_det), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, max_det), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bb, max_det), jnp.int32),
            jax.ShapeDtypeStruct((bb, max_det), jnp.int32),
        ],
        interpret=interpret,
    )(boxes_t, scores)
    return idx[:b], valid[:b] > 0


@partial(jax.jit, static_argnames=("iou_thres", "max_det", "interpret"))
def greedy_nms_pallas(boxes, scores, iou_thres: float = 0.45, max_det: int = 300,
                      interpret: bool = False):
    """Batched greedy NMS. boxes: (B, K, 4) xyxy (class-offset applied by the
    caller), scores: (B, K) with <= 0 meaning invalid.
    Returns (idx (B, max_det) int32, valid (B, max_det) bool).

    Images are independent, so under a data-parallel mesh the kernel is
    launched per batch shard (custom_partitioning, same pattern as
    ops/tal_pallas.py) — without the rule GSPMD treats the custom-call as
    replicated and all-gathers every shard's candidates to every chip.
    This is what lets the ONE-program serving path (infer/inference.py)
    scale over a multi-chip mesh."""
    f = _partitioned_nms(float(iou_thres), int(max_det), bool(interpret))
    return f(boxes, scores)


@functools.lru_cache(maxsize=None)
def _partitioned_nms(iou_thres: float, max_det: int, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(boxes, scores):
        return _greedy_nms_impl(boxes, scores, iou_thres, max_det, interpret)

    f = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        spec = getattr(arg_shapes[0].sharding, "spec", None)
        b_axis = spec[0] if spec else None

        def sh(rank):
            return NamedSharding(mesh, P(*([b_axis] + [None] * (rank - 1))))

        return mesh, impl, (sh(2), sh(2)), (sh(3), sh(2))

    # batch dim `b` propagates; candidate/coord/det dims stay whole per shard
    f.def_partition(partition=partition,
                    sharding_rule="b k f, b k -> b d, b d")
    return f
