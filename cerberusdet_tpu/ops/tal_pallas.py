"""Fused Pallas TAL assigner (VERDICT r2 item 3).

Behavioral parity target: cerberusdet/utils/tal.py:56-178 via train/tal.py —
same outputs, radically different memory behavior. The XLA formulation
materializes ~20 (B, M, N) fp32 intermediates in HBM (M=300 gts x N=8400
anchors -> ~80 MB each; TAL custom fusions + top-k measured 19.8 ms of the
154 ms round-2 train step). Here the (M, N) plane lives only in VMEM tiles:

  pass 1 (grid B x M-tiles): CIoU + align metric + per-gt top-k selection
      computed on a (MT, N) tile; streams per-ANCHOR accumulators
      (positive count, first positive gt, argmax-overlap gt) into (B, N)
      outputs. Top-k uses k iterations of first-occurrence row argmax —
      selection-set identical to lax.top_k's stable tie handling.
  XLA glue (cheap, (B, N)-sized): resolve multi-assigned anchors exactly
      like select_highest_overlaps (argmax over ALL gt rows of overlaps).
  pass 2 (same grid): recomputes the tile (FLOPs are free, HBM is not),
      masks by the RESOLVED assignment, and max-accumulates the per-anchor
      normalizer max_m(align * pos_overlap / pos_align).
  XLA tail: target gathers + one-hot scores (output-sized regardless).

Total HBM traffic drops from ~GBs to the (B, M, N) score-gather read twice
plus (B, N)-sized state.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cerberusdet_tpu.train.tal import AssignResult

_BIG = 3.0e38  # python float: jnp scalars would be captured consts in kernels
_MT = 32  # gt rows per tile


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _ciou(gtb, pdb, at_gt, at_pd, eps: float = 1e-7):
    """CIoU of (MT, 4) gt rows vs (4, N) preds -> (MT, N). Formula matches
    ops/boxes.bbox_iou(CIoU=True) term for term.

    at_gt (MT, 1) / at_pd (1, N): arctan(w/h) of each gt / pred box,
    precomputed in XLA — the arctan terms are per-ENTITY, not per-pair, and
    Mosaic has no atan primitive; hoisting them keeps the kernel values
    bit-identical to the XLA formulation."""
    b1x1, b1y1 = gtb[:, 0:1], gtb[:, 1:2]
    b1x2, b1y2 = gtb[:, 2:3], gtb[:, 3:4]
    b2x1, b2y1, b2x2, b2y2 = pdb[0:1], pdb[1:2], pdb[2:3], pdb[3:4]
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    inter = (jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0.0)
             * jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0.0))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2
            + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / jnp.pi**2) * (at_pd - at_gt) ** 2
    alpha = v / (v - iou + (1 + eps))
    return iou - (rho2 / c2 + v * alpha)


def _tile_plane(scores, gtb, pdb, anc, at_gt, at_pd, alpha, beta, eps):
    """Shared tile math: (overlaps, align*in_gts metrics, in_gts) (MT, N)."""
    overlaps = jnp.clip(_ciou(gtb, pdb, at_gt, at_pd), 0.0)
    align = scores**alpha * overlaps**beta
    lt_x = anc[0:1] - gtb[:, 0:1]
    lt_y = anc[1:2] - gtb[:, 1:2]
    rb_x = gtb[:, 2:3] - anc[0:1]
    rb_y = gtb[:, 3:4] - anc[1:2]
    in_gts = (jnp.minimum(jnp.minimum(lt_x, lt_y), jnp.minimum(rb_x, rb_y))
              > eps)
    return overlaps, align, in_gts


def _topk_sel(metrics, k: int):
    """First-occurrence top-k per row: (MT, N) -> bool selection mask.
    Selection set identical to lax.top_k (stable ties -> lowest index)."""
    n = metrics.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, metrics.shape, 1)
    work = metrics
    sel = jnp.zeros(metrics.shape, jnp.bool_)
    for _ in range(k):
        rowmax = jnp.max(work, axis=1, keepdims=True)
        first = jnp.min(jnp.where(work == rowmax, col, n), axis=1,
                        keepdims=True)
        hit = col == first
        sel = jnp.logical_or(sel, hit)
        work = jnp.where(hit, -_BIG, work)
    return sel


def _pass1_kernel(scores_ref, gtb_ref, pdb_ref, anc_ref, atg_ref, atp_ref,
                  valid_ref, fg_ref, ovval_ref, ovidx_ref, first_ref,
                  *, m_real: int, topk: int, alpha: float, beta: float,
                  eps: float):
    mt = pl.program_id(1)

    @pl.when(mt == 0)
    def _():
        fg_ref[...] = jnp.zeros_like(fg_ref)
        ovval_ref[...] = jnp.full_like(ovval_ref, -_BIG)
        ovidx_ref[...] = jnp.zeros_like(ovidx_ref)
        first_ref[...] = jnp.full_like(first_ref, 2**30)
    # accumulator refs are (1, 1, N) blocks (TPU tiling needs the dummy
    # sublane dim); address the (N,) row as ref[0, 0]

    scores = scores_ref[0]          # (MT, N)
    gtb = gtb_ref[0]                # (MT, 4)
    pdb = pdb_ref[0]                # (4, N)
    anc = anc_ref[...]              # (2, N)
    valid = valid_ref[0] > 0        # (MT, 1)

    overlaps, align, in_gts = _tile_plane(scores, gtb, pdb, anc,
                                          atg_ref[0], atp_ref[0, 0][None],
                                          alpha, beta, eps)
    sel = _topk_sel(align * in_gts, topk)
    mask_pos = jnp.logical_and(jnp.logical_and(sel, in_gts), valid)

    mrow = (jax.lax.broadcasted_iota(jnp.int32, overlaps.shape, 0)
            + mt * overlaps.shape[0])
    real_row = mrow < m_real

    fg_ref[0, 0] += jnp.sum(mask_pos.astype(jnp.int32), axis=0)

    # global argmax-over-gts of overlaps, first-occurrence semantics:
    # within-tile first max, then strictly-greater beats earlier tiles
    ov = jnp.where(real_row, overlaps, -_BIG)
    tile_max = jnp.max(ov, axis=0)
    tile_arg = jnp.min(jnp.where(ov == tile_max[None, :], mrow, 2**30),
                       axis=0)
    better = tile_max > ovval_ref[0, 0]
    ovidx_ref[0, 0] = jnp.where(better, tile_arg, ovidx_ref[0, 0])
    ovval_ref[0, 0] = jnp.maximum(ovval_ref[0, 0], tile_max)

    first_ref[0, 0] = jnp.minimum(
        first_ref[0, 0], jnp.min(jnp.where(mask_pos, mrow, 2**30), axis=0))


def _pass2_kernel(scores_ref, gtb_ref, pdb_ref, anc_ref, atg_ref, atp_ref,
                  tgt_ref, fg_ref, norm_ref, *, alpha: float, beta: float,
                  eps: float, assign_eps: float):
    mt = pl.program_id(1)

    @pl.when(mt == 0)
    def _():
        norm_ref[...] = jnp.zeros_like(norm_ref)

    scores = scores_ref[0]
    gtb = gtb_ref[0]
    pdb = pdb_ref[0]
    anc = anc_ref[...]
    tgt = tgt_ref[0, 0]             # (N,) int32 resolved gt per anchor
    fg = fg_ref[0, 0] > 0           # (N,) bool

    overlaps, align, _ = _tile_plane(scores, gtb, pdb, anc,
                                     atg_ref[0], atp_ref[0, 0][None],
                                     alpha, beta, eps)
    mrow = (jax.lax.broadcasted_iota(jnp.int32, overlaps.shape, 0)
            + mt * overlaps.shape[0])
    mask_pos = jnp.logical_and(fg[None, :], tgt[None, :] == mrow)

    am = jnp.where(mask_pos, align, 0.0)
    pos_align = jnp.max(am, axis=1, keepdims=True)            # (MT, 1)
    pos_ov = jnp.max(jnp.where(mask_pos, overlaps, 0.0), axis=1,
                     keepdims=True)
    contrib = am * pos_ov / (pos_align + assign_eps)
    norm_ref[0, 0] = jnp.maximum(norm_ref[0, 0], jnp.max(contrib, axis=0))


def _assign_impl(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes,
                 mask_gt, *, topk: int, num_classes: int, alpha: float,
                 beta: float, eps: float, interpret: bool):
    """The per-shard assignment computation (see assign_pallas)."""
    b, n, nc = pd_scores.shape
    assert nc == num_classes, (
        f"pd_scores class dim {nc} != num_classes {num_classes}")
    m = gt_labels.shape[1]
    np_ = _round_up(n, 128)
    mp = _round_up(m, _MT)
    mtiles = mp // _MT

    labels = jnp.clip(gt_labels, 0, nc - 1).astype(jnp.int32)
    # the one (B, M, N) HBM intermediate we keep: per-gt class scores
    bbox_scores = jnp.take_along_axis(
        jnp.transpose(pd_scores, (0, 2, 1)).astype(jnp.float32),
        labels[:, :, None], axis=1)                            # (B, M, N)
    bbox_scores = jnp.pad(bbox_scores, ((0, 0), (0, mp - m), (0, np_ - n)))
    gtb = jnp.pad(gt_bboxes.astype(jnp.float32), ((0, 0), (0, mp - m), (0, 0)))
    pdb = jnp.pad(jnp.transpose(pd_bboxes, (0, 2, 1)).astype(jnp.float32),
                  ((0, 0), (0, 0), (0, np_ - n)))              # (B, 4, N)
    anc = jnp.pad(jnp.transpose(anc_points, (1, 0)).astype(jnp.float32),
                  ((0, 0), (0, np_ - n)),
                  constant_values=-1.0e6)                      # (2, N)
    valid = jnp.pad(mask_gt.astype(jnp.float32)[..., None],
                    ((0, 0), (0, mp - m), (0, 0)))             # (B, MP, 1)
    # arctan(w/h) per box, computed in XLA (Mosaic lacks atan); eps matches
    # bbox_iou's h+eps convention so the kernel values are bit-identical
    ciou_eps = 1e-7
    at_gt = jnp.arctan(
        (gtb[..., 2] - gtb[..., 0])
        / (gtb[..., 3] - gtb[..., 1] + ciou_eps))[..., None]   # (B, MP, 1)
    at_pd = jnp.arctan(
        (pdb[:, 2] - pdb[:, 0]) / (pdb[:, 3] - pdb[:, 1] + ciou_eps)
    )[:, None, :]                                              # (B, 1, NP)

    grid = (b, mtiles)
    tile_specs = [
        pl.BlockSpec((1, _MT, np_), lambda bi, mi: (bi, mi, 0)),   # scores
        pl.BlockSpec((1, _MT, 4), lambda bi, mi: (bi, mi, 0)),     # gt boxes
        pl.BlockSpec((1, 4, np_), lambda bi, mi: (bi, 0, 0)),      # pd boxes
        pl.BlockSpec((2, np_), lambda bi, mi: (0, 0)),             # anchors
        pl.BlockSpec((1, _MT, 1), lambda bi, mi: (bi, mi, 0)),     # atan gt
        pl.BlockSpec((1, 1, np_), lambda bi, mi: (bi, 0, 0)),      # atan pd
    ]
    # (B, 1, Np) with a unit sublane dim: TPU block shapes need the last
    # two dims (8-divisible or full); (1, Np) rows are neither
    acc_spec = pl.BlockSpec((1, 1, np_), lambda bi, mi: (bi, 0, 0))

    fg1, ovval, ovidx, first = pl.pallas_call(
        functools.partial(_pass1_kernel, m_real=m, topk=topk, alpha=alpha,
                          beta=beta, eps=eps),
        grid=grid,
        in_specs=tile_specs + [
            pl.BlockSpec((1, _MT, 1), lambda bi, mi: (bi, mi, 0)),  # valid
        ],
        out_specs=[acc_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, np_), jnp.int32),    # fg count
            jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),  # best overlap
            jax.ShapeDtypeStruct((b, 1, np_), jnp.int32),    # best-overlap gt
            jax.ShapeDtypeStruct((b, 1, np_), jnp.int32),    # first positive gt
        ],
        interpret=interpret,
    )(bbox_scores, gtb, pdb, anc, at_gt, at_pd, valid)
    fg1, ovval, ovidx, first = (x[:, 0] for x in (fg1, ovval, ovidx, first))

    multi = fg1 > 1
    fg = fg1 > 0
    target_gt_idx = jnp.where(
        fg, jnp.where(multi, ovidx, jnp.minimum(first, m - 1)), 0)

    norm = pl.pallas_call(
        functools.partial(_pass2_kernel, alpha=alpha, beta=beta, eps=eps,
                          assign_eps=eps),
        grid=grid,
        in_specs=tile_specs + [acc_spec, acc_spec],
        out_specs=acc_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
        interpret=interpret,
    )(bbox_scores, gtb, pdb, anc, at_gt, at_pd,
      target_gt_idx[:, None], fg1[:, None])[:, 0]

    target_gt_idx = target_gt_idx[:, :n]
    fg = fg[:, :n]
    norm = norm[:, :n]

    target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)
    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[:, :, None], axis=1)
    target_scores = jax.nn.one_hot(target_labels, nc, dtype=pd_scores.dtype)
    target_scores = jnp.where(fg[:, :, None], target_scores, 0.0)
    target_scores = target_scores * norm[:, :, None].astype(pd_scores.dtype)

    return (target_labels, target_bboxes, target_scores, fg, target_gt_idx)


@functools.lru_cache(maxsize=None)
def _partitioned_assign(topk: int, num_classes: int, alpha: float,
                        beta: float, eps: float, interpret: bool):
    """custom_partitioning wrapper: the assignment is independent per image,
    so under a data-parallel mesh each device must run the kernels on ITS
    batch shard. Without this rule GSPMD treats the pallas custom-calls as
    replicated and all-gathers the (B, N, nc) scores to every chip."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt):
        return _assign_impl(pd_scores, pd_bboxes, anc_points, gt_labels,
                            gt_bboxes, mask_gt, topk=topk,
                            num_classes=num_classes, alpha=alpha, beta=beta,
                            eps=eps, interpret=interpret)

    f = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        spec = getattr(arg_shapes[0].sharding, "spec", None)
        b_axis = spec[0] if spec else None

        def sh(rank):
            return NamedSharding(mesh, P(*([b_axis] + [None] * (rank - 1))))

        arg_sh = (sh(3), sh(3), NamedSharding(mesh, P()), sh(2), sh(3), sh(2))
        out_sh = (sh(2), sh(3), sh(3), sh(2), sh(2))
        return mesh, impl, out_sh, arg_sh

    # batch dim `b` propagates; n/m/c/f/t dims stay whole per shard
    f.def_partition(
        partition=partition,
        sharding_rule="b n c, b n f, n t, b m, b m f, b m "
                      "-> b n, b n f, b n c, b n, b n")
    return f


@functools.partial(jax.jit, static_argnames=("topk", "num_classes", "alpha",
                                             "beta", "eps", "interpret"))
def assign_pallas(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes,
                  mask_gt, topk: int = 10, num_classes: int = 80,
                  alpha: float = 0.5, beta: float = 6.0, eps: float = 1e-9,
                  interpret: bool = False) -> AssignResult:
    """Drop-in replacement for TaskAlignedAssigner.__call__ (train/tal.py)."""
    f = _partitioned_assign(topk, num_classes, alpha, beta, eps, interpret)
    out = f(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt)
    return AssignResult(*[jax.lax.stop_gradient(t) for t in out])
