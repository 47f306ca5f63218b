"""Task-Aligned Assigner (anchor-free label assignment), fully jittable.

Behavioral parity target: cerberusdet/utils/tal.py:13-178. Static shapes
throughout: ground truths are padded to a fixed max count with a validity
mask (the reference already pads per-batch in Loss.preprocess, loss.py:111-124
— here padding is a pipeline invariant, so the whole assigner compiles once).
Everything runs under stop_gradient (reference uses @torch.no_grad).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cerberusdet_tpu.ops.boxes import bbox_iou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray   # (B, N) int32
    target_bboxes: jnp.ndarray   # (B, N, 4) xyxy
    target_scores: jnp.ndarray   # (B, N, nc)
    fg_mask: jnp.ndarray         # (B, N) bool
    target_gt_idx: jnp.ndarray   # (B, N) int32


def select_candidates_in_gts(xy_centers, gt_bboxes, eps: float = 1e-9):
    """(N, 2) anchor centers inside (B, M, 4) xyxy gts -> (B, M, N) bool."""
    lt = gt_bboxes[..., None, :2]   # (B, M, 1, 2)
    rb = gt_bboxes[..., None, 2:4]
    deltas = jnp.concatenate(
        [xy_centers[None, None] - lt, rb - xy_centers[None, None]], axis=-1
    )  # (B, M, N, 4)
    return jnp.min(deltas, axis=-1) > eps


def select_highest_overlaps(mask_pos, overlaps):
    """Resolve anchors assigned to multiple gts: keep highest-CIoU gt.
    mask_pos/overlaps: (B, M, N). Returns (target_gt_idx (B,N), fg_mask (B,N),
    mask_pos)."""
    fg = jnp.sum(mask_pos, axis=-2)  # (B, N)
    multi = (fg > 1)[:, None, :]  # (B, 1, N)
    n_max = mask_pos.shape[1]
    is_max = jax.nn.one_hot(jnp.argmax(overlaps, axis=1), n_max, axis=1, dtype=mask_pos.dtype)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg = jnp.sum(mask_pos, axis=-2)
    target_gt_idx = jnp.argmax(mask_pos, axis=-2)
    return target_gt_idx, fg, mask_pos


class TaskAlignedAssigner:
    def __init__(self, topk: int = 10, num_classes: int = 80, alpha: float = 0.5,
                 beta: float = 6.0, eps: float = 1e-9):
        self.topk = topk
        self.nc = num_classes
        self.alpha = alpha
        self.beta = beta
        self.eps = eps

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes,
                 mask_gt) -> AssignResult:
        """
        Args (all static-shape):
          pd_scores: (B, N, nc) sigmoid scores.
          pd_bboxes: (B, N, 4) xyxy in input pixels.
          anc_points: (N, 2) anchor centers in input pixels.
          gt_labels: (B, M) int class ids (padded entries arbitrary).
          gt_bboxes: (B, M, 4) xyxy in input pixels.
          mask_gt: (B, M) bool validity.
        """
        out = self._assign(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt)
        return AssignResult(*[jax.lax.stop_gradient(t) for t in out])

    def _assign(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt):
        b, m = gt_labels.shape
        labels = jnp.clip(gt_labels, 0, self.nc - 1).astype(jnp.int32)

        # per-(gt, anchor) score of the gt's class: (B, M, N)
        bbox_scores = jnp.take_along_axis(
            jnp.transpose(pd_scores, (0, 2, 1)), labels[:, :, None], axis=1
        )
        overlaps = jnp.clip(
            bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True),
            0.0,
        )
        align_metric = bbox_scores**self.alpha * overlaps**self.beta

        mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)
        metrics = align_metric * mask_in_gts
        is_in_topk = self._topk_mask(metrics, mask_gt)
        mask_pos = is_in_topk * mask_in_gts * mask_gt[:, :, None]

        target_gt_idx, fg, mask_pos = select_highest_overlaps(mask_pos, overlaps)

        # gather targets
        target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)  # (B, N)
        target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[:, :, None], axis=1)
        target_scores = jax.nn.one_hot(target_labels, self.nc, dtype=pd_scores.dtype)
        target_scores = jnp.where((fg > 0)[:, :, None], target_scores, 0.0)

        # normalize by per-gt max alignment (tal.py:108-113)
        align_metric = align_metric * mask_pos
        pos_align = jnp.max(align_metric, axis=-1, keepdims=True)  # (B, M, 1)
        pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
        norm = jnp.max(align_metric * pos_overlaps / (pos_align + self.eps), axis=-2)  # (B, N)
        target_scores = target_scores * norm[:, :, None]

        return target_labels, target_bboxes, target_scores, fg > 0, target_gt_idx

    def _topk_mask(self, metrics, mask_gt):
        """(B, M, N) metrics -> (B, M, N) 0/1 top-k membership per gt."""
        b, m, n = metrics.shape
        k = min(self.topk, n)
        _, topk_idxs = jax.lax.top_k(metrics, k)  # (B, M, k)
        # memory-efficient scatter instead of one_hot(...).sum(-2): avoids a
        # (B, M, k, N) intermediate at 8400 anchors
        bidx = jnp.arange(b)[:, None, None]
        midx = jnp.arange(m)[None, :, None]
        counts = jnp.zeros((b, m, n), jnp.int32).at[bidx, midx, topk_idxs].add(1)
        counts = jnp.where(mask_gt[:, :, None], counts, 0)
        return jnp.where(counts > 1, 0, counts).astype(metrics.dtype)
