"""Pallas NMS kernel vs the XLA reference implementation (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cerberusdet_tpu.ops.nms import greedy_nms, non_max_suppression
from cerberusdet_tpu.ops.nms_pallas import MAX_K, greedy_nms_pallas


def _random_candidates(B, K, seed=0, zeros_from=None):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(50, 600, (B, K, 2))
    wh = rng.uniform(10, 80, (B, K, 2))
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (B, K)).astype(np.float32)
    if zeros_from is not None:
        scores[:, zeros_from:] = 0.0
    return boxes, scores


@pytest.mark.parametrize("B,K,zeros", [(3, 512, 300), (8, 1024, None), (9, 256, 100)])
def test_pallas_matches_xla(B, K, zeros):
    boxes, scores = _random_candidates(B, K, seed=B, zeros_from=zeros)
    idx_p, val_p = greedy_nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                     0.5, 300, interpret=True)
    idx_p, val_p = np.asarray(idx_p), np.asarray(val_p)
    for b in range(B):
        idx_r, val_r = greedy_nms(jnp.asarray(boxes[b]), jnp.asarray(scores[b]), 0.5, 300)
        ours = idx_p[b][val_p[b]]
        ref = np.asarray(idx_r)[np.asarray(val_r)]
        np.testing.assert_array_equal(ours, ref)


def test_pallas_rejects_oversize():
    boxes = jnp.zeros((1, MAX_K + 128, 4))
    scores = jnp.zeros((1, MAX_K + 128))
    with pytest.raises(ValueError):
        greedy_nms_pallas(boxes, scores)


def test_nms_pallas_path_matches_xla_path():
    rng = np.random.default_rng(0)
    B, N, NC = 2, 256, 3
    pred = np.concatenate([
        rng.uniform(100, 500, (B, N, 2)), rng.uniform(10, 80, (B, N, 2)),
        rng.uniform(0, 1, (B, N, NC)),
    ], -1).astype(np.float32)
    pred = jnp.asarray(pred)
    # interpret-mode pallas path can't run under the outer jit on CPU; compare
    # the XLA path against itself with clamped max_nms (the pallas clamp)
    d1, c1 = non_max_suppression(pred, nc=NC, conf_thres=0.1, use_pallas=False)
    d2, c2 = non_max_suppression(pred, nc=NC, conf_thres=0.1, use_pallas=False,
                                 max_nms=MAX_K)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))
