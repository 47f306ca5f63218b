"""Differential tests pinning host augmentation RNG semantics to the torch
reference (VERDICT r3 Weak #2 / item 2).

The critical contract: `build_perspective_matrix` must consume the rng stream
and draw the scale `s` EXACTLY like the reference's `random_perspective`
(cerberusdet/data/augmentations.py:92-186) — including the branch structure of
`scaleup` (0.0 -> one symmetric draw; >0 -> coin flip then one of two draws).
The device-augment planner replays the same stream, so any divergence silently
changes every published training recipe.
"""

import math
import random

import numpy as np
import pytest

from cerberusdet_tpu.data.augment import build_perspective_matrix

cv2 = pytest.importorskip("cv2")


def _reference_matrix(im_shape, degrees, translate, scale, scaleup, shear,
                      perspective, border, rng):
    """Verbatim port of the reference draw order + matrix composition
    (cerberusdet/data/augmentations.py:104-144), parameterized on rng.
    Test-only: exists to differentially pin our implementation."""
    height = im_shape[0] + border[0] * 2
    width = im_shape[1] + border[1] * 2
    C = np.eye(3)
    C[0, 2] = -im_shape[1] / 2
    C[1, 2] = -im_shape[0] / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    if not scaleup:
        s = rng.uniform(1 - scale, 1 + scale)
    else:
        if rng.random() < 0.5:
            s = rng.uniform(1 - scale, 1 + scale)
        else:
            s = rng.uniform(1.09, 1 + scaleup)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height
    M = T @ S @ R @ P @ C
    return M, s


@pytest.mark.smoke
@pytest.mark.parametrize("scaleup", [0.0, 0.5, 1.0])
def test_scale_draw_matches_reference(scaleup):
    """Identical rng seed -> bitwise-identical drawn scale AND full matrix,
    for the reference's three scaleup regimes (incl. the shipped
    hyp.cerber-voc_obj365*.yaml value scaleup=0.0)."""
    hyp = dict(degrees=0.299, translate=0.143, scale=0.898, shear=0.717,
               perspective=0.0)
    saw_upper_branch = False
    for seed in range(400):
        M_ref, s_ref = _reference_matrix(
            (640, 640), hyp["degrees"], hyp["translate"], hyp["scale"],
            scaleup, hyp["shear"], hyp["perspective"], (0, 0),
            random.Random(seed))
        M_ours, s_ours, w, h = build_perspective_matrix(
            (640, 640), degrees=hyp["degrees"], translate=hyp["translate"],
            scale=hyp["scale"], shear=hyp["shear"],
            perspective=hyp["perspective"], border=(0, 0), scaleup=scaleup,
            rng=random.Random(seed))
        assert s_ours == s_ref, (seed, s_ours, s_ref)
        np.testing.assert_array_equal(M_ours, M_ref)
        if scaleup:
            # replay the stream to see which branch the coin flip took
            probe = random.Random(seed)
            for _ in range(3):  # perspective x2 + degrees
                probe.uniform(0, 1)
            if probe.random() >= 0.5:
                saw_upper_branch = True
                assert 1.09 <= s_ref <= 1 + scaleup
    if scaleup:
        # the uniform(1.09, 1+scaleup) branch must actually exist and fire
        assert saw_upper_branch


@pytest.mark.smoke
def test_scaleup_zero_is_symmetric():
    """scaleup=0.0 must draw ABOVE 1.0 about half the time (the r3 bug drew
    down-only 1-scale..1.0)."""
    ups = 0
    n = 2000
    for seed in range(n):
        _, s, _, _ = build_perspective_matrix(
            (64, 64), degrees=0, translate=0, scale=0.5, shear=0,
            perspective=0.0, border=(0, 0), scaleup=0.0,
            rng=random.Random(seed))
        ups += s > 1.0
    assert 0.4 < ups / n < 0.6


@pytest.mark.smoke
def test_scaleup_float_not_bool_coerced():
    """scaleup=0.5 with scale=0 must sometimes draw from uniform(1.09, 1.5) —
    proving the hyp reaches the matrix builder as a float."""
    top = 0.0
    for seed in range(200):
        _, s, _, _ = build_perspective_matrix(
            (64, 64), degrees=0, translate=0, scale=0.0, shear=0,
            perspective=0.0, border=(0, 0), scaleup=0.5,
            rng=random.Random(seed))
        top = max(top, s)
        assert s == 1.0 or 1.09 <= s <= 1.5
    assert top > 1.09
