"""Unit tests for the training-recipe A/B harness result parsers
(tools/ab_recipe.py) — the formats are pinned against real artifacts from
both trainers (reference results.txt Val lines; our results.txt epoch
lines)."""

import pytest

from cerberusdet_tpu.tools.ab_recipe import _fitness, parse_ours, parse_ref

pytestmark = pytest.mark.smoke

REF_RESULTS = """\
Train shapes_a:   shapes_a     10/99        0G     1.337   0.02441     1.484     2.845        20       192
Val shapes_a:   0.005571    0.1176   0.00366 0.0006127     4.743   0.03021     3.568
Val shapes_b:   0.008928    0.1771  0.006838  0.001086     4.499   0.03039     3.544
Val shapes_a:     0.7044    0.7429    0.7715    0.6137    0.5761    0.0113    0.9614
Val shapes_b:     0.3922    0.7206    0.4752    0.3929    0.5725   0.01371    0.9718
"""

OURS_RESULTS = """\
epoch 0 task shapes_a P 0.00056 R 0.01471 mAP50 0.00004 mAP 0.00000 fitness 0.00001
epoch 1 task shapes_a P 0.97666 R 0.98992 mAP50 0.99354 mAP 0.94857 fitness 0.95307
epoch 1 task shapes_b P 0.98439 R 0.96286 mAP50 0.97771 mAP 0.95321 fitness 0.95566
epoch 2 task shapes_a P 0.5 R 0.5 mAP50 0.50000 mAP 0.40000 fitness 0.41000
"""


def test_parse_ref_best_per_task(tmp_path):
    f = tmp_path / "results.txt"
    f.write_text(REF_RESULTS)
    best = parse_ref(f)
    assert set(best) == {"shapes_a", "shapes_b"}
    # best row by fitness = 0.1*mAP50 + 0.9*mAP, not by recency
    fit_a, map50_a, map_a = best["shapes_a"]
    assert map50_a == pytest.approx(0.7715)
    assert map_a == pytest.approx(0.6137)
    assert fit_a == pytest.approx(_fitness(0.7715, 0.6137))


def test_parse_ours_best_per_task(tmp_path):
    f = tmp_path / "results.txt"
    f.write_text(OURS_RESULTS)
    best = parse_ours(f)
    # epoch 2's lower fitness must not displace epoch 1's best
    assert best["shapes_a"][0] == pytest.approx(0.95307)
    assert best["shapes_a"][1] == pytest.approx(0.99354)
    assert best["shapes_b"][0] == pytest.approx(0.95566)
