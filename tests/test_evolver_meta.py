"""Search-space parity audit (VERDICT r2 item 8): our evolver's 24-hyp meta
table (mutation gain, lower bound, upper bound, enabled flag) must match the
reference's `self.meta` dict key-for-key and value-for-value
(/root/reference/cerberusdet/evolvers/base_evolver.py:37-61).

The reference table is extracted from its SOURCE via ast (no torch import
needed), so this test fails loudly if either side drifts.
"""

import ast
from pathlib import Path

from cerberusdet_tpu.evolve.base_evolver import DEFAULT_META

REF = Path("/root/reference/cerberusdet/evolvers/base_evolver.py")


def _extract_ref_meta():
    """Find the `self.meta = {...}` literal in the reference source."""
    tree = ast.parse(REF.read_text())
    for node in ast.walk(tree):
        if not isinstance(node, ast.Assign):
            continue
        tgt = node.targets[0]
        if (isinstance(tgt, ast.Attribute) and tgt.attr == "meta"
                and isinstance(node.value, ast.Dict)):
            return ast.literal_eval(node.value)
    raise AssertionError("reference meta dict not found")


def test_search_space_matches_reference_key_for_key():
    if not REF.exists():
        import pytest

        pytest.skip("reference source not available")
    ref_meta = _extract_ref_meta()
    assert list(DEFAULT_META) == list(ref_meta), (
        "hyp key set/order drifted from the reference")
    for k, ref_row in ref_meta.items():
        gain, lo, hi, enabled = ref_row
        ours = DEFAULT_META[k]
        assert ours == [gain, lo, hi, enabled], (
            f"{k}: ours {ours} != reference {ref_row}")


def test_params_to_evolve_filter_disables_rest():
    """params_to_evolve narrows the ENABLED set without touching bounds
    (base_evolver.py:63-66 semantics)."""
    import copy
    import types

    from cerberusdet_tpu.evolve.base_evolver import BaseEvolver

    class _E(BaseEvolver):
        def run_evolution(self, train_func):  # pragma: no cover
            raise NotImplementedError

    opt = types.SimpleNamespace(project="/tmp/evo_meta_test", name="x",
                                evolve_per_task=False)
    e = _E(opt, hyp={}, data_dict={"task_ids": ["a"]},
           params_to_evolve=["lr0", "mosaic"])
    assert e.params_to_evolve == ["lr0", "mosaic"]
    meta = copy.deepcopy(DEFAULT_META)
    for k in meta:
        if k not in ("lr0", "mosaic"):
            meta[k][3] = False
    assert e.meta == meta
