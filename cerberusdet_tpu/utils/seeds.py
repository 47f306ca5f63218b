"""Global RNG seeding (reference parity: cerberusdet/utils/general.py:38
init_seeds + utils/torch_utils.py:51-57 init_torch_seeds).

The data pipeline itself never relies on these globals — the dataset derives
an explicit random.Random per (seed, epoch, index) (data/dataset.py) so that
multi-threaded prefetch stays bitwise-deterministic. Seeding the globals here
covers everything else (evolver mutation draws, ad-hoc numpy use) and makes
whole runs repeatable end-to-end.
"""

from __future__ import annotations

import random

import numpy as np


def init_seeds(seed: int = 0) -> "jax.Array":
    """Seed python + numpy global RNGs and return a jax PRNGKey(seed)."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    import jax

    return jax.random.PRNGKey(seed)
