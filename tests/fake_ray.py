"""In-process fake of the narrow ray[tune] API surface RayEvolver drives.

ray is not installed and not installable in this image (no egress, no local
wheels) — see STATUS.md. This fake lets the REAL evolver code (search-space
construction, objective, reformat_config, driver-side bookkeeping) execute
end-to-end; only ray's process scheduling is simulated (trials run serially
in-process).
"""

import sys
import types

import numpy as np


def install_ray_stub(monkeypatch, record):
    """Minimal ray[tune] API surface driven the way RayEvolver uses it."""
    rng = np.random.default_rng(0)

    class Uniform:
        def __init__(self, lo, hi):
            self.lo, self.hi = lo, hi

        def sample(self):
            return float(rng.uniform(self.lo, self.hi))

    class TuneConfig:
        def __init__(self, **kw):
            record["tune_config"] = kw

    class Tuner:
        def __init__(self, objective, param_space=None, tune_config=None):
            self.objective = objective
            self.space = param_space

        def fit(self):
            n = record["tune_config"]["num_samples"]
            results = []
            for _ in range(n):
                cfg = {k: v.sample() for k, v in self.space.items()}
                record["configs"].append(cfg)
                before = len(record["reports"])
                self.objective(cfg)
                metrics = record["reports"][-1] if len(record["reports"]) > before else {}
                results.append(types.SimpleNamespace(metrics=metrics))
            return results

    class ASHAScheduler:
        def __init__(self, **kw):
            record["scheduler"] = kw

    class BasicVariantGenerator:
        pass

    class ConcurrencyLimiter:
        def __init__(self, inner, max_concurrent):
            record["max_concurrent"] = max_concurrent

    class Session:
        @staticmethod
        def report(metrics):
            record["reports"].append(metrics)

    ray = types.ModuleType("ray")
    tune = types.ModuleType("ray.tune")
    tune.uniform = Uniform
    tune.Tuner = Tuner
    tune.TuneConfig = TuneConfig
    schedulers = types.ModuleType("ray.tune.schedulers")
    schedulers.ASHAScheduler = ASHAScheduler
    search = types.ModuleType("ray.tune.search")
    search.BasicVariantGenerator = BasicVariantGenerator
    search.ConcurrencyLimiter = ConcurrencyLimiter
    air = types.ModuleType("ray.air")
    air.session = Session
    ray.tune = tune
    ray.air = air
    for name, mod in [("ray", ray), ("ray.tune", tune),
                      ("ray.tune.schedulers", schedulers),
                      ("ray.tune.search", search), ("ray.air", air)]:
        monkeypatch.setitem(sys.modules, name, mod)


