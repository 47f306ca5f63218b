"""Ray Tune-based distributed hyperparameter search (optional dependency).

Behavioral parity target: cerberusdet/evolvers/ray_evolver.py:22-235:
tune.Tuner + ASHA scheduler, searcher from a predefined registry with
ConcurrencyLimiter(4), uniform search spaces including per-task
'{hyp}_{task}' keys, and reformat_config folding task-suffixed samples back
into list-valued hyps. Ray is not part of this image; the class degrades to a
clear ImportError at construction, and `reformat_config` stays importable and
tested.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional

from cerberusdet_tpu.evolve.base_evolver import BaseEvolver

# searcher name -> (module, class) — mirrors predefined_evolvers.py:2-33
PREDEFINED_SEARCHERS = {
    "ax": ("ray.tune.search.ax", "AxSearch"),
    "bohb": ("ray.tune.search.bohb", "TuneBOHB"),
    "cfo": ("ray.tune.search.flaml", "CFO"),
    "dragonfly": ("ray.tune.search.dragonfly", "DragonflySearch"),
    "hebo": ("ray.tune.search.hebo", "HEBOSearch"),
    "hyperopt": ("ray.tune.search.hyperopt", "HyperOptSearch"),
    "nevergrad": ("ray.tune.search.nevergrad", "NevergradSearch"),
    "optuna": ("ray.tune.search.optuna", "OptunaSearch"),
    "skopt": ("ray.tune.search.skopt", "SkOptSearch"),
    "zoopt": ("ray.tune.search.zoopt", "ZOOptSearch"),
    "random": (None, None),
}


def reformat_config(config: Dict[str, Any], task_ids: List[str]) -> Dict[str, Any]:
    """Fold '{hyp}_{task}'-suffixed sampled values back into per-task lists
    (ray_evolver.py:208-235)."""
    out: Dict[str, Any] = {}
    per_task: Dict[str, Dict[str, float]] = {}
    for k, v in config.items():
        matched = False
        for task in task_ids:
            suffix = f"_{task}"
            if k.endswith(suffix):
                per_task.setdefault(k[: -len(suffix)], {})[task] = v
                matched = True
                break
        if not matched:
            out[k] = v
    for name, vals in per_task.items():
        out[name] = [vals[t] for t in task_ids]
    return out


class RayEvolver(BaseEvolver):
    def __init__(self, *args, searcher: str = "random", max_concurrent: int = 4, **kw):
        super().__init__(*args, **kw)
        try:
            import ray  # noqa: F401
            from ray import tune  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "RayEvolver requires ray[tune], which is not installed in this "
                "environment. Use Yolov5Evolver (--evolve) instead."
            ) from e
        if searcher not in PREDEFINED_SEARCHERS:
            raise ValueError(f"unknown searcher {searcher!r}")
        self.searcher = searcher
        self.max_concurrent = max_concurrent

    def search_space(self, hyp: Dict[str, Any]) -> Dict[str, Any]:
        from ray import tune

        space: Dict[str, Any] = {}
        for k, (g, lo, hi, enabled) in self.meta.items():
            if not enabled or k not in hyp:
                continue
            if isinstance(hyp[k], list):
                for task in self.task_ids:
                    space[f"{k}_{task}"] = tune.uniform(lo, hi)
            else:
                space[k] = tune.uniform(lo, hi)
        return space

    def run_evolution(self) -> None:
        from ray import tune
        from ray.tune.schedulers import ASHAScheduler
        from ray.tune.search import BasicVariantGenerator, ConcurrencyLimiter

        hyp0 = copy.deepcopy(self.init_hyp)

        import json as _json

        def objective(config):
            # Runs in a Ray TRIAL WORKER process: no driver state is shared,
            # so the trial only computes and REPORTS — all bookkeeping
            # (evolve.json, MLflow) happens on the driver from the
            # ResultGrid below (the reference's LoggerCallback is driver-side
            # for the same reason, ray_evolver.py:166-193)
            from ray.air import session

            hyp = dict(hyp0)
            hyp.update(reformat_config(config, self.task_ids))
            results = self.train_once(hyp)
            from cerberusdet_tpu.evaluation.metrics import overall_fitness

            session.report({
                "overall_fitness": overall_fitness(results),
                "hyps_json": _json.dumps(hyp, default=float),
                "results_json": _json.dumps(
                    {t: list(map(float, r)) for t, r in results.items()}),
            })

        if self.searcher == "random":
            search_alg = BasicVariantGenerator()
        else:
            mod_name, cls_name = PREDEFINED_SEARCHERS[self.searcher]
            import importlib

            cls = getattr(importlib.import_module(mod_name), cls_name)
            search_alg = ConcurrencyLimiter(cls(), max_concurrent=self.max_concurrent)

        tuner = tune.Tuner(
            objective,
            param_space=self.search_space(hyp0),
            tune_config=tune.TuneConfig(
                num_samples=self.generations,
                scheduler=ASHAScheduler(metric="overall_fitness", mode="max"),
                search_alg=search_alg,
            ),
        )
        result_grid = tuner.fit()
        # driver-side trial bookkeeping, in completion order
        for gen, res in enumerate(result_grid):
            metrics = getattr(res, "metrics", None) or {}
            if "results_json" not in metrics:
                continue  # errored trial
            hyp = _json.loads(metrics["hyps_json"])
            results = {t: tuple(r) for t, r in
                       _json.loads(metrics["results_json"]).items()}
            self.file_logger.append_mutation_to_file(
                hyp, results, self.opt.epochs, gen)
            self.log_generation_to_mlflow(gen, hyp, results)
        self.plot_evolution()
        self.sync_final_artifacts_to_mlflow()
