"""Checkpoint loading entry for eval/inference, with model ensembling.

Behavioral parity target: cerberusdet/models/experimental.py:84-139
(attempt_load: load one or several weights, pick ema over model, fuse, eval;
Ensemble concatenates candidate predictions for a joint NMS). MLflow
'models:/' URIs resolve via utils.mlflow_logging (gated).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.nn.module import Ctx


def load_single(weights: str, cfg: Optional[str] = None,
                task_ids: Optional[Sequence[str]] = None,
                nc: Optional[Sequence[int]] = None, fuse: bool = True):
    """Load one checkpoint -> (model, params, meta). Framework .ckpt.npz
    carries its own cfg/task metadata; .pt needs cfg/task_ids/nc."""
    if weights.startswith("models:/"):
        from cerberusdet_tpu.utils.mlflow_logging import attempt_mlflow_download

        weights = attempt_mlflow_download(weights)
    if weights.endswith(".pt"):
        if not cfg or not task_ids or nc is None:
            raise ValueError(
                ".pt weights carry no architecture metadata — pass the model "
                "config (--cfg) and the data yaml (--data) so task_ids/nc are "
                "known")
        from cerberusdet_tpu.manager.pt_import import import_pt

        model = CerberusModel(cfg, task_ids, nc)
        params = import_pt(model, model.init(jax.random.PRNGKey(0)), weights)
        meta: Dict = {"task_ids": list(task_ids), "nc": list(nc)}
    else:
        from cerberusdet_tpu.manager.checkpoint import load_checkpoint

        ckpt = load_checkpoint(weights)
        meta = ckpt["meta"]
        model = CerberusModel(cfg or meta["cfg"], meta["task_ids"], meta["nc"])
        src = ckpt["ema"] if ckpt.get("ema") else ckpt["params"]  # ema preferred
        params = jax.tree_util.tree_map(jnp.asarray, src)
    if fuse:
        params = model.fuse(params)
    return model, params, meta


class Ensemble:
    """Several loaded models over the SAME tasks; eval forward concatenates
    their decoded candidates on the anchor axis (nms ensemble,
    experimental.py:84-97)."""

    def __init__(self, members: List[Tuple[CerberusModel, dict]]):
        if not members:
            raise ValueError("empty ensemble")
        self.members = members
        self.task_ids = members[0][0].task_ids
        self.strides = members[0][0].strides

    def __call__(self, img, ctx: Optional[Ctx] = None,
                 tasks: Optional[Sequence[str]] = None) -> Dict[str, jnp.ndarray]:
        ctx = ctx or Ctx(train=False)
        preds: Dict[str, List] = {}
        for model, params in self.members:
            out = model(params, img, ctx, tasks=tasks)
            for t, (pred, _f) in out.items():
                preds.setdefault(t, []).append(pred)
        return {t: jnp.concatenate(ps, axis=1) for t, ps in preds.items()}


def attempt_load(weights: Union[str, Sequence[str]], cfg: Optional[str] = None,
                 task_ids: Optional[Sequence[str]] = None,
                 nc: Optional[Sequence[int]] = None, fuse: bool = True):
    """Load one ckpt -> (model, params, meta); several -> (Ensemble, None, meta)."""
    if isinstance(weights, (list, tuple)) and len(weights) > 1:
        members = []
        meta = {}
        for w in weights:
            m, p, meta = load_single(w, cfg, task_ids, nc, fuse)
            members.append((m, p))
        return Ensemble(members), None, meta
    w = weights[0] if isinstance(weights, (list, tuple)) else weights
    return load_single(w, cfg, task_ids, nc, fuse)
