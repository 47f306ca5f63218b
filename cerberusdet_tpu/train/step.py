"""The multi-task gradient-averaging train step — ONE jitted XLA program.

Behavioral parity target: cerberusdet/trainers/averaging.py:97-223. The
reference runs T sequential forward/backward passes (one per task) and then a
manual optimizer step that divides each shared block's accumulated gradient by
its serving-task count. Here the whole thing is a single traced function:

    loss(p) = sum_t w_t * loss_t(p, batch_t)        # T forwards, fused by XLA
    grads   = d loss / d p                          # summed automatically
    grads  *= 1/serving_count (per block)           # the paper's averaging
    grads   = clip_by_global_norm(grads, 10)
    params  = SGD-nesterov(params, grads)           # 3 param groups
    params  = fold BN batch stats (sequential per task)
    ema     = ramped-decay EMA(params)

bf16 compute needs no GradScaler (reference AMP machinery, averaging.py:61,
disappears). `find_unused_parameters` is a non-issue: JAX computes zero grads
for unused heads by construction (SURVEY.md §2.2).

Data parallelism: the caller shards each task's batch over a Mesh 'data' axis
and calls the same step under jit with sharded inputs — XLA inserts the ICI
all-reduces (no NCCL/DDP analog needed).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cerberusdet_tpu.models.cerberus import CerberusModel
from cerberusdet_tpu.nn.module import Ctx, apply_bn_updates
from cerberusdet_tpu.train.loss import DetectionLoss, LossItems
from cerberusdet_tpu.train.optim import (
    SGDConfig,
    SGDState,
    build_group_tree,
    clip_by_global_norm,
    ema_update,
    sgd_init,
    sgd_update,
)


class TrainState:
    """Plain pytree-of-dicts train state (registered manually below)."""

    def __init__(self, params, opt_state: SGDState, ema_params, n_updates):
        self.params = params
        self.opt_state = opt_state
        self.ema_params = ema_params
        self.n_updates = n_updates

    def tree_flatten(self):
        return (self.params, self.opt_state, self.ema_params, self.n_updates), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: s.tree_flatten(),
    TrainState.tree_unflatten,
)


def init_train_state(params, sgd: SGDConfig = SGDConfig()) -> TrainState:
    # Real copies throughout: the step donates its input state, so the state
    # must not alias caller-held arrays (or params/ema each other).
    params = jax.tree_util.tree_map(jnp.copy, params)
    ema = jax.tree_util.tree_map(jnp.copy, params)
    return TrainState(params, sgd_init(params, sgd), ema, jnp.zeros((), jnp.int32))


class MultiTaskTrainer:
    """Builds and caches jitted steps per (active-task-subset, freeze_shared)."""

    def __init__(
        self,
        model: CerberusModel,
        losses: Dict[str, DetectionLoss],
        task_weights: Optional[Dict[str, float]] = None,
        sgd: SGDConfig = SGDConfig(),
        compute_dtype=jnp.float32,
        max_grad_norm: float = 10.0,
        ema_decay0: float = 0.9999,
    ):
        self.model = model
        self.losses = losses
        self.task_weights = task_weights or {t: 1.0 for t in model.task_ids}
        self.sgd = sgd
        self.compute_dtype = compute_dtype
        self.max_grad_norm = max_grad_norm
        self.ema_decay0 = ema_decay0
        self._steps: Dict[Tuple[Tuple[str, ...], bool], Any] = {}
        self._groups = None

    def step(self, state: TrainState, batches: Dict[str, Dict[str, jnp.ndarray]],
             lrs, momentum, freeze_shared: bool = False):
        """Run one optimizer step over the given per-task batches.

        batches: {task: {'img': (B,H,W,3) float in [0,1] or uint8,
                         'cls','bboxes','mask','prob'}}. lrs: (3,) per-group
        learning rates; momentum: scalar (both may change per call freely).
        Returns (new_state, {task: LossItems}).
        """
        tasks = tuple(sorted(batches.keys(), key=self.model.task_ids.index))
        key = (tasks, bool(freeze_shared))
        if key not in self._steps:
            self._steps[key] = jax.jit(self.raw_step(tasks, bool(freeze_shared)),
                                       donate_argnums=(0,))
        batch_list = tuple(batches[t] for t in tasks)
        return self._steps[key](state, batch_list, jnp.asarray(lrs, jnp.float32),
                                jnp.asarray(momentum, jnp.float32))

    def raw_step(self, tasks: Tuple[str, ...], freeze_shared: bool = False):
        """The UNJITTED step function (state, batch_list, lrs, momentum) ->
        (state, items) — compose it into larger jitted programs (lax.scan
        multi-step benchmarking, custom training loops)."""
        key = ("raw", tasks, bool(freeze_shared))
        if key not in self._steps:
            self._steps[key] = self._build_step(tasks, bool(freeze_shared))
        return self._steps[key]

    # ------------------------------------------------------------------
    def _build_step(self, tasks: Tuple[str, ...], freeze_shared: bool):
        model = self.model
        losses = self.losses
        weights = self.task_weights
        sgd_cfg = self.sgd
        cdtype = self.compute_dtype
        shared = frozenset(model.shared_uids())
        freeze_bn_uids = shared if freeze_shared else frozenset()

        # blocks not in this task subset's plan get NO optimizer update at all
        # (matching torch's skip of None-grad params after zero_grad: inactive
        # heads must not experience weight decay / momentum)
        active_uids = {s.uid for s in model.plan(tasks)}
        if freeze_shared:  # frozen shared blocks: no decay/momentum either
            active_uids -= shared

        def run(state: TrainState, batch_list, lrs, momentum):
            params = state.params
            if self._groups is None:
                self._groups = build_group_tree(params)
            groups = {
                uid: (g if uid in active_uids
                      else jax.tree_util.tree_map(lambda _: -1, g))
                for uid, g in self._groups.items()
            }
            scales = model.grad_scale_tree(params, tasks)

            def loss_fn(p):
                total = 0.0
                items: Dict[str, LossItems] = {}
                bn_updates = []
                for t, batch in zip(tasks, batch_list):
                    ctx = Ctx(train=True, dtype=cdtype, freeze_bn_uids=freeze_bn_uids,
                              img_mask=batch.get("img_mask"))
                    img = batch["img"]
                    if img.dtype == jnp.uint8:
                        img = img.astype(jnp.float32) / 255.0
                    out = model(p, img, ctx, tasks=[t])
                    loss_t, items_t = losses[t](out[t], batch)
                    total = total + weights[t] * loss_t
                    items[t] = items_t
                    bn_updates.append(ctx.updates)
                return total, (items, bn_updates)

            (_, (items, bn_updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = jax.tree_util.tree_map(lambda g, s: g * s, grads, scales)
            if freeze_shared:
                grads = {
                    uid: (jax.tree_util.tree_map(jnp.zeros_like, g) if uid in shared else g)
                    for uid, g in grads.items()
                }
            grads = clip_by_global_norm(grads, self.max_grad_norm)
            new_params, new_opt = sgd_update(sgd_cfg, groups, params, grads,
                                             state.opt_state, lrs, momentum)
            for upd in bn_updates:  # sequential per-task buffer fold
                new_params = apply_bn_updates(new_params, upd)
            n = state.n_updates + 1
            ema = ema_update(state.ema_params, new_params, n, self.ema_decay0)
            return TrainState(new_params, new_opt, ema, n), items

        return run
