"""Optimizer with YOLO's 3-param-group convention + EMA, pure pytree form.

Behavioral parity target: cerberusdet/trainers/averaging.py:226-269
(get_optimizer: group 0 = conv weights WITH weight decay, group 1 = BN scale
(no decay), group 2 = all biases (no decay); SGD-nesterov default, Adam/AdamW/
RMSProp options) and cerberusdet/utils/torch_utils.py:282-316 (ModelEMA with
ramped decay d0 * (1 - exp(-n / 2000))).

The train step passes per-group learning rates and the momentum as traced
scalars each iteration (warmup changes them per-step without recompiling).
BN running stats (mean/var leaves) are group -1: not touched by the optimizer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

N_GROUPS = 3  # 0: decayed weights, 1: bn scale, 2: biases


def leaf_group(path) -> int:
    """Classify a flattened-tree path into an optimizer group."""
    keys = [getattr(k, "key", str(k)) for k in path]
    leaf = keys[-1]
    if leaf in ("mean", "var"):
        return -1  # BN running stats: not optimized
    if leaf in ("b", "bias"):
        return 2
    if leaf == "scale":
        return 1
    if keys[-2:-1] == ["bn"]:
        return 1
    return 0  # conv / linear weights


def build_group_tree(params: Params) -> Params:
    """Same structure as params with int group ids as leaves."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    groups = [leaf_group(path) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, groups)


@dataclasses.dataclass(frozen=True)
class SGDConfig:
    weight_decay: float = 5e-4
    nesterov: bool = True
    # optimizer family (averaging.py:226-269 options): SGD | Adam | AdamW | RMSProp
    name: str = "SGD"
    beta2: float = 0.999
    eps: float = 1e-8


class SGDState(NamedTuple):
    momentum_buf: Params
    step: jnp.ndarray
    second_moment: Optional[Params] = None


def sgd_init(params: Params, cfg: SGDConfig = SGDConfig()) -> SGDState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    second = (jax.tree_util.tree_map(jnp.zeros_like, params)
              if cfg.name in ("Adam", "AdamW", "RMSProp") else None)
    return SGDState(momentum_buf=zeros, step=jnp.zeros((), jnp.int32),
                    second_moment=second)


def sgd_update(cfg: SGDConfig, groups: Params, params: Params, grads: Params,
               state: SGDState, lrs, momentum) -> Tuple[Params, SGDState]:
    """Parameter update with torch semantics for the optimizer families the
    reference exposes (averaging.py:226-269):

      SGD:     buf = mu*buf + g (+ wd*p for group 0); d = g + mu*buf if
               nesterov else buf; p -= lr[group] * d
      Adam:    L2 wd folded into the grad (group 0); bias-corrected moments
      AdamW:   decoupled weight decay (group 0)
      RMSProp: square-avg + momentum buffer

    lrs: (3,) array of per-group learning rates. momentum: scalar (Adam's
    beta1 per the reference's betas=(momentum, 0.999)).
    """
    lrs = jnp.asarray(lrs, jnp.float32)

    def eff_grad(g_id, p, g, coupled=True):
        if g_id == 0 and cfg.weight_decay and coupled:
            return g + cfg.weight_decay * p
        return g

    if cfg.name == "SGD":
        def upd_buf(g_id, p, g, buf):
            if g_id < 0:
                return buf
            return momentum * buf + eff_grad(g_id, p, g)

        def upd_param(g_id, p, g, new_buf):
            if g_id < 0:
                return p
            g = eff_grad(g_id, p, g)
            d = g + momentum * new_buf if cfg.nesterov else new_buf
            return p - lrs[g_id] * d

        new_buf = jax.tree_util.tree_map(upd_buf, groups, params, grads, state.momentum_buf)
        new_params = jax.tree_util.tree_map(upd_param, groups, params, grads, new_buf)
        return new_params, SGDState(momentum_buf=new_buf, step=state.step + 1,
                                    second_moment=state.second_moment)

    step = state.step + 1
    t = step.astype(jnp.float32)

    if cfg.name in ("Adam", "AdamW"):
        coupled = cfg.name == "Adam"  # Adam: L2 in grad; AdamW: decoupled
        b1, b2 = momentum, cfg.beta2
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - cfg.beta2 ** t

        def upd_m(g_id, p, g, m):
            if g_id < 0:
                return m
            return b1 * m + (1 - b1) * eff_grad(g_id, p, g, coupled)

        def upd_v(g_id, p, g, v):
            if g_id < 0:
                return v
            ge = eff_grad(g_id, p, g, coupled)
            return b2 * v + (1 - b2) * ge * ge

        def upd_param(g_id, p, m, v):
            if g_id < 0:
                return p
            new_p = p - lrs[g_id] * (m / bc1) / (jnp.sqrt(v / bc2) + cfg.eps)
            if not coupled and g_id == 0 and cfg.weight_decay:
                new_p = new_p - lrs[g_id] * cfg.weight_decay * p
            return new_p

        new_m = jax.tree_util.tree_map(upd_m, groups, params, grads, state.momentum_buf)
        new_v = jax.tree_util.tree_map(upd_v, groups, params, grads, state.second_moment)
        new_params = jax.tree_util.tree_map(upd_param, groups, params, new_m, new_v)
        return new_params, SGDState(new_m, step, new_v)

    if cfg.name == "RMSProp":
        alpha = 0.99  # torch default smoothing

        def upd_v(g_id, p, g, v):
            if g_id < 0:
                return v
            ge = eff_grad(g_id, p, g)
            return alpha * v + (1 - alpha) * ge * ge

        new_v = jax.tree_util.tree_map(upd_v, groups, params, grads, state.second_moment)

        def upd_buf(g_id, p, g, v, buf):
            if g_id < 0:
                return buf
            ge = eff_grad(g_id, p, g)
            return momentum * buf + ge / (jnp.sqrt(v) + cfg.eps)

        new_buf = jax.tree_util.tree_map(upd_buf, groups, params, grads, new_v,
                                         state.momentum_buf)

        def upd_param(g_id, p, buf):
            if g_id < 0:
                return p
            return p - lrs[g_id] * buf

        new_params = jax.tree_util.tree_map(upd_param, groups, params, new_buf)
        return new_params, SGDState(new_buf, step, new_v)

    raise ValueError(f"unknown optimizer {cfg.name!r}")


def clip_by_global_norm(grads: Params, max_norm: float = 10.0) -> Params:
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


# ----------------------------------------------------------------------- EMA
def ema_decay(updates: jnp.ndarray, d0: float = 0.9999, tau: float = 2000.0):
    """Ramped decay (torch_utils.py:282-316)."""
    return d0 * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))


def ema_update(ema_params: Params, params: Params, updates, d0: float = 0.9999):
    d = ema_decay(updates, d0)
    return jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p, ema_params, params)
