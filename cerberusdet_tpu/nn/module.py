"""Minimal functional NN core for the TPU-native layer zoo.

Design (deliberately NOT a port of torch nn.Module):
  * Parameters live in plain nested dicts (a pytree). A layer object holds only
    static configuration; `layer.init(rng) -> params` and
    `layer(params, x, ctx, path) -> y` are pure.
  * BatchNorm running statistics are stored inside the same params tree (leaves
    "mean"/"var"); during training the new running stats are *collected* into
    `ctx.updates` (a flat {path-tuple: array} dict) and merged functionally by
    the train step. This replaces torch's in-place buffer mutation.
  * Layout is NHWC / HWIO (TPU-native); compute dtype is configurable (bf16 on
    the MXU with fp32 accumulation), statistics & params are fp32.

Reference behavior being matched (not ported): cerberusdet/models/common.py
(Conv = Conv2d+BN(eps=1e-3, momentum=0.03)+SiLU, fuseforward),
cerberusdet/utils/torch_utils.py:179-217 (initialize_weights, fuse_conv_and_bn).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
Path = Tuple[str, ...]

BN_EPS = 1e-3
BN_MOMENTUM = 0.03


class Ctx:
    """Trace-time context threaded through a forward pass."""

    def __init__(self, train: bool = False, dtype=jnp.float32, freeze_bn: bool = False,
                 freeze_bn_uids=frozenset(), img_mask=None):
        self.train = train
        self.dtype = dtype  # compute dtype for convs (params stay fp32)
        self.freeze_bn = freeze_bn  # when True, use running stats even in train
        self.freeze_bn_uids = freeze_bn_uids  # per-block freeze (freeze_shared_layers)
        # per-image validity (B,) 0/1: rows padded for mesh divisibility are
        # excluded from BN batch statistics (and from the loss downstream), so
        # a padded step computes EXACTLY the unpadded gradients
        self.img_mask = img_mask
        self.updates: Dict[Path, jnp.ndarray] = {}
        # when not None, Conv layers record their input absmax here at trace
        # time (PTQ calibration; see quant/ptq.py)
        self.taps: Optional[Dict[Path, jnp.ndarray]] = None

    def put_update(self, path: Path, value) -> None:
        self.updates[path] = value

    def replace(self, **kw) -> "Ctx":
        new = Ctx(train=self.train, dtype=self.dtype, freeze_bn=self.freeze_bn,
                  freeze_bn_uids=self.freeze_bn_uids, img_mask=self.img_mask)
        new.__dict__.update(kw)
        new.updates = self.updates  # share the collector
        if "taps" not in kw:
            new.taps = self.taps
        return new


def merge_updates(params: Params, updates: Dict[Path, jnp.ndarray]) -> Params:
    """Return a copy of `params` with flat-path updates written in."""
    if not updates:
        return params
    out = dict(params)

    def _set(d: Dict[str, Any], path: Path, value):
        key = path[0]
        if len(path) == 1:
            d[key] = value
            return
        child = dict(d[key])
        _set(child, path[1:], value)
        d[key] = child

    for path, value in updates.items():
        _set(out, path, value)
    return out


def apply_bn_updates(params: Params, updates: Dict[Path, jnp.ndarray],
                     momentum: float = BN_MOMENTUM) -> Params:
    """Fold RAW batch statistics collected by batch_norm into the running
    stats: running = (1 - m) * running + m * batch. Call once per task forward,
    in task order, to reproduce sequential buffer-update semantics."""
    if not updates:
        return params

    def _get(d, path):
        for k in path:
            d = d[k]
        return d

    folded = {p: (1 - momentum) * _get(params, p) + momentum * v for p, v in updates.items()}
    return merge_updates(params, folded)


def autopad(k, p=None, d: int = 1):
    """'same'-ish padding used throughout YOLO configs. Accepts int or
    (kh, kw) kernels (common.py:42-48)."""
    if p is not None:
        return p
    if isinstance(k, (tuple, list)):
        return tuple(autopad(x, None, d) for x in k)
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2


def kaiming_uniform(rng, shape, fan_in: int, dtype=jnp.float32, a: float = math.sqrt(5)):
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def init_conv_w(rng, k, c_in: int, c_out: int, groups: int = 1, dtype=jnp.float32):
    """HWIO conv kernel with torch-default kaiming-uniform fan-in init.
    k may be an int or (kh, kw)."""
    kh, kw = (k, k) if isinstance(k, int) else k
    fan_in = (c_in // groups) * kh * kw
    return kaiming_uniform(rng, (kh, kw, c_in // groups, c_out), fan_in, dtype)


def init_bn(c: int, dtype=jnp.float32) -> Params:
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def conv2d(x, w, stride=1, padding=None, groups: int = 1,
           dilation: int = 1, dtype=jnp.float32):
    """NHWC conv with fp32 MXU accumulation; inputs cast to compute dtype.
    stride/padding may be ints or (h, w) pairs; kernel size read from w."""
    kh, kw = w.shape[0], w.shape[1]
    p = autopad((kh, kw), padding, dilation)
    ph, pw = (p, p) if isinstance(p, int) else p
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    # bf16 convs return bf16 (MXU accumulates f32 internally); requesting an
    # f32 output via preferred_element_type would break the conv's VJP under
    # mixed precision (f32 cotangent vs bf16 operands). BN upcasts to f32.
    pet = jnp.float32 if dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        w.astype(dtype),
        window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=pet,
    )
    return y


def quantize_act(x, s_x):
    """Per-tensor symmetric int8 activation quantization. Passes int8 input
    through untouched (the caller guarantees it was quantized with the same
    scale — see quant/ptq.py:propagate_act_quant).

    round/clip are monotone elementwise, so this commutes EXACTLY with
    concat/split/nearest-upsample/max-pool: pre-quantizing the inputs of
    those data-movement ops is bitwise-identical to quantizing their output,
    but lets XLA fuse the quantize into each producer conv's epilogue and
    halves the bytes the data movement touches."""
    if x.dtype == jnp.int8:
        return x
    inv_sx = 1.0 / s_x
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv_sx),
                    -127.0, 127.0).astype(jnp.int8)


def conv2d_int8(x, p: Params, stride=1, padding=None, groups: int = 1,
                dilation: int = 1):
    """Quantized inference conv (PTQ layout from quant/ptq.py): activations
    are quantized per-tensor symmetric to int8 on the fly (or consumed
    pre-quantized — see quantize_act), weights are pre-quantized
    per-output-channel, the MXU accumulates in int32 (2x the bf16 peak on
    TPU), and the result is dequantized into the fused bias add.

    p: {"w_q" int8 HWIO, "s_w" (c2,) f32, "s_x" scalar f32, "b" (c2,) f32}.
    """
    w_q = p["w_q"]
    kh, kw = w_q.shape[0], w_q.shape[1]
    pad = autopad((kh, kw), padding, dilation)
    ph, pw = (pad, pad) if isinstance(pad, int) else pad
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    y = jax.lax.conv_general_dilated(
        quantize_act(x, p["s_x"]),
        w_q,
        window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (p["s_x"] * p["s_w"]) + p["b"]


def batch_norm(p: Params, x, ctx: Ctx, path: Path, momentum: float = BN_MOMENTUM,
               eps: float = BN_EPS):
    """BN over N,H,W. Training mode normalizes with batch stats and collects
    updated running stats into ctx (torch semantics: biased var for
    normalization, unbiased for the running update)."""
    frozen = ctx.freeze_bn or (path and path[0] in ctx.freeze_bn_uids)
    if ctx.train and not frozen:
        axes = tuple(range(x.ndim - 1))
        if ctx.img_mask is not None:
            # weighted statistics over valid rows only: padded rows (mesh
            # divisibility, parallel/mesh.py pad_batch_to) must not perturb
            # the normalization of real rows
            w = ctx.img_mask.astype(jnp.float32).reshape(
                (-1,) + (1,) * (x.ndim - 1))
            per_row = 1
            for ax in axes[1:]:
                per_row *= x.shape[ax]
            n_f = jnp.maximum(jnp.sum(ctx.img_mask.astype(jnp.float32)), 1.0) * per_row
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf * w, axis=axes) / n_f
            var = jnp.sum(jnp.square(xf - mean) * w, axis=axes) / n_f
            unbiased = var * (n_f / jnp.maximum(n_f - 1.0, 1.0))
        else:
            # statistics in f32 regardless of activation dtype
            mean = jnp.mean(x, axis=axes, dtype=jnp.float32)
            var = jnp.mean(
                jnp.square(x.astype(jnp.float32) - mean), axis=axes, dtype=jnp.float32
            )
            n = 1
            for ax in axes:
                n *= x.shape[ax]
            unbiased = var * (n / max(n - 1, 1))
        # collect RAW batch stats; the train step folds them into the running
        # stats sequentially per task (see apply_bn_updates), matching the
        # reference's per-task-forward buffer updates
        ctx.put_update(path + ("mean",), mean)
        ctx.put_update(path + ("var",), unbiased)
    else:
        mean, var = p["mean"], p["var"]
    # the affine is applied in the ACTIVATION dtype (per-channel factors are
    # computed in f32): upcasting activations here would force f32 residuals
    # through the whole backward pass, doubling HBM traffic in bf16 training
    inv = jax.lax.rsqrt(var + eps) * p["scale"]
    shift = p["bias"] - mean * inv
    return x * inv.astype(x.dtype) + shift.astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def fuse_conv_bn(w, bn: Params, eps: float = BN_EPS):
    """Fold BN into conv weights/bias for inference (HWIO layout)."""
    inv = jax.lax.rsqrt(bn["var"] + eps) * bn["scale"]
    w_f = w * inv[None, None, None, :]
    b_f = bn["bias"] - bn["mean"] * inv
    return w_f, b_f


def split_rng(rng, n: int):
    return list(jax.random.split(rng, n))
