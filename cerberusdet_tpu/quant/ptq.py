"""Post-training int8 quantization for inference (VERDICT r2 item 2).

No reference equivalent (the reference serves fp16/fp32); this exists because
the TPU MXU's int8 path doubles the bf16 peak (v5e: 394 TOPS vs 197 TFLOP/s),
and the round-2 profile showed the model compute-bound on convs.

Scheme (standard TPU-friendly PTQ):
  * weights: per-OUTPUT-channel symmetric int8, quantized offline from the
    FUSED (BN-folded) weights;
  * activations: per-tensor symmetric int8, scale = amax/127 where amax is
    the max |input| observed over calibration batches (recorded by Conv
    layers via ctx.taps — one jitted forward per batch, no hooks);
  * conv accumulates int32 on the MXU; dequant (s_x * s_w per channel) and
    the fused bias ride the conv epilogue, SiLU stays in the compute dtype.

Selection: quantizing EVERY conv loses on the C<=160 stages (XLA pads the
128-lane MXU identically for int8, and the quant/dequant elementwise adds
HBM traffic), so `select_deep` targets convs with c_in >= min_cin only.
Measured end-to-end results live in PROFILE.md.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cerberusdet_tpu.nn.module import Ctx, Params, Path


def calibrate_amax(model, fused_params: Params, batches: Sequence,
                   dtype=jnp.bfloat16) -> Dict[Path, float]:
    """Run calibration batches through the fused model, collecting each
    Conv's input absmax. Returns {conv-path: amax} (host floats, max over
    batches)."""

    keys: list = []

    def run(p, x):
        ctx = Ctx(train=False, dtype=dtype)
        ctx.taps = {}
        model(p, x, ctx)
        keys[:] = sorted(ctx.taps)
        # ONE stacked output: fetching ~100 separate scalars costs a host
        # round-trip each on remote-relay backends
        return jnp.stack([ctx.taps[k] for k in keys])

    jrun = jax.jit(run)
    amax: Dict[Path, float] = {}
    for b in batches:
        vals = np.asarray(jrun(fused_params, jnp.asarray(b)))
        for k, v in zip(keys, vals):
            amax[k] = max(amax.get(k, 0.0), float(v))
    return amax


def select_all(path: Path, w: np.ndarray) -> bool:
    return True


def select_deep(min_cin: int = 256) -> Callable[[Path, np.ndarray], bool]:
    """Quantize only convs whose input-channel count maps well onto the
    128-lane MXU (the shallow C<=160 stages measured slower in int8)."""

    def f(path: Path, w) -> bool:
        return w.shape[2] >= min_cin

    return f


def quantize_params(fused_params: Params, amax: Dict[Path, float],
                    select: Optional[Callable] = None) -> Params:
    """Rewrite selected fused Conv leaves {"w","b"} into the int8 layout
    {"w_q","s_w","s_x","b"} consumed by nn.layers.Conv/nn.module.conv2d_int8.
    Only paths present in `amax` (i.e. actual Conv layers that saw the
    calibration data) are candidates."""
    if select is None:
        select = select_deep()

    def walk(node, path: Path):
        if not isinstance(node, dict):
            return node
        keys = set(node.keys())
        if keys == {"w", "b"} and getattr(node["w"], "ndim", 0) == 4:
            a = amax.get(path)
            if a is None or a <= 0.0 or not select(path, node["w"]):
                return node
            w = np.asarray(node["w"], np.float32)
            s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0  # (c2,)
            s_w = np.where(s_w == 0.0, 1.0, s_w)
            w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
            return {
                "w_q": jnp.asarray(w_q),
                "s_w": jnp.asarray(s_w, jnp.float32),
                "s_x": jnp.asarray(np.float32(a / 127.0)),
                "b": node["b"],
            }
        return {k: walk(v, path + (k,)) for k, v in node.items()}

    return {uid: walk(sub, (uid,)) for uid, sub in fused_params.items()}
