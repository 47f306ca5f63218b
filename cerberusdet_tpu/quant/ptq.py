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
                    select: Optional[Callable] = None,
                    model=None) -> Params:
    """Rewrite selected fused Conv leaves {"w","b"} into the int8 layout
    {"w_q","s_w","s_x","b"} consumed by nn.layers.Conv/nn.module.conv2d_int8.
    Only paths present in `amax` (i.e. actual Conv layers that saw the
    calibration data) are candidates.

    With `model` (the CerberusModel) given, additionally runs
    propagate_act_quant so cross-layer Concat/Upsample chains carry int8."""
    if select is None:
        select = select_deep()
    host_sx: Dict[Path, float] = {}  # conv path -> host-side s_x

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
            host_sx[path] = float(np.float32(a / 127.0))
            return {
                "w_q": jnp.asarray(w_q),
                "s_w": jnp.asarray(s_w, jnp.float32),
                "s_x": jnp.asarray(np.float32(a / 127.0)),
                "b": node["b"],
            }
        return {k: walk(v, path + (k,)) for k, v in node.items()}

    out = {uid: walk(sub, (uid,)) for uid, sub in fused_params.items()}
    if model is not None:
        out = propagate_act_quant(model, out, host_sx)
    return out


def propagate_act_quant(model, qparams: Params,
                        host_sx: Optional[Dict[Path, float]] = None) -> Params:
    """Push activation quantization up to each tensor's PRODUCER
    (VERDICT r3 item 1: the int8 trace showed ~11 ms/iter of standalone
    quantize 'loop fusions' after concats plus bf16-wide concats and
    bf16-wide inter-layer activations).

    Per-tensor symmetric scales are a property of the TENSOR: every
    quantized conv reading the same tensor calibrates the identical
    s_x = amax/127. A reverse-topological pass therefore computes, for
    every inter-layer tensor, the set of scales its consumers require:

      * Conv-like consumer          -> its own s_x (None if unquantized)
      * Detect head (input i)       -> box{i}/cls{i} tower-entry s_x
      * Concat / Upsample consumer  -> whatever ITS consumers resolved to
        (the quantize commutes exactly through both)

    When the set is a single scale, the producing block is annotated with
    "__q_out__" (the model forward quantizes its output once — XLA fuses
    that into the block's last conv epilogue) and Concat/Upsample steps are
    annotated with "q_in" (covering chunks whose producers could not
    annotate). Downstream quantized convs then receive int8 directly and
    every hop of the chain moves int8 bytes instead of bf16.

    quantize_act commutes exactly with concat/nearest-upsample and is
    applied to the same bf16 value the consumer conv would have quantized,
    so the compiled math is BITWISE identical to the unannotated graph —
    only fusion placement and bytes moved change (tests/test_quant.py pins
    this end-to-end on the full model)."""
    from cerberusdet_tpu.nn import layers as L

    if host_sx is None:  # standalone use: fetch scales from the tree once
        host_sx = {}

        def collect(node, path):
            if isinstance(node, dict):
                if "w_q" in node:
                    host_sx[path] = float(node["s_x"])
                else:
                    for k, v in node.items():
                        collect(v, path + (k,))

        for uid, sub in qparams.items():
            collect(sub, (uid,))

    steps = model.plan()
    consumers: Dict[str, list] = {}
    for s in steps:
        for u in s.in_uids:
            consumers.setdefault(u, []).append((s, s.in_uids.index(u)))

    def entry_scale(step, pos):
        """Scale the consumer `step` needs its input (at position pos)
        quantized with — None if it needs the float value."""
        if step.task is not None:
            sb = host_sx.get((step.uid, f"box{pos}", "0"))
            sc = host_sx.get((step.uid, f"cls{pos}", "0"))
            return sb if sb is not None and sb == sc else None
        layer = model.parsed.nodes[step.node_idx].layer
        if type(layer) in (L.Conv, L.DWConv):
            return host_sx.get((step.uid,))
        if isinstance(layer, (L.C2f, L.C2, L.SPP, L.SPPF)):
            return host_sx.get((step.uid, "cv1"))
        if isinstance(layer, L.C3):
            # cv1 and cv2 both read x -> identical calibrated scales
            s1 = host_sx.get((step.uid, "cv1"))
            s2 = host_sx.get((step.uid, "cv2"))
            return s1 if s1 is not None and s1 == s2 else None
        if isinstance(layer, (L.Concat, L.Upsample)):
            return resolved.get(step.uid)  # already computed (reverse order)
        return None

    # reverse-topological resolution: plan() is forward-topological, so a
    # consumer's own requirement is resolved before its producers are visited
    resolved: Dict[str, Optional[float]] = {}
    for s in reversed(steps):
        if s.task is not None:
            continue
        needs = {entry_scale(c, pos) for c, pos in consumers.get(s.uid, [])}
        resolved[s.uid] = needs.pop() if len(needs) == 1 else None

    out = dict(qparams)
    for s in steps:
        if s.task is not None:
            continue
        scale = resolved.get(s.uid)
        if scale is None:
            continue
        layer = model.parsed.nodes[s.node_idx].layer
        if isinstance(layer, (L.Concat, L.Upsample)):
            out[s.uid] = {**out.get(s.uid, {}), "q_in": jnp.float32(scale)}
        elif isinstance(layer, (L.Conv, L.DWConv, L.C2f, L.C2, L.C3, L.SPP,
                                L.SPPF)):
            out[s.uid] = {**out.get(s.uid, {}),
                          "__q_out__": jnp.float32(scale)}
    return out
