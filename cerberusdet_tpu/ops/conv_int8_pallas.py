"""Pallas TPU implicit-GEMM int8 3x3 convolution — the lane-repack kernel.

Why this exists (PROFILE.md "int8 roofline", round 4): XLA:TPU lowers a
conv by contracting Ci against the MXU's 128 lanes per pass, so the
reference's chunk convs (Ci = Co = 80/160/320 — NOT multiples of 128) are
architecturally capped at (Ci/pad128)*(Co/pad128) of peak: 39% for the
dominant 3x3 160->160 C2f bottleneck convs, which the trace shows running
at 33-40%. An implicit-GEMM formulation instead contracts the FLATTENED
patch dim K = kh*kw*Ci (1440 for Ci=160 -> 94% lane utilization after
padding to 1536), raising the class ceiling to ~59%.

The kernel: grid (B, H/TR). Per step it holds one whole input image in
VMEM (s8, <=4 MB for every v8x shape), zero-pads a (TR+2, W+2, Ci) halo
tile, im2cols it into a (TR*W, 9*Ci) patch matrix IN VMEM (nine VPU
copies — no HBM traffic), and runs ONE s8 x s8 -> s32 MXU dot against the
(9*Ci, Co) reshaped weights. The epilogue (dequant * (s_x*s_w[c]) + b,
SiLU, optional requantize to s8 for single-consumer chains) rides in the
kernel. The i32 accumulation is associative, so it is BITWISE equal to
lax.conv_general_dilated(preferred_element_type=int32) (pinned by the
`raw=True` test hook); the float epilogue agrees with conv2d_int8's to
2 bf16 ulps (the compiler may or may not contract the dequant
multiply-add into an FMA in either formulation).

Scope: k=3, stride 1, SAME padding, groups=1, dilation=1 — exactly the
C2f/Bottleneck conv shape class the roofline analysis flags.

**Measured verdict (v5e, tools/bench_pallas_conv, chained-loop): REJECTED —
0.58-0.89x vs XLA's conv emitter on all three shape classes.** The im2col
writes at tap offsets 160*t % 128 != 0 are lane ROTATIONS, and their VPU
cost exceeds the MXU lane-repack gain; the rotation-free alternative
(tap-major (9, M, Ci) patches + multi-dim contraction) is unsupported by
Mosaic ("tpu.matmul: lhs contracting dims must be of size 1"). Kept as a
correctness-pinned experiment + measurement harness; NOT routed into
conv2d_int8. Full numbers in PROFILE.md round-4. Same conclusion family
as the r2 Pallas convs and r3 space-to-depth: XLA's conv emitter wins
every head-to-head on this hardware generation.

Reference counterpart: none (the reference serves fp16 via cuDNN).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tr(h: int, w: int, ci: int) -> int:
    """Output-row tile: M = TR*W large enough for MXU depth, patches
    <= ~2 MB (the whole-image block + patches + padded i32 accumulator +
    double-buffered out blocks must fit the 16 MB VMEM: the 4 MB budget
    OOM'd by 24 KB at (160,160,80) on v5e)."""
    budget = 2 * 1024 * 1024
    tr = h
    while tr > 1 and (tr * w * 9 * ci > budget or h % tr):
        tr -= 1
    while h % tr:
        tr -= 1
    return max(tr, 1)


def _conv_kernel(x_ref, w_ref, scale_ref, bias_ref, qs_ref, out_ref,
                 xpad_ref, patch_ref, *, tr: int, act: bool, q_out: bool,
                 raw: bool = False):
    """One (batch, row-tile) step.

    x_ref:     (1, H, W, Ci) s8  — whole image, reused across row tiles
    w_ref:     (9*Ci, Co)    s8  — HWIO reshaped
    scale_ref: (1, Co) f32       — s_x * s_w per output channel
    bias_ref:  (1, Co) f32
    qs_ref:    (1, 1)  f32       — requantize scale (ignored if not q_out)
    out_ref:   (1, TR, W, Co) bf16 | s8
    xpad_ref:  (TR+2, W+2, Ci) s8 scratch (halo tile)
    patch_ref: (TR*W, 9*Ci) s8 scratch (im2col)
    """
    j = pl.program_id(1)
    h = x_ref.shape[1]
    w = x_ref.shape[2]
    ci = x_ref.shape[3]
    r0 = j * tr

    # --- halo tile: zero borders, then interior + valid halo rows/cols
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[1:tr + 1, 1:w + 1, :] = x_ref[0, pl.ds(r0, tr), :, :]

    @pl.when(j > 0)
    def _top():
        xpad_ref[0, 1:w + 1, :] = x_ref[0, r0 - 1, :, :]

    @pl.when(j < pl.num_programs(1) - 1)
    def _bot():
        xpad_ref[tr + 1, 1:w + 1, :] = x_ref[0, r0 + tr, :, :]

    # --- im2col: nine shifted copies, all VMEM->VMEM. The (M, 9*Ci)
    # layout is forced: Mosaic's tpu.matmul only contracts ONE dim, so a
    # lane-aligned tap-major (9, M, Ci) patch tensor + multi-dim
    # dot_general is unsupported ("lhs contracting dims must be of size
    # 1") — and with Ci % 128 != 0 these writes land at rotated lane
    # offsets, which is exactly where the measured time goes (PROFILE
    # round-4 rejection table).
    for dy in range(3):
        for dx in range(3):
            k0 = (dy * 3 + dx) * ci
            patch_ref[:, pl.ds(k0, ci)] = xpad_ref[
                pl.ds(dy, tr), pl.ds(dx, w), :].reshape(tr * w, ci)

    # --- ONE dot over K = 9*Ci (the lane-repack): s8 x s8 -> s32 on the MXU
    acc = jax.lax.dot_general(
        patch_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    if raw:  # test hook: expose the exact int32 accumulation
        out_ref[0] = acc.reshape(tr, out_ref.shape[2], out_ref.shape[3])
        return
    y = acc.astype(jnp.float32) * scale_ref[0][None, :] + bias_ref[0][None, :]
    if act:
        y = y * jax.nn.sigmoid(y)
    if q_out:
        inv = 1.0 / qs_ref[0, 0]
        y = jnp.clip(jnp.round(y * inv), -127, 127)
    out_ref[0] = y.reshape(tr, w, out_ref.shape[3]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "q_out", "tr", "interpret", "raw"))
def _conv3x3_s8_call(xq, w_q, scale, bias, q_scale, *, act: bool,
                     q_out: bool, tr: int, interpret: bool,
                     raw: bool = False):
    b, h, w, ci = xq.shape
    co = w_q.shape[1]
    grid = (b, h // tr)
    kernel = functools.partial(_conv_kernel, tr=tr, act=act, q_out=q_out,
                               raw=raw)
    out_dtype = (jnp.int32 if raw
                 else jnp.int8 if q_out else jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # whole image; index_map constant in j -> block stays resident
            pl.BlockSpec((1, h, w, ci), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((9 * ci, co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, w, co), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tr + 2, w + 2, ci), jnp.int8),
            pltpu.VMEM((tr * w, 9 * ci), jnp.int8),
        ],
        interpret=interpret,
    )(xq, w_q, scale, bias, q_scale)


def conv3x3_s8(x, p, act: bool = True, q_out_scale=None, tr: int = 0,
               interpret: bool = False, raw: bool = False):
    """3x3/s1/SAME int8 conv + fused epilogue via the implicit-GEMM kernel.

    x: (B, H, W, Ci) — s8 (pre-quantized) or float (quantized here with
       p["s_x"], which XLA fuses into the producer exactly as conv2d_int8's
       path does).
    p: the PTQ layout {"w_q" (3,3,Ci,Co) s8, "s_w" (Co,), "s_x" (), "b" (Co,)}.
    act: apply SiLU in the epilogue (Conv's activation).
    q_out_scale: if given, requantize the (post-SiLU) output to s8 with this
       scale inside the kernel (the __q_out__ fusion).
    Returns bf16 (default) or s8 (q_out_scale given).
    """
    from cerberusdet_tpu.nn.module import quantize_act

    xq = x if x.dtype == jnp.int8 else quantize_act(x, p["s_x"])
    b, h, w, ci = xq.shape
    w_q = p["w_q"].reshape(9 * ci, -1)
    co = w_q.shape[1]
    scale = (p["s_x"] * p["s_w"]).astype(jnp.float32).reshape(1, co)
    bias = p["b"].astype(jnp.float32).reshape(1, co)
    qs = jnp.asarray(
        q_out_scale if q_out_scale is not None else 1.0,
        jnp.float32).reshape(1, 1)
    if not tr:
        tr = _pick_tr(h, w, ci)
    return _conv3x3_s8_call(xq, w_q, scale, bias, qs, act=act,
                            q_out=q_out_scale is not None, tr=tr,
                            interpret=interpret, raw=raw)


def eligible(p, k, s, g, d) -> bool:
    """The shape class this kernel targets: 3x3/s1/SAME/no-dilation convs
    whose channels misalign the 128-lane MXU (PROFILE round-4 table)."""
    if not isinstance(p, dict) or "w_q" not in p:
        return False
    w = p["w_q"]
    return (k == 3 and s == 1 and g == 1 and d == 1
            and w.shape[0] == 3 and w.shape[1] == 3
            and (w.shape[2] % 128 or w.shape[3] % 128))
