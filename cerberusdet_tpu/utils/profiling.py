"""Profiling / model-info utilities.

Behavioral parity target: cerberusdet/utils/torch_utils.py:103-166 (time_sync,
Profile ctx, module micro-bench) and :220-245 (model_info with FLOPs). FLOPs
come from XLA's compiled cost analysis instead of thop; deep traces use
jax.profiler (SURVEY.md §5.1).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def time_sync() -> float:
    """Wall clock after draining pending device work."""
    try:
        jax.effects_barrier()
    except Exception:
        pass
    return time.perf_counter()


class Profile:
    """Accumulating timing context (torch_utils.py:110-127):
    with Profile() as p: ... ; p.t holds cumulative seconds."""

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        self.start = time_sync()
        return self

    def __exit__(self, *exc):
        self.dt = time_sync() - self.start
        self.t += self.dt


def conv_count(compiled) -> int:
    """Number of convolution ops in a compiled executable's HLO — the
    DCE guard shared by every benchmark (bench.py methodology note)."""
    import re

    return len(re.findall(r"= [^\n=]*convolution", compiled.as_text()))


def flops_estimate(fn, *example_args) -> Optional[float]:
    """Total FLOPs of a jitted callable via XLA cost analysis."""
    try:
        compiled = jax.jit(fn).lower(*example_args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None


def model_info(model, params, imgsz: int = 640, verbose: bool = False) -> Dict[str, Any]:
    """Params / GFLOPs summary (torch_utils.py:220-245). FLOPs measured on the
    all-task eval forward at `imgsz`."""
    from cerberusdet_tpu.nn.module import Ctx

    n_params = model.num_params(params)

    def fwd(p, x):
        out = model(p, x, Ctx(train=False))
        return {t: pred for t, (pred, _f) in out.items()}

    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    flops = flops_estimate(fwd, params, x)
    info = {
        "params_m": n_params / 1e6,
        "gflops": (flops / 1e9) if flops else None,
        "imgsz": imgsz,
        "n_blocks": len(model.block_nodes) + len(model.task_ids),
    }
    if verbose:
        g = f"{info['gflops']:.1f}" if info["gflops"] else "n/a"
        print(f"CerberusDet-TPU: {info['n_blocks']} blocks, "
              f"{info['params_m']:.1f}M params, {g} GFLOPs @{imgsz}")
    return info


def profile_op(fn, *args, iters: int = 10) -> Dict[str, float]:
    """Micro-benchmark a jitted op (torch_utils.py:130-166 equivalent).
    Chains a data dependency between iterations for honest async timing."""
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    prev = out
    for _ in range(iters):
        leaves = jax.tree_util.tree_leaves(prev)
        eps = (leaves[0].ravel()[0] * 0).astype(args[0].dtype) if leaves else 0.0
        new_args = (args[0] + eps,) + tuple(args[1:])
        prev = jfn(*new_args)
    jax.block_until_ready(prev)
    dt = (time.perf_counter() - t0) / iters
    return {"ms": dt * 1e3}


def trace(log_dir, fn, *args, iters: int = 5):
    """Capture a jax.profiler device trace of `fn(*args)` repeated `iters`
    times (the TPU-era replacement for the reference's thop/profile passes,
    SURVEY.md §5.1). View with TensorBoard's profile plugin or xprof.

    Returns fn's last result. The first call compiles OUTSIDE the trace so
    the capture shows steady-state execution only."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(str(log_dir)):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return out

def dump_model_graph(model, params, save_dir, imgsz: int = 640) -> Optional[Dict[str, Any]]:
    """Write the compiled model graph + cost analysis as run artifacts — the
    TPU-native analog of the reference's TensorBoard graph logging
    (models_manager.py:412-418 add_graph of a torch.jit.trace): XLA's lowered
    StableHLO text (gzipped) and a cost-analysis JSON (FLOPs, bytes accessed,
    per-model params).

    Returns the cost dict (or None if lowering failed)."""
    import gzip
    import json
    from pathlib import Path

    from cerberusdet_tpu.nn.module import Ctx

    save_dir = Path(save_dir)

    def fwd(p, x):
        out = model(p, x, Ctx(train=False))
        return {t: pred for t, (pred, _f) in out.items()}

    try:
        x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
        lowered = jax.jit(fwd).lower(params, x)
        with gzip.open(save_dir / "model_graph.stablehlo.txt.gz", "wt") as f:
            f.write(lowered.as_text())
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        info = {
            "imgsz": imgsz,
            "params_m": model.num_params(params) / 1e6,
            "flops": float(cost.get("flops", 0.0)) if cost else None,
            "bytes_accessed": (float(cost.get("bytes accessed", 0.0))
                               if cost else None),
            "n_blocks": len(model.block_nodes) + len(model.task_ids),
        }
        (save_dir / "model_graph.cost.json").write_text(json.dumps(info, indent=1))
        return info
    except Exception:
        return None
