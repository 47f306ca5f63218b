"""Checkpointing: explicit pytree state + JSON metadata in one .npz file.

Behavioral parity target: cerberusdet/utils/models_manager.py:262-320 (ckpt
contents: epoch, per-task best fitness, model, ema, optimizer updates) and
cerberusdet/utils/general.py:557-578 (strip_optimizer). Design divergence
(SURVEY.md §5.4): the reference pickles whole nn.Module objects; we save an
explicit flattened param pytree + metadata — no code objects, portable,
and loadable into a freshly built model.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

SEP = "/"


def flatten_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return tree


def save_checkpoint(
    path,
    params: Dict[str, Any],
    meta: Dict[str, Any],
    ema_params: Optional[Dict[str, Any]] = None,
    opt_momentum: Optional[Dict[str, Any]] = None,
    half: bool = True,
) -> None:
    """meta holds JSON-serializable training state: epoch, task_ids, nc,
    names, cfg yaml dict, best_fitness(_per_task), n_updates, hyp, ..."""
    arrays: Dict[str, np.ndarray] = {}

    def cast(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x)
        return x.astype(np.float16) if (half and x.dtype == np.float32) else x

    for k, v in flatten_tree(params).items():
        arrays[f"params{SEP}{k}"] = cast(v)
    if ema_params is not None:
        for k, v in flatten_tree(ema_params).items():
            arrays[f"ema{SEP}{k}"] = cast(v)
    if opt_momentum is not None:
        for k, v in flatten_tree(opt_momentum).items():
            arrays[f"opt{SEP}{k}"] = np.asarray(v)  # optimizer state stays fp32
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta, default=float).encode(), dtype=np.uint8
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_checkpoint(path) -> Dict[str, Any]:
    """Returns {'params', 'ema', 'opt', 'meta'} ('ema'/'opt' may be None).
    Float16 arrays are upcast back to float32."""
    data = np.load(path, allow_pickle=False)
    groups: Dict[str, Dict[str, np.ndarray]] = {"params": {}, "ema": {}, "opt": {}}
    meta: Dict[str, Any] = {}
    for key in data.files:
        if key == "__meta__":
            meta = json.loads(bytes(data[key]).decode())
            continue
        head, rest = key.split(SEP, 1)
        v = data[key]
        if v.dtype == np.float16:
            v = v.astype(np.float32)
        groups[head][rest] = v
    return {
        "params": unflatten_tree(groups["params"]) if groups["params"] else None,
        "ema": unflatten_tree(groups["ema"]) if groups["ema"] else None,
        "opt": unflatten_tree(groups["opt"]) if groups["opt"] else None,
        "meta": meta,
    }


def strip_checkpoint(path, out_path=None) -> None:
    """Finalize a training ckpt: promote EMA to params, drop optimizer state
    (general.py:557-578)."""
    ckpt = load_checkpoint(path)
    params = ckpt["ema"] if ckpt["ema"] is not None else ckpt["params"]
    meta = dict(ckpt["meta"])
    meta["stripped"] = True
    save_checkpoint(out_path or path, params, meta, ema_params=None, opt_momentum=None)


def intersect_trees(dst: Dict[str, Any], src: Dict[str, Any]) -> Tuple[Dict[str, Any], int, int]:
    """Copy src leaves into dst where path+shape match (ckpt_utils.py:5-8).
    Returns (merged, n_matched, n_total_dst)."""
    dst_flat = flatten_tree(dst)
    src_flat = flatten_tree(src)
    matched = 0
    out = dict(dst_flat)
    for k, v in dst_flat.items():
        s = src_flat.get(k)
        if s is not None and tuple(s.shape) == tuple(np.shape(v)):
            out[k] = s.astype(np.asarray(v).dtype)
            matched += 1
    return unflatten_tree(out), matched, len(dst_flat)
