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
    names, cfg yaml dict, best_fitness(_per_task), n_updates, hyp, ...

    Paths not ending in .npz save as an orbax directory (same contents)."""
    if is_orbax_path(path):
        return save_checkpoint_orbax(path, params, meta, ema_params,
                                     opt_momentum, half)
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
    if is_orbax_path(path):
        return load_checkpoint_orbax(path)
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


# ------------------------------------------------------------------ orbax
# Optional directory-format backend (SURVEY.md §5.4 design note): orbax
# writes each array as its own OCDBT entry with async I/O and multi-host
# coordination — preferable to one monolithic .npz for pod-scale training
# or very large models. The logical contents and the load_checkpoint return
# contract are IDENTICAL to the .npz path, so everything downstream
# (attempt_load, resume, strip) works on either format. save/load dispatch
# on the path: *.ckpt.npz -> npz file, anything else -> orbax directory.

def is_orbax_path(path) -> bool:
    return not str(path).endswith(".npz")


def save_checkpoint_orbax(path, params, meta, ema_params=None,
                          opt_momentum=None, half: bool = True) -> None:
    import orbax.checkpoint as ocp

    def cast_tree(tree):
        def cast(x):
            x = np.asarray(x)
            return x.astype(np.float16) if (half and x.dtype == np.float32) else x
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                sub = cast_tree(v)
                if sub:  # prune parameterless nodes like the .npz flatten does
                    out[k] = sub
            else:
                out[k] = cast(v)
        return out

    payload = {"params": cast_tree(params)}
    if ema_params is not None:
        payload["ema"] = cast_tree(ema_params)
    if opt_momentum is not None:
        payload["opt"] = {k: np.asarray(v)
                          for k, v in flatten_tree(opt_momentum).items()}
    # meta rides in the payload (orbax finalizes the directory atomically;
    # sidecar files would race the rename)
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta, default=float).encode(), dtype=np.uint8).copy()
    path = Path(path).resolve()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    out = ocp.StandardCheckpointer().restore(path)

    def upcast(tree):
        return {k: upcast(v) if isinstance(v, dict)
                else (np.asarray(v).astype(np.float32)
                      if np.asarray(v).dtype == np.float16 else np.asarray(v))
                for k, v in tree.items()}

    meta = json.loads(bytes(np.asarray(out["meta_json"],
                                       np.uint8).tobytes()).decode())
    opt = out.get("opt")
    return {
        "params": upcast(out["params"]),
        "ema": upcast(out["ema"]) if out.get("ema") else None,
        "opt": unflatten_tree(dict(opt)) if opt else None,
        "meta": meta,
    }
