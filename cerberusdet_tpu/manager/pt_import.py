"""Importer for reference PyTorch checkpoints -> our parameter tree.

Behavioral parity target: cerberusdet/utils/ckpt_utils.py:11-90
(dict_to_cerber: 'model.N.*' yolo keys -> cerber blocks; backbone collapses;
head keys duplicated to every task head) and convert_to_cerber.py.

Supported sources:
  * plain YOLOv8 state_dicts ('model.N.<sub>.weight', ultralytics layout),
  * unsplit CerberusDet state_dicts ('blocks.M.*' + 'heads.<task>.*'),
  * torch .pt files whose checkpoint dict has 'model'/'ema' entries holding a
    state_dict (module-pickled ckpts must be stripped to state_dicts first —
    we never unpickle code).

Weight layout conversion: torch OIHW -> our HWIO (transpose 2,3,1,0).
Branched clones receive the same source weights (the deepcopy-split
equivalence, models/cerberus.py docstring).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from cerberusdet_tpu.models.cerberus import CerberusModel

TORCH_BN = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a .pt and extract a flat {key: ndarray} state dict. Picks
    'ema' over 'model' like attempt_load (experimental.py:99-139)."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = None
    if isinstance(ckpt, dict):
        for key in ("ema", "model"):
            obj = ckpt.get(key)
            if obj is None:
                continue
            if hasattr(obj, "state_dict"):
                sd = obj.state_dict()
            elif isinstance(obj, dict):
                sd = obj
            if sd:
                break
        if sd is None and all(hasattr(v, "shape") for v in ckpt.values()):
            sd = ckpt  # bare state dict
    elif hasattr(ckpt, "state_dict"):
        sd = ckpt.state_dict()
    if sd is None:
        raise ValueError(f"cannot extract a state_dict from {path}")
    return {k: v.float().numpy() if hasattr(v, "float") else np.asarray(v, np.float32)
            for k, v in sd.items()}


def _conv_w(t: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(t, (2, 3, 1, 0))


def _map_block(my_params: Dict[str, Any], prefix: str,
               src: Dict[str, np.ndarray], out: Dict[str, Any]) -> int:
    """Recursively translate one block's params from torch keys rooted at
    `prefix`. Returns number of leaves filled."""
    n = 0
    keys = set(my_params.keys())
    if keys == {"w", "bn"}:  # Conv (conv.weight + bn.*)
        w = src.get(f"{prefix}.conv.weight")
        if w is not None:
            out["w"] = _conv_w(w)
            n += 1
        bn_out = dict(my_params["bn"])
        for mine, theirs in TORCH_BN.items():
            v = src.get(f"{prefix}.bn.{theirs}")
            if v is not None:
                bn_out[mine] = v
                n += 1
        out["bn"] = bn_out
        return n
    if keys == {"w", "b"}:  # PlainConv (bare Conv2d)
        w = src.get(f"{prefix}.weight")
        b = src.get(f"{prefix}.bias")
        if w is not None:
            out["w"] = _conv_w(w)
            n += 1
        if b is not None:
            out["b"] = b
            n += 1
        return n
    for k, sub in my_params.items():
        if not isinstance(sub, dict):
            continue
        if k.startswith("box"):
            tprefix = f"{prefix}.cv2.{k[3:]}"  # Detect box tower -> cv2.<level>
        elif k.startswith("cls"):
            tprefix = f"{prefix}.cv3.{k[3:]}"  # Detect cls tower -> cv3.<level>
        else:
            tprefix = f"{prefix}.{k}"
        child: Dict[str, Any] = dict(sub)
        n += _map_block(sub, tprefix, src, child)
        out[k] = child
    return n


def import_state_dict(model: CerberusModel, params: Dict[str, Any],
                      sd: Dict[str, np.ndarray],
                      verbose: bool = False) -> Dict[str, Any]:
    """Fill `params` (an initialized tree from model.init) with weights from a
    torch state dict. Handles 'model.N.*' (yolo) and 'blocks.N.*'/'heads.*'
    (unsplit cerber) key layouts; branched clones share the source block."""
    # normalize key prefixes: strip a leading 'model.' wrapper ('model.model.N')
    if any(k.startswith("model.model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    is_yolo = any(k.startswith("model.") for k in sd)
    is_cerber = any(k.startswith("blocks.") for k in sd)
    n_backbone = model.n_backbone
    out = dict(params)
    total = 0
    for uid, node_idx in model.block_nodes.items():
        if is_yolo:
            prefix = f"model.{node_idx}"
        elif is_cerber:
            if node_idx < n_backbone:
                prefix = f"blocks.0.model.{node_idx}"
            else:
                prefix = f"blocks.{node_idx - n_backbone + 1}"
        else:
            raise ValueError("unrecognized state dict layout")
        child = dict(out[uid])
        total += _map_block(params[uid], prefix, sd, child)
        out[uid] = child
    # heads: yolo ckpt has one Detect at model.<last> (duplicated to every
    # task); unsplit cerber state dicts store heads as blocks.{n_neck+1+ti}
    last_idx = len(model.parsed.nodes)
    n_neck = len(model.parsed.nodes) - n_backbone
    for ti, t in enumerate(model.task_ids):
        huid = model.head_uid(t)
        if is_yolo:
            prefix = f"model.{last_idx}"
        elif f"heads.{t}.cv2.0.0.conv.weight" in sd:
            prefix = f"heads.{t}"
        else:
            prefix = f"blocks.{n_neck + 1 + ti}"
        child = dict(out[huid])
        total += _map_block(params[huid], prefix, sd, child)
        out[huid] = child
    if verbose:
        print(f"imported {total} tensors from torch state dict")
    return out


def import_pt(model: CerberusModel, params: Dict[str, Any], path,
              verbose: bool = False) -> Dict[str, Any]:
    return import_state_dict(model, params, load_torch_state_dict(path), verbose)
