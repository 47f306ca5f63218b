"""Export a framework checkpoint (.ckpt.npz) to the reference's torch
state-dict .pt format — the inverse of convert_to_cerber/pt_import, so
models trained here can be consumed by the reference codebase (or compared
in torch).

Usage:
    python -m cerberusdet_tpu.tools.export_to_pt \
        --weights runs/train/exp/weights/best.ckpt.npz \
        --out exported.pt [--use-ema]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True, help="source .ckpt.npz")
    p.add_argument("--out", required=True, help="output .pt (bare state dict)")
    p.add_argument("--use-ema", action="store_true",
                   help="export the EMA weights (attempt_load's preference)")
    args = p.parse_args(argv)

    import jax

    from cerberusdet_tpu.manager.checkpoint import load_checkpoint
    from cerberusdet_tpu.manager.pt_export import export_pt
    from cerberusdet_tpu.models.cerberus import CerberusModel

    ckpt = load_checkpoint(args.weights)
    meta = ckpt["meta"]
    model = CerberusModel(meta["cfg"], meta["task_ids"], meta["nc"])
    params = ckpt["ema"] if args.use_ema and ckpt.get("ema") else ckpt["params"]
    params = jax.tree_util.tree_map(lambda x: x, params)
    export_pt(model, params, args.out)
    print(f"exported {args.weights} -> {args.out} "
          f"(tasks={meta['task_ids']}, nc={meta['nc']})")


if __name__ == "__main__":
    main()
