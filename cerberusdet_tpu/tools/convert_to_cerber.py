"""Convert single-task YOLOv8 .pt weights into a framework checkpoint.

Behavioral parity target: convert_to_cerber.py:69-103 (wrap a plain yolov8
state_dict into a CerberusDet ckpt for 1..N tasks; head weights duplicated).
"""

from __future__ import annotations

import argparse

import jax


def convert(weights: str, cfg: str, task_ids, nc, out_path: str,
            names=None, verbose: bool = True) -> str:
    from cerberusdet_tpu.manager.checkpoint import save_checkpoint
    from cerberusdet_tpu.manager.pt_import import import_pt
    from cerberusdet_tpu.models.cerberus import CerberusModel

    model = CerberusModel(cfg, task_ids, nc)
    params = model.init(jax.random.PRNGKey(0))
    params = import_pt(model, params, weights, verbose=verbose)
    meta = {
        "epoch": -1,
        "task_ids": list(task_ids),
        "nc": list(nc),
        "names": [list(n) for n in (names or [[str(i) for i in range(c)] for c in nc])],
        "cfg": str(cfg),
        "converted_from": str(weights),
    }
    save_checkpoint(out_path, params, meta)
    if verbose:
        print(f"converted {weights} -> {out_path}")
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True, help="source yolov8 .pt")
    p.add_argument("--cfg", required=True, help="target model yaml (may include cerber)")
    p.add_argument("--data", required=True, help="data yaml (task_ids/nc/names)")
    p.add_argument("--out", required=True, help="output .ckpt.npz")
    opt = p.parse_args(argv)
    from cerberusdet_tpu.manager.run_manager import parse_data_config

    d = parse_data_config(opt.data)
    convert(opt.weights, opt.cfg, d["task_ids"], d["nc"], opt.out, d["names"])


if __name__ == "__main__":
    main()
