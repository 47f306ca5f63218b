"""Cross-framework mAP check (BASELINE mAP-parity proxy).

Runs the REFERENCE's own validation loop (cerberusdet/val.py:133-433, torch,
CPU) on weights EXPORTED from this framework, over the same dataset, and
compares its per-task (P, R, mAP50, mAP) against our val.py. The released
voc_obj365 weights are unavailable in this environment (no file, no egress),
so this is the strongest executable form of the mAP-parity gate: identical
weights + identical data through both frameworks' complete eval stacks
(their dataloader/letterbox/forward/NMS/matching vs ours).

Usage:
    python -m cerberusdet_tpu.tools.crosscheck_map \
        --weights runs/.../best.ckpt.npz --data data.yaml [--imgsz 128]

Requires /root/reference and the tests/ref_torch stub loader (dev tool).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent


def our_val(weights: str, data: str, imgsz: int, batch: int, tmp: str):
    import val as val_cli

    results = val_cli.main([
        "--weights", weights, "--data", data, "--imgsz", str(imgsz),
        "--batch-size", str(batch), "--project", tmp, "--name", "ours",
    ])
    return {t: tuple(float(x) for x in out["results"][:4])
            for t, out in results.items()}


def reference_val(weights: str, data: str, imgsz: int, batch: int, tmp: str):
    """Build the reference model from our cfg, load our exported state dict
    strict, and drive the reference val.run per task (its training-mode
    entry returns the metrics tuple)."""
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))
    from ref_torch import load_reference_cerberusdet

    Ref = load_reference_cerberusdet()
    if Ref is None:
        raise SystemExit("reference torch model not importable")
    import torch
    import yaml

    from cerberusdet_tpu.manager.checkpoint import load_checkpoint
    from cerberusdet_tpu.manager.pt_export import export_state_dict
    from cerberusdet_tpu.manager.run_manager import parse_data_config
    from cerberusdet_tpu.models.cerberus import CerberusModel

    ckpt = load_checkpoint(weights)
    meta = ckpt["meta"]
    model = CerberusModel(meta["cfg"], meta["task_ids"], meta["nc"])
    params = ckpt["ema"] if ckpt.get("ema") else ckpt["params"]
    sd = export_state_dict(model, params)

    torch.manual_seed(0)
    ref = Ref(task_ids=list(meta["task_ids"]), nc=list(meta["nc"]),
              cfg=meta["cfg"], verbose=False).float()
    cerber = (yaml.safe_load(open(meta["cfg"]))["cerber"]
              if isinstance(meta["cfg"], str) else meta["cfg"].get("cerber"))
    if cerber:
        ref.sequential_split(cerber, torch.device("cpu"))
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert not missing and not unexpected, (missing[:5], unexpected[:5])
    ref = ref.float().eval()

    data_dict = parse_data_config(data)
    ref.names = dict(zip(data_dict["task_ids"], data_dict["names"]))

    from cerberusdet import val as ref_val
    from cerberusdet.data.dataloaders import create_dataloader as ref_loader

    gs = max(int(ref.stride.max()), 32)
    out = {}
    for ti, task in enumerate(data_dict["task_ids"]):
        loader, _ = ref_loader(
            data_dict["val"][ti], imgsz, batch, gs, False, pad=0.5, rect=True,
            workers=0, task_ind=ti, classnames=data_dict["names"][ti])
        results, maps, _speed = ref_val.run(
            data_dict, batch_size=batch, imgsz=imgsz, model=ref,
            dataloader=loader, save_dir=Path(tmp), verbose=False, plots=False,
            task_id=task, task_ind=ti,
        )
        out[task] = tuple(float(x) for x in results[:4])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True, help="our .ckpt.npz")
    ap.add_argument("--data", required=True)
    ap.add_argument("--imgsz", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tol", type=float, default=0.02,
                    help="max |mAP50 delta| to call parity")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="crosscheck_")
    ours = our_val(args.weights, args.data, args.imgsz, args.batch, tmp)
    theirs = reference_val(args.weights, args.data, args.imgsz, args.batch, tmp)

    report = {}
    ok = True
    for task in ours:
        o, r = ours[task], theirs[task]
        d50 = abs(o[2] - r[2])
        report[task] = {"ours_P_R_mAP50_mAP": [round(x, 4) for x in o],
                        "reference_P_R_mAP50_mAP": [round(x, 4) for x in r],
                        "mAP50_delta": round(d50, 4)}
        ok &= d50 <= args.tol
    report["parity"] = bool(ok)
    print(json.dumps(report, indent=1))
    out = Path(args.weights).parent / "crosscheck_report.json"
    out.write_text(json.dumps(report, indent=1))
    print(f"report -> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
