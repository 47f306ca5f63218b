"""Per-class reference val of a reference .pt ckpt, optionally with BN in
batch-stats mode (train()), to discriminate weights-vs-running-stats for
the blue-class failure. Usage:
  python valprobe.py CKPT DATA_YAML [--batch-stats]
"""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
from cerberusdet_tpu.tools.ab_recipe import _install_ref_shims  # noqa: E402

_install_ref_shims()

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
import yaml  # noqa: E402

ckpt_path, data_yaml = sys.argv[1], sys.argv[2]
batch_stats = "--batch-stats" in sys.argv

ckpt = torch.load(ckpt_path, map_location="cpu")
model = ckpt.get("ema") or ckpt["model"]
model = model.float().eval()
if batch_stats:
    def _bn_train(mdl):
        n = 0
        for m in mdl.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.training = True
                n += 1
        return n

    # val.run() calls model.eval() internally (val.py:214) — wrap eval so
    # BN layers are flipped back to batch-stats mode afterwards.
    _orig_eval = model.eval

    def _eval_keep_bn(*a, **k):
        out = _orig_eval(*a, **k)
        n = _bn_train(model)
        print(f"BN batch-stats mode re-applied on {n} layers")
        return out

    model.eval = _eval_keep_bn
    _bn_train(model)

dd = yaml.safe_load(open(data_yaml))
tasks = dd["task_ids"] if isinstance(dd["task_ids"], list) else [dd["task_ids"]]
vals = dd["val"] if isinstance(dd["val"], list) else [dd["val"]]
names = dd["names"] if isinstance(dd["names"][0], list) else [dd["names"]]
nc = dd["nc"] if isinstance(dd["nc"], list) else [dd["nc"]]
data_dict = {"task_ids": tasks, "val": vals, "names": names, "nc": nc}

model.names = dict(zip(tasks, names))

from cerberusdet import val as ref_val  # noqa: E402
from cerberusdet.data.dataloaders import create_dataloader  # noqa: E402

gs = max(int(model.stride.max()), 32)
for ti, task in enumerate(tasks):
    loader, _ = create_dataloader(
        vals[ti], 192, 8, gs, False, pad=0.5, rect=True, workers=0,
        task_ind=ti, classnames=names[ti])
    results, maps, _ = ref_val.run(
        data_dict, batch_size=8, imgsz=192, model=model, dataloader=loader,
        save_dir=Path("/tmp/ab3b/valprobe_out"), verbose=True, plots=False,
        task_id=task, task_ind=ti, half=False)
    print(task, "P R mAP50 mAP:", [round(float(x), 4) for x in results[:4]])
