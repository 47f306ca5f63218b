#!/usr/bin/env bash
# End-to-end quickstart on synthetic data — no downloads needed. Runs the
# full surface: dataset -> multi-task training (genuinely learns: mAP50
# climbs well above 0.5) -> standalone val (rect protocol) -> folder
# inference (low demo threshold: 40 epochs on 32 images learns the task
# — mAP50 ~0.97/0.69 — but confidences stay modest) -> export to the
# reference's .pt format.
set -e
cd "$(dirname "$0")/.."  # repo root: configs/ paths are relative
OUT=${1:-/tmp/cerberus_quickstart}

python -m cerberusdet_tpu.tools.make_synthetic_data --out "$OUT/data"

# demo hyp: augmentation off, slightly hot LR (the capstone e2e test recipe)
python - "$OUT" <<'PY'
import sys, yaml
hyp = yaml.safe_load(open("configs/hyps/hyp.cerber-default.yaml"))
hyp.update(dict(mosaic=0.0, mixup=0.0, scale=0.0, translate=0.0, fliplr=0.0,
                hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, warmup_epochs=1.0, lr0=0.02))
yaml.safe_dump(hyp, open(f"{sys.argv[1]}/hyp.demo.yaml", "w"))
PY

python train.py \
    --data "$OUT/data/data.yaml" \
    --cfg configs/models/yolov8n_2task.yaml \
    --hyp "$OUT/hyp.demo.yaml" \
    --epochs 40 --batch-size 8,8 --imgsz 128 \
    --warmup-min-iters 20 \
    --project "$OUT/runs" --name quickstart

CKPT="$OUT/runs/quickstart/weights/best.ckpt.npz"
[ -f "$CKPT" ] || CKPT="$OUT/runs/quickstart/weights/last.ckpt.npz"

python val.py --weights "$CKPT" --data "$OUT/data/data.yaml" \
    --imgsz 128 --batch-size 8 --project "$OUT/runs/val" --name quickstart

python detect.py --weights "$CKPT" \
    --source "$OUT/data/shapes_a/images/val" --imgsz 128 \
    --conf-thres 0.05 --project "$OUT/runs/detect" --name quickstart

python -m cerberusdet_tpu.tools.export_to_pt \
    --weights "$CKPT" --out "$OUT/quickstart_reference_format.pt"

echo "quickstart complete: $OUT"
