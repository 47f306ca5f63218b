#!/usr/bin/env bash
# Folder inference with annotated outputs (reference bash_scripts/detect.sh).
python detect.py \
    --img 640 --bf16 \
    --weights runs/train/voc_obj365_v8x/weights/best.ckpt.npz \
    --source data/images \
    --hide-conf
