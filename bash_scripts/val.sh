#!/usr/bin/env bash
# Standalone evaluation with the reference protocol (rect=True, pad=0.5).
python val.py \
    --weights runs/train/voc_obj365_v8x/weights/best.ckpt.npz \
    --data configs/data/voc_obj365.yaml \
    --img 640 --batch-size 32 --bf16 --verbose
