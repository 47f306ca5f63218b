#!/usr/bin/env bash
# 2-task CerberusDet-v8x training (VOC + Objects365-animals) on TPU.
# Reference counterpart: bash_scripts/train_voc_obj365_animals.sh — DDP/CUDA
# flags are replaced by --mesh (data parallelism over every local TPU chip)
# and --bf16 (the TPU-native mixed precision; no GradScaler needed).
python train.py \
    --data configs/data/voc_obj365.yaml \
    --weights pretrained/yolov8x_state_dict.pt \
    --hyp configs/hyps/hyp.cerber-voc_obj365.yaml \
    --cfg configs/models/yolov8x_2task.yaml \
    --img 640 \
    --batch-size 32 \
    --epochs 100 \
    --name voc_obj365_v8x \
    --mesh --bf16
