#!/usr/bin/env bash
# 3-task CerberusDet-v8x training (VOC + animals + tableware) on TPU.
python train.py \
    --data configs/data/voc_obj365_animals_tableware.yaml \
    --weights pretrained/yolov8x_state_dict.pt \
    --hyp configs/hyps/hyp.cerber-voc_obj365_subsets.yaml \
    --cfg configs/models/yolov8x_3task.yaml \
    --img 640 \
    --batch-size "32,32,32" \
    --epochs 100 \
    --name voc_obj365_animals_tableware_v8x \
    --mesh --bf16
