#!/usr/bin/env bash
# Wrap single-task YOLOv8 state-dict checkpoints into cerber-format
# checkpoints (reference bash_scripts/convert_single_models.sh).
python -m cerberusdet_tpu.tools.convert_to_cerber \
    --weights pretrained/VOC_07_12_best_state_dict.pt \
    --cfg configs/models/yolov8x.yaml \
    --data configs/data/voc_obj365.yaml \
    --out pretrained/yolov8x_VOC.ckpt.npz

python -m cerberusdet_tpu.tools.convert_to_cerber \
    --weights pretrained/OBJ365_animals_best_state_dict.pt \
    --cfg configs/models/yolov8x.yaml \
    --data configs/data/voc_obj365.yaml \
    --out pretrained/yolov8x_obj365_animals.ckpt.npz
