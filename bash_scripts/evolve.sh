#!/usr/bin/env bash
# Hyperparameter evolution (reference bash_scripts/evolve.sh).
# --evolver optuna dispatches to the Ray Tune adapter; yolov5 runs the
# in-process genetic loop.
python train.py \
    --data configs/data/voc_obj365.yaml \
    --weights pretrained/yolov8x_state_dict.pt \
    --hyp configs/hyps/hyp.cerber-voc_obj365.yaml \
    --cfg configs/models/yolov8x_2task.yaml \
    --img 640 \
    --batch-size 32 \
    --epochs 50 \
    --evolve 50 --evolve-per-task --evolver optuna \
    --name evolve_voc_obj365_v8x \
    --params-to-evolve 'lr0,lrf,momentum,weight_decay,warmup_epochs,warmup_momentum,warmup_bias_lr,box,cls,dfl'
