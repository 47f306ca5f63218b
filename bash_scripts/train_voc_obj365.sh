#!/usr/bin/env bash
# 2-task CerberusDet-v8x training: VOC + FULL Objects365 (365 classes).
# Reference counterpart launches 8-GPU DDP via torch.distributed.launch;
# here --mesh shards the batch over every local TPU chip in ONE process
# (multi-host pods: run one process per host, jax.distributed handles the
# rest — see tests/test_multihost.py).
python train.py \
    --img 640 --batch-size 40 \
    --data configs/data/voc_obj365_full.yaml \
    --weights pretrained/yolov8x_state_dict.pt \
    --hyp configs/hyps/hyp.cerber-voc_obj365.yaml \
    --cfg configs/models/yolov8x_2task.yaml \
    --epochs 100 \
    --name voc_obj365_full_v8x \
    --mesh --bf16
