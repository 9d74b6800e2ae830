#!/bin/bash
# Canonical DAF recipe (reference methods/DAF/DAF_train.sh):
# bs 1, lr 2e-3, decay x0.1 @ epoch 6, 10 epochs, lambda 0.1
python methods/DAF/DAF_train.py --dataset cityscape --net vgg16 \
  --bs 1 --lr 2e-3 --lr_decay_step 6 --epochs 10 --lamda 0.1 --tpu "$@"
