#!/bin/bash
# Canonical MAF recipe (reference methods/MAF/MAF_train.sh)
python methods/MAF/MAF_train.py --dataset cityscape --net vgg16 \
  --bs 1 --lr 2e-3 --lr_decay_step 6 --epochs 10 --lamda 0.1 --alpha 1 --tpu "$@"
