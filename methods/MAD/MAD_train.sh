#!/bin/bash
# DGOD recipe: train on Cityscapes source views, test on Foggy (unseen).
python methods/MAD/MAD_train.py --dataset cityscape --net vgg16 \
  --bs 1 --lr 2e-3 --lr_decay_step 6 --epochs 10 --tpu "$@"
