#!/bin/bash
python methods/PA_ATF/PA_ATF_train.py --dataset cityscape --net vgg16 \
  --bs 1 --lr 2e-3 --lr_decay_step 6 --epochs 10 --lamda 0.1 --beta 0.1 --tpu "$@"
