#!/bin/bash
python methods/US_DAF/US_DAF_train.py --dataset voc_clipart --net res101 \
  --bs 1 --lr 1e-3 --lr_decay_step 6 --epochs 10 --lamda 0.1 --tpu "$@"
