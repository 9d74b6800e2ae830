#!/bin/bash
# Stage 1: source-only teacher (methods/faster_rcnn), then PT-MAF with KD.
python methods/PT_MAF/PT_MAF_train.py --dataset cityscape --net vgg16 \
  --bs 1 --lr 2e-3 --lr_decay_step 6 --epochs 10 --lamda 0.1 \
  --tmp 3 --high 0.7 --low 0.1 \
  --teacher_ckpt ./output/model_weight/vgg16/cityscape/faster_rcnn_1_7_0 --tpu "$@"
