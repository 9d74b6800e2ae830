#!/bin/bash
# IDF 5-stage pipeline (reference methods/IDF/IDF_train.sh):
# 1) CycleGAN style transfer (external) -> fake-source JPEGImages on disk
# 2) source-only detector on fake-source:
#    python methods/faster_rcnn/faster_rcnn_train.py --dataset cityscape --net vgg16 --epochs 7
# 3) pseudo labels on the target train split:
#    python tools/generate_pseudo_labels.py --dataset cityscape --part train_t \
#        --net vgg16 --load_name <stage2 ckpt> --threshold 0.7
# 4) offline mosaic augmentation:
#    python tools/mosaic_augment.py --root $TLLOD_DATA_DIR/cityscape/VOC2007 \
#        --split train_t --annotations Annotations_pseudo --num 2000
# 5) dual-branch adversarial training:
python methods/IDF/IDF_train.py --dataset cityscape --net vgg16 \
  --bs 1 --lr 2e-3 --lr_decay_step 6 --epochs 10 --gamma 5 --tpu "$@"
