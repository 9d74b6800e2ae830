#!/bin/bash
python methods/faster_rcnn/faster_rcnn_test.py --dataset cityscape --part test_s --net vgg16 \
  --load_name "./output/model_weight/vgg16/cityscape/faster_rcnn_1_10_0" --tpu "$@"
