#!/bin/bash
for epoch in 4 5 6 7 8 9 10; do
  python methods/IDF/IDF_test.py --dataset cityscape --part test_t --net vgg16 \
    --load_name "./output/model_weight/vgg16/cityscape/idf_1_${epoch}_0" --tpu "$@"
done
