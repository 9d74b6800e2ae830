#!/bin/bash
# Checkpoint-sweep evaluation (reference methods/PA_ATF/PA_ATF_test.sh):
# evaluate every epoch's checkpoint on the target test split.
# Checkpoints are orbax directories named pa_atf_<session>_<epoch>_<step>.
SESSION=${SESSION:-1}
STEP=${STEP:-10000}
for epoch in 1 2 3 4 5 6 7 8 9 10 11 12 13 14
do
    echo "The epoch is: ${epoch}"
    python PA_ATF_test.py --dataset cityscape --net vgg16 --part test_t \
        --model_dir ./output/model_weight/vgg16/cityscape/pa_atf_${SESSION}_${epoch}_${STEP} \
        --tpu
done
