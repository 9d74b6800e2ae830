#!/bin/bash
# Checkpoint-sweep evaluation (reference methods/US_DAF/US_DAF_test.sh):
# evaluate every epoch's checkpoint on the target test split.
SESSION=${SESSION:-1}
STEP=${STEP:-10000}
DATASET=${DATASET:-VOC2clipart}
NET=${NET:-res101}
for epoch in 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15
do
    echo "the epoch is: ${epoch}"
    python US_DAF_test.py \
        --dataset ${DATASET} --part test_t --net ${NET} \
        --model_dir ./output/model_weight/${NET}/${DATASET}/us_daf_${SESSION}_${epoch}_${STEP} \
        --tpu
done
