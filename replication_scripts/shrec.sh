#!/bin/bash
for i in $(seq 1 10)
do
    rm -rf experiments/data/SHREC/processed
    python experiments/train_shrec.py
done
