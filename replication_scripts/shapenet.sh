#!/bin/bash
python experiments/train_shapenet.py --logdir experiments/runs_shapenet_replication
LATEST=$(ls -td experiments/runs_shapenet_replication/runs/shapenet/*/ | head -1)
python experiments/test_shapenet.py --checkpoint "${LATEST}checkpoints"
