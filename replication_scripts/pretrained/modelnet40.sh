#!/bin/bash
python experiments/train_modelnet.py --checkpoint experiments/pretrained_weights/modelnet40.pt
