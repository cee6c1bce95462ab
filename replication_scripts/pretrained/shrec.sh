#!/bin/bash
python experiments/train_shrec.py --checkpoint experiments/pretrained_weights/shrec.pt
