#!/bin/bash
python experiments/train_shapeseg.py --checkpoint experiments/pretrained_weights/shapeseg.pt
