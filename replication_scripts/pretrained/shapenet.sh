#!/bin/bash
python experiments/test_shapenet.py --checkpoint experiments/pretrained_weights/shapenet.pt
