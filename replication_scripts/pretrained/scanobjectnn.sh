#!/bin/bash
python experiments/train_scanobjectnn.py --background --checkpoint experiments/pretrained_weights/scanobjectnn.pt
