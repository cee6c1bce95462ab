#!/bin/bash
python experiments/train_shapeseg.py
