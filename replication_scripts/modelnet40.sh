#!/bin/bash
python experiments/train_modelnet.py
