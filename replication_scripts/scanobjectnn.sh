#!/bin/bash
python experiments/train_scanobjectnn.py
python experiments/train_scanobjectnn.py --background
python experiments/train_scanobjectnn.py --background --augmentation PB_T25
python experiments/train_scanobjectnn.py --background --augmentation PB_T25_R
python experiments/train_scanobjectnn.py --background --augmentation PB_T50_R
python experiments/train_scanobjectnn.py --background --augmentation PB_T50_RS
