"""Deterministic seeding (reference pl.seed_everything, main.py:20)."""

import os
import random

import numpy as np


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
