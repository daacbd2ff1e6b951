"""Seeding and small host utilities (utils/common_utils.py analog)."""
from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 42):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    print(f"Seed set to: {seed}")


def params2cpu(params: dict) -> dict:
    return {k: np.asarray(v) for k, v in params.items()}
