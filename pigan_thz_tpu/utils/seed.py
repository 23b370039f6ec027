"""Determinism helpers (reference: core/utils/set_seed.py:8-34).

In JAX, reproducibility is structural — explicit PRNG keys thread through
every stochastic op, so there is no global torch/cuDNN state to pin.  This
helper seeds the host-side libraries that remain (python random, numpy for
host preprocessing) and returns the root JAX key.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def set_seed(seed: int = 42) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)
