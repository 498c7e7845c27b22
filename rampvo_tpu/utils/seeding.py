"""Global seeding (ref: utils/seed_everything.py:5-12). JAX randomness is
explicit-key based; this seeds the host-side generators the data pipeline
uses and returns a root PRNG key for device-side draws."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 1234):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax

    return jax.random.PRNGKey(seed)
