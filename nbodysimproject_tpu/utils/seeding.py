"""Global seeding utilities.

Parity: reference ``minbody/utils.py:17`` (``set_global_seed``) seeds
``random``/``numpy``/``torch``.  In the TPU-native build randomness is
key-driven (``jax.random``); this helper remains for the host-side
generators and the ML trainers, and additionally returns a fresh JAX key
so call sites can thread explicit keys.
"""

from __future__ import annotations

import random

import numpy as np


def set_global_seed(seed: int = 42):
    """Seed every host-side RNG and return a ``jax.random`` key.

    Mirrors minbody/utils.py:17-28 (random, numpy, torch incl. CUDA
    determinism knobs) and adds the JAX PRNG key that the functional
    generators consume.
    """
    random.seed(seed)
    np.random.seed(seed)
    try:  # torch is optional at runtime; only the ML trainers need it.
        import torch

        torch.manual_seed(seed)
        if torch.cuda.is_available():  # pragma: no cover - no CUDA on TPU hosts
            torch.cuda.manual_seed_all(seed)
            torch.backends.cudnn.deterministic = True
            torch.backends.cudnn.benchmark = False
    except Exception:
        pass

    import jax

    return jax.random.PRNGKey(seed)
