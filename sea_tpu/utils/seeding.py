"""Global seeding helper.

Mirror of reference main.py:14-21 (set_seed): one switch that seeds every
host-side RNG an ad-hoc script might touch. The package itself threads
explicit jax PRNG keys (the JAX-idiomatic design — keys derive from the
configs' SplitConfig.random_seed), so the drivers never need this; it
exists for parity with the reference's surface and for user scripts that
mix numpy/random/torch code with SEA-TPU.

Returns a jax.random.PRNGKey(seed) so callers can thread it onward:

    key = set_seed(42)
"""

from __future__ import annotations

import os
import random


def set_seed(seed: int):
    """Seed python `random`, numpy, PYTHONHASHSEED, torch (if importable,
    CPU+CUDA — reference main.py:16-21), and return jax.random.PRNGKey(seed).

    Note: unlike torch, JAX has no global RNG to seed — determinism comes
    from threading the returned key. XLA:TPU is deterministic by default,
    so there is no cudnn.deterministic equivalent to set.
    """
    random.seed(seed)
    import numpy as np
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    try:  # torch is optional: only the .pt-interop paths need it
        import torch
        torch.manual_seed(seed)
        if torch.cuda.is_available():  # pragma: no cover - no GPU in CI
            torch.cuda.manual_seed_all(seed)
    except ImportError:  # pragma: no cover
        pass
    import jax
    return jax.random.PRNGKey(seed)
