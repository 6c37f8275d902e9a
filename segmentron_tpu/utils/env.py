"""Environment info & seeding (reference: ``segmentron/utils/env.py``)."""

from __future__ import annotations

import platform
import random
import sys

import jax
import numpy as np

__all__ = ["seed_all_rng", "collect_env_info"]


def seed_all_rng(seed: int) -> jax.Array:
    """Seed python/numpy RNGs and return a jax PRNG key.

    Unlike torch there is no global device RNG to seed — all jax
    randomness flows from explicit keys, which is what makes the data
    pipeline and dropout reproducible per-step.
    """
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def collect_env_info() -> str:
    lines = [
        f"sys.platform: {sys.platform}",
        f"Python: {sys.version.replace(chr(10), ' ')}",
        f"numpy: {np.__version__}",
        f"jax: {jax.__version__}",
        f"jax backend: {jax.default_backend()}",
        f"devices: {[str(d) for d in jax.devices()]}",
        f"process_count: {jax.process_count()}",
        f"platform: {platform.platform()}",
    ]
    return "\n".join(lines)
