"""PRNG discipline: one root key per run, folded per purpose/step/device.

The reference relies on torch global seeding (scripts/train.py:28,
pipeline/training_pipeline.py:29). Here every random draw is an explicit
jax.random key derived by folding structured integers into a root key, so
runs are reproducible regardless of device count or execution order.
"""

from __future__ import annotations

import hashlib

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


_PURPOSES = {}


def _purpose_id(purpose: str) -> int:
    if purpose not in _PURPOSES:
        digest = hashlib.sha256(purpose.encode()).digest()
        _PURPOSES[purpose] = int.from_bytes(digest[:4], "little") & 0x7FFFFFFF
    return _PURPOSES[purpose]


def for_purpose(key: jax.Array, purpose: str) -> jax.Array:
    """Derive a key for a named purpose ("init", "noise", "timesteps", ...)."""
    return jax.random.fold_in(key, _purpose_id(purpose))


def for_step(key: jax.Array, step) -> jax.Array:
    return jax.random.fold_in(key, step)
