"""Transient (per-image) embedding tables.

ref: baseline/pipelines/satnerf.py models dict {"t": nn.Embedding(vocab, tau)}
— a plain parameter table + gather on TPU. Standard-normal init matches
torch.nn.Embedding's default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_embedding(key: jax.Array, vocab: int, dim: int) -> jax.Array:
    return jax.random.normal(key, (vocab, dim), dtype=jnp.float32)


def embedding_lookup(table: jax.Array, ids) -> jax.Array:
    """ids (N,) int32 -> (N, dim)."""
    return jnp.take(table, ids, axis=0)
