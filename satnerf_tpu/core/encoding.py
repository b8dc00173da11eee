"""Positional (Fourier-feature) encoding.

ref: baseline/models/commons.py:41-74 (``Mapping``): x -> concat over
frequencies f_k of [sin(f_k x), cos(f_k x)] with NO identity term; logscale
frequencies f_k = 2^k for k in 0..N-1 by default. Output ordering is
frequency-major, [sin, cos] inner, each block of width in_channels — matching
the reference module so weights are transferable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def frequency_bands(n_freqs: int, logscale: bool = True) -> np.ndarray:
    if logscale:
        return 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
    return np.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs)


def positional_encoding(x, n_freqs: int, logscale: bool = True):
    """Encode (..., C) -> (..., 2*n_freqs*C).

    Computed as one broadcasted multiply + sin/cos over a (..., F, C) tensor —
    a single fused VPU pass under XLA instead of the reference's per-frequency
    Python loop.
    """
    if n_freqs == 0:
        return x[..., :0]
    freqs = jnp.asarray(frequency_bands(n_freqs, logscale), dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]  # (..., F, C)
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)  # (..., F, 2, C)
    return enc.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])


def encoded_size(n_freqs: int, in_channels: int) -> int:
    return 2 * n_freqs * in_channels
