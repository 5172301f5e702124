"""Fourier positional encoding (reference: view_synthesis/nerf/position_embed.py).

Functional, fused-friendly re-implementation.  Output ordering matches the
reference exactly (position_embed.py:44-53): optional identity first, then for
each frequency band f_k the full-dimension sin(x f_k) followed by cos(x f_k).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frequency_bands(num_freq: int, log_sampling: bool, dtype=jnp.float32) -> jax.Array:
    """2^linspace(0, F-1, F) (log) or linspace(1, 2^(F-1), F) (linear) —
    reference position_embed.py:17-33."""
    if log_sampling:
        return 2.0 ** jnp.linspace(0.0, num_freq - 1, num_freq, dtype=dtype)
    return jnp.linspace(2.0**0.0, 2.0 ** (num_freq - 1), num_freq, dtype=dtype)


def encoding_dim(in_dim: int, num_freq: int, include_input: bool) -> int:
    return in_dim * ((1 if include_input else 0) + 2 * num_freq)


def positional_encoding(x: jax.Array, num_freq: int, include_input: bool = True,
                        log_sampling: bool = True) -> jax.Array:
    """Encode [..., D] -> [..., D*(include + 2F)].

    Layout per the reference: [x?, sin(x f0), cos(x f0), sin(x f1), ...].
    """
    bands = frequency_bands(num_freq, log_sampling, dtype=x.dtype)
    # [..., F, D]
    scaled = x[..., None, :] * bands[:, None]
    # [..., F, 2, D] with sin before cos, flattened freq-major
    enc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], 2 * num_freq * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
