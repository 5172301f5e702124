"""Scalar metrics (reference: view_synthesis/utils/util.py:216-227)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse2psnr(mse: jax.Array) -> jax.Array:
    """PSNR from MSE with the reference's zero guard (util.py:224-227)."""
    mse = jnp.asarray(mse)
    safe = jnp.where(mse == 0, jnp.asarray(1e-5, mse.dtype), mse)
    return -10.0 * jnp.log10(safe)
