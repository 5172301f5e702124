"""Image-quality metrics.

mse2psnr mirrors the reference (view_synthesis/utils/util.py:216-227);
SSIM goes beyond it (the CodeNeRF paper reports SSIM but the reference
implementation never computes it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse2psnr(mse: jax.Array) -> jax.Array:
    """PSNR from MSE with the reference's zero guard (util.py:224-227)."""
    mse = jnp.asarray(mse)
    safe = jnp.where(mse == 0, jnp.asarray(1e-5, mse.dtype), mse)
    return -10.0 * jnp.log10(safe)


def ssim(img0: jax.Array, img1: jax.Array, max_val: float = 1.0,
         filter_size: int = 11, filter_sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Mean structural similarity between two [H, W, C] images.

    Standard Wang et al. SSIM with a separable Gaussian window, valid-mode
    convolution (interior pixels only), averaged over space and channels.
    """
    img0 = jnp.asarray(img0, jnp.float32)
    img1 = jnp.asarray(img1, jnp.float32)
    # clamp the window to the image: valid-mode conv with a window larger
    # than the image would produce an empty output (mean -> NaN)
    filter_size = min(filter_size, img0.shape[0], img0.shape[1])
    if filter_size % 2 == 0:
        filter_size -= 1
    hw = filter_size // 2
    offsets = jnp.arange(-hw, hw + 1, dtype=jnp.float32)
    kernel = jnp.exp(-0.5 * (offsets / filter_sigma) ** 2)
    kernel = kernel / jnp.sum(kernel)

    def blur(x):  # separable Gaussian, valid mode, per channel
        # x: [H, W, C] -> treat channels as batch for conv
        xt = jnp.moveaxis(x, -1, 0)[:, None]          # [C, 1, H, W]
        kh = kernel.reshape(1, 1, -1, 1)
        kw = kernel.reshape(1, 1, 1, -1)
        y = jax.lax.conv_general_dilated(xt, kh, (1, 1), "VALID")
        y = jax.lax.conv_general_dilated(y, kw, (1, 1), "VALID")
        return jnp.moveaxis(y[:, 0], 0, -1)           # [H', W', C]

    mu0 = blur(img0)
    mu1 = blur(img1)
    # Guard the moment estimates: blur(x^2) - mu^2 can go slightly negative
    # from cancellation on near-flat regions, and the covariance must obey
    # Cauchy-Schwarz, otherwise per-pixel SSIM can exceed 1.
    sigma00 = jnp.maximum(blur(img0 ** 2) - mu0 ** 2, 0.0)
    sigma11 = jnp.maximum(blur(img1 ** 2) - mu1 ** 2, 0.0)
    sigma01 = blur(img0 * img1) - mu0 * mu1
    bound = jnp.sqrt(sigma00 * sigma11)
    sigma01 = jnp.clip(sigma01, -bound, bound)

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu0 * mu1 + c1) * (2 * sigma01 + c2)
    denom = (mu0 ** 2 + mu1 ** 2 + c1) * (sigma00 + sigma11 + c2)
    return jnp.mean(numer / denom)
