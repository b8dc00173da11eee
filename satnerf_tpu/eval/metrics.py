"""Image quality metrics: MSE / PSNR / SSIM.

ref: eval/utils/metrics.py:8-87. SSIM uses the standard Wang et al. formula
with a gaussian window (default size 3, sigma 1.5 — the window the reference's
kornia call uses) and same-padding; golden-tested against the reference's
torch SSIM implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse(pred, gt, valid_mask=None):
    err = (pred - gt) ** 2
    if valid_mask is not None:
        return jnp.sum(err * valid_mask) / jnp.maximum(jnp.sum(valid_mask), 1)
    return jnp.mean(err)


def psnr(pred, gt, valid_mask=None):
    return -10.0 * jnp.log10(mse(pred, gt, valid_mask))


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2)
    )
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(pred, gt, window_size: int = 3, sigma: float = 1.5):
    """SSIM over (H, W, C) or (C, H, W)-agnostic images in [0, 1].

    Accepts (H, W, C) images; returns the mean SSIM index.
    """
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    if pred.ndim == 2:
        pred = pred[..., None]
        gt = gt[..., None]

    win = jnp.asarray(_gaussian_window(window_size, sigma))
    kernel = win[None, None]  # (1, 1, k, k) depthwise

    def filt(img):
        # (H, W, C) -> depthwise conv, zero 'same' padding. The conv MUST
        # run at full f32 precision: on TPU the default conv precision is
        # bfloat16, whose error in filt(x*x) - mu*mu exceeds c2 in
        # low-variance windows and pushes the SSIM index past 1.
        x = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.moveaxis(y[:, 0], 0, -1)

    mu1, mu2 = filt(pred), filt(gt)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sig1 = filt(pred * pred) - mu1_sq
    sig2 = filt(gt * gt) - mu2_sq
    sig12 = filt(pred * gt) - mu12

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * sig12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sig1 + sig2 + c2)
    )
    return jnp.mean(ssim_map)
