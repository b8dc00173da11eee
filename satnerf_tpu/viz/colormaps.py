"""Colormap + image-scaling helpers (ref: framework/util/other.py:14-65)."""

from __future__ import annotations

import numpy as np


def apply_colormap(img: np.ndarray, cmap: str = "bone") -> np.ndarray:
    """min-max normalise a (H, W) map and apply a colormap -> (H, W, 3) f32
    in [0, 1]. Uses cv2's BONE/JET like the reference visualizers."""
    import cv2

    img = np.asarray(img, dtype=np.float64)
    finite = np.isfinite(img)
    lo = img[finite].min() if finite.any() else 0.0
    hi = img[finite].max() if finite.any() else 1.0
    norm = (img - lo) / max(hi - lo, 1e-12)
    norm = np.nan_to_num(norm, nan=0.0)
    u8 = (np.clip(norm, 0, 1) * 255).astype(np.uint8)
    table = {"bone": cv2.COLORMAP_BONE, "jet": cv2.COLORMAP_JET,
             "viridis": cv2.COLORMAP_VIRIDIS}
    bgr = cv2.applyColorMap(u8, table.get(cmap, cv2.COLORMAP_BONE))
    return bgr[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB


def scale_for_tensorboard(img_chw: np.ndarray, size: int = 400) -> np.ndarray:
    """Downscale a (C, H, W) image so max(H, W) <= size
    (ref: other.py scale_image_for_tensorboard)."""
    import cv2

    c, h, w = img_chw.shape
    m = max(h, w)
    if m <= size:
        return img_chw
    f = size / m
    was_uint8 = img_chw.dtype == np.uint8
    hwc = np.moveaxis(img_chw, 0, -1)
    scaled = cv2.resize(
        hwc.astype(np.float32), (int(w * f), int(h * f)),
        interpolation=cv2.INTER_AREA,
    )
    if scaled.ndim == 2:
        scaled = scaled[..., None]
    out = np.moveaxis(scaled, -1, 0)
    if was_uint8:
        # keep uint8 semantics: tensorboardX multiplies non-uint8 by 255
        out = np.clip(out, 0, 255).astype(np.uint8)
    return out
