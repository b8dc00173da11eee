"""Image loading for training (ref: framework/util/img_utils.py:9-91).

* RGB GeoTIFF -> (h*w, 3) float32 in [0,1], optional bicubic downscale;
* CLS label GeoTIFF -> (h*w, 1) int32;
* save prediction images as GeoTIFF with RPC tags copied from a source image.
"""

from __future__ import annotations

import numpy as np

from satnerf_tpu.io.tiff import GeoProfile, read_geotiff, write_geotiff


def load_rgb_tensor(fp: str, downscale_factor: float = 1.0) -> np.ndarray:
    """GeoTIFF RGB -> flattened (h*w, 3) float32 normalised by /255.

    ``downscale_factor`` follows the reference convention: factor 2 HALVES
    the resolution (ref: img_utils.py:23-47 resizes to size/factor; the
    matching RPC rescale is 1/factor, camera_models.py:24-36).
    """
    arr, _ = read_geotiff(fp)
    img = np.moveaxis(arr[:3].astype(np.float32), 0, -1) / 255.0  # (H, W, 3)
    if downscale_factor != 1.0:
        img = _resize_bicubic(img, 1.0 / downscale_factor)
    return img.reshape(-1, 3)


def load_cls_tensor(fp: str) -> np.ndarray:
    """Single-channel CLS GeoTIFF -> (h*w, 1) int32 labels.

    ref: img_utils.py:50-62 (load_tensor_from_cls_geotiff).
    """
    arr, _ = read_geotiff(fp)
    return arr[0].astype(np.int32).reshape(-1, 1)


def save_output_image(
    data: np.ndarray,
    out_fp: str,
    source_fp: str | None = None,
    nodata: float | None = None,
):
    """Save (C, H, W) or (H, W) prediction as GeoTIFF, copying geo/RPC tags
    from a source image when given (ref: img_utils.py:65-91)."""
    if data.ndim == 2:
        data = data[None]
    profile = GeoProfile(
        width=data.shape[2], height=data.shape[1], count=data.shape[0],
        dtype=str(data.dtype), nodata=nodata,
    )
    if source_fp is not None:
        _, src = read_geotiff(source_fp)
        profile.transform = src.transform
        profile.epsg = src.epsg
        profile.rpc = src.rpc
    write_geotiff(out_fp, data, profile)


def _resize_bicubic(img: np.ndarray, factor: float) -> np.ndarray:
    """Bicubic resize via OpenCV (present in the image) with numpy fallback."""
    h, w = img.shape[:2]
    new_w, new_h = int(round(w * factor)), int(round(h * factor))
    try:
        import cv2

        return cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_CUBIC)
    except ImportError:  # pragma: no cover
        ys = np.clip((np.arange(new_h) / factor).astype(int), 0, h - 1)
        xs = np.clip((np.arange(new_w) / factor).astype(int), 0, w - 1)
        return img[ys][:, xs]
