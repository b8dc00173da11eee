"""Semantic metrics: per-pixel accuracy, mIoU, confusion matrix, and
uncertainty-at-transient.

ref: semantic/components/metrics.py:11-87 — accuracy counts any |gt-pred|>0
as an error (optionally zeroing a filtered class), mIoU uses the
Semantic-NeRF confusion-matrix formula, confusion matrices are
row-normalised ("true"), and uncertainty_at_transient averages composited
beta over GT-car rays.
"""

from __future__ import annotations

import numpy as np


def semantic_error(pred, gt, filter_idx: int | None = None) -> np.ndarray:
    pred = np.asarray(pred).reshape(-1)
    gt = np.asarray(gt).reshape(-1)
    err = np.clip(np.abs(gt.astype(np.int64) - pred.astype(np.int64)), 0, 1)
    if filter_idx is not None:
        err[gt == filter_idx] = 0
    return err


def semantic_accuracy(pred, gt, filter_idx: int | None = None) -> float:
    err = semantic_error(pred, gt, filter_idx)
    return float(1.0 - err.sum() / err.size)


def confusion_matrix(pred, gt, n_classes: int, normalize: str = "true") -> np.ndarray:
    pred = np.asarray(pred).reshape(-1).astype(np.int64)
    gt = np.asarray(gt).reshape(-1).astype(np.int64)
    cm = np.zeros((n_classes, n_classes), dtype=np.float64)
    np.add.at(cm, (gt, pred), 1.0)
    if normalize == "true":
        row = cm.sum(axis=1, keepdims=True)
        cm = np.divide(cm, row, out=np.zeros_like(cm), where=row > 0)
    return cm


def per_class_iou(confusion_matrix_values: np.ndarray) -> np.ndarray:
    """IoU per class from a confusion matrix (nan for absent classes)."""
    cm = np.asarray(confusion_matrix_values, dtype=np.float64)
    n = cm.shape[0]
    ious = np.zeros(n)
    with np.errstate(invalid="ignore", divide="ignore"):
        for c in range(n):
            denom = cm[c, :].sum() + cm[:, c].sum() - cm[c, c]
            ious[c] = cm[c, c] / denom if denom > 0 else np.nan
    return ious


def semantic_miou(confusion_matrix_values: np.ndarray) -> float:
    """Semantic-NeRF mIoU from a confusion matrix (ref: metrics.py:32-44)."""
    return float(np.nanmean(per_class_iou(confusion_matrix_values)))


def uncertainty_at_transient(results: dict, semantic_gt, car_idx: int) -> float:
    """Mean composited beta over rays whose GT label is 'car'
    (ref: metrics.py:76-87)."""
    beta = np.asarray(results["beta"])  # (N, S, 1)
    weights = np.asarray(results["weights"])  # (N, S)
    composited = (weights[..., None] * beta).sum(axis=-2)[:, 0]
    mask = np.asarray(semantic_gt).reshape(-1) == car_idx
    if mask.sum() == 0:
        return float("nan")
    return float(composited[mask].sum() / mask.sum())


def render_confusion_matrix_png(cm: np.ndarray, labels: list[str]):
    """Confusion-matrix figure as an (3, H, W) uint8 array for TB/saving
    (ref: metrics.py:58-73)."""
    import matplotlib

    matplotlib.use("Agg")
    import io

    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    im = ax.imshow(cm, cmap="Blues", vmin=0, vmax=1)
    ax.set_xticks(range(len(labels)), labels, rotation=45)
    ax.set_yticks(range(len(labels)), labels)
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    for i in range(len(labels)):
        for j in range(len(labels)):
            ax.text(j, i, f"{cm[i, j]:.2f}", ha="center", va="center",
                    color="black" if cm[i, j] < 0.6 else "white", fontsize=8)
    fig.colorbar(im, shrink=0.8)
    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight")
    plt.close(fig)
    buf.seek(0)
    from PIL import Image

    img = np.asarray(Image.open(buf).convert("RGB"))
    return np.moveaxis(img, -1, 0)
