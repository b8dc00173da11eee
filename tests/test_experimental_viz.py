"""Experimental-regularizer visualizers (DINO / neighbour-smoothing /
density-reg panels, ref: semantic/components/visualize.py:184-376): key
gating, output shapes, and the numpy PCA / patch-average helpers."""

import numpy as np

from satnerf_tpu.viz.experimental_viz import (
    DensityRegVisualization,
    DepthsRegVisualization,
    FeaturePCA,
    NeighbourmaskVisualization,
    TensorboardDinoSummaryVisualization,
    _center_crop_or_pad,
    _patch_average,
    minmax_scale,
    visualize_dino_features,
)

H = W = 28


def _rng():
    return np.random.default_rng(0)


def test_minmax_scale_columns():
    x = np.array([[0.0, 5.0], [2.0, 5.0], [4.0, 5.0]])
    s = minmax_scale(x)
    assert np.allclose(s[:, 0], [0.0, 0.5, 1.0])
    assert np.allclose(s[:, 1], 0.0)  # constant column maps to 0, no NaN


def test_feature_pca_projects_to_3():
    rng = _rng()
    # rank-3 structure + noise: PCA must recover a 3-dim projection
    latent = rng.normal(size=(200, 3))
    feats = latent @ rng.normal(size=(3, 16)) + 0.01 * rng.normal(size=(200, 16))
    proj = FeaturePCA().fit(feats).transform(feats)
    assert proj.shape == (200, 3)
    # projection retains nearly all variance of the rank-3 data
    total = np.var(feats - feats.mean(0), axis=0).sum()
    kept = np.var(proj, axis=0).sum()
    assert kept / total > 0.99


def test_visualize_dino_features_wide_and_rgb():
    rng = _rng()
    wide = rng.normal(size=(H * W, 16))
    img = visualize_dino_features(None, wide, H, W)  # auto-fits a PCA
    assert img.shape == (H, W, 3) and img.dtype == np.uint8
    rgb01 = rng.uniform(size=(H * W, 3))
    img2 = visualize_dino_features(None, rgb01, H, W)
    assert img2.max() > 1  # [0,1] input was scaled to [0,255]


def test_patch_average_matches_loop():
    rng = _rng()
    vals = rng.normal(size=(24, 4)).astype(np.float32)
    mapping = rng.integers(0, 5, size=24)
    out = _patch_average(vals, mapping)
    for pid in np.unique(mapping):
        m = mapping == pid
        assert np.allclose(out[m], vals[m].mean(axis=0), atol=1e-6)


def test_center_crop_and_pad():
    img = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    cropped = _center_crop_or_pad(img, 4, 4)
    assert cropped.shape == (4, 4, 3)
    assert np.array_equal(cropped, img[1:5, 2:6])
    padded = _center_crop_or_pad(img, 8, 10)
    assert padded.shape == (8, 10, 3)
    assert np.array_equal(padded[1:7, 1:9], img)
    assert padded[0].sum() == 0  # zero border


def _dino_sample_results():
    rng = _rng()
    gh, gw = 2, 2  # 28/14 patch grid at upscale 1
    sample = {
        "dino": rng.normal(size=(gh * gw, 16)).astype(np.float32),
        "dino_h": gh,
        "dino_w": gw,
        "dino_upscale": 1,
        "dino_mapping": np.repeat(np.arange(gh * gw), (H * W) // (gh * gw)),
    }
    results = {"dino": rng.normal(size=(H * W, 16)).astype(np.float32)}
    return sample, results


def test_dino_summary_panels():
    sample, results = _dino_sample_results()
    viz = TensorboardDinoSummaryVisualization(None, True, False)
    out = viz._visualize(object(), sample, results, W, H)
    assert out.shape[0] == 3  # gt / averaged / raw panels
    assert out.ndim == 4 and out.shape[1] == 3
    # gating: without the dino keys the visualizer is a no-op
    assert viz._visualize(object(), {}, {}, W, H) is None


def test_neighbour_mask_and_depths_reg():
    rng = _rng()
    mask = rng.uniform(size=H * W) < 0.25
    n_masked = int(mask.sum())
    results = {
        "neighbour_mask": mask,
        "neighbours": rng.uniform(1.0, 2.0, size=(n_masked, 5)).astype(
            np.float32
        ),
    }
    mviz = NeighbourmaskVisualization(None)
    img = mviz._visualize(None, {}, results, W, H)
    assert img.shape == (H, W)
    assert int(img.sum()) == n_masked

    dviz = DepthsRegVisualization(None)
    reg = dviz._visualize(None, {}, results, W, H)
    assert reg.shape == (H, W)
    assert (reg.reshape(-1)[~mask] == 0).all()
    d = results["neighbours"]
    expect = np.square(np.abs(d[:, 0] - d[:, 1:].mean(axis=-1)))
    assert np.allclose(reg.reshape(-1)[mask], expect, atol=1e-6)
    assert dviz._visualize(None, {}, {}, W, H) is None


def test_density_reg_masks_by_label():
    rng = _rng()
    ms = np.stack(
        [
            rng.uniform(size=H * W),
            rng.uniform(size=H * W),
            (rng.uniform(size=H * W) < 0.5).astype(np.float32),
        ],
        axis=-1,
    ).astype(np.float32)
    labels = rng.integers(0, 5, size=H * W)
    results = {"neighbour_mean_sigma": ms, "semantic_label": labels}
    viz = DensityRegVisualization(None, apply_to_labels=(0, 1))
    out = viz._visualize(None, {}, results, W, H)
    assert out.shape[0] == 2  # difference + mask panels
    assert viz._visualize(None, {}, {"semantic_label": labels}, W, H) is None
