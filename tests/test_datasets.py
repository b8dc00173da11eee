"""Dataset-layer tests on a generated synthetic scene: manifest loading, ray
construction + cache, normalization flow, depth supervision data, semantic
labels, and the epoch sampler."""

import os

import numpy as np
import pytest

from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
from satnerf_tpu.datasets import DepthDataset, SatNeRFDataset, SemanticDataset
from satnerf_tpu.datasets.synthetic import generate_scene
from satnerf_tpu.train.data import EpochSampler


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    dp = tmp_path_factory.mktemp("datasets") / "SYN_TEST"
    generate_scene(str(dp), n_train=3, n_test=1, img_size=48, n_tie_points=120)
    return dp


@pytest.fixture()
def cfg(scene_dir, tmp_path):
    run = RunConfig(
        dataset_name="SYN_TEST",
        datasets_dp=str(scene_dir.parent),
        cache_dp=str(tmp_path / "cache"),
        workspace_dp=str(tmp_path / "train"),
    )
    return MainConfig(run, RSSemanticConfig())


def _load_rgb_pair(cfg):
    train = SemanticDataset(cfg, "rgb", "train")
    test = SemanticDataset(cfg, "rgb", "test")
    train.load()
    test.load()
    combined = np.concatenate(
        [train.combined["rays"], test.combined["rays"]], axis=0
    )
    for ds in (train, test):
        ds.initialize_normalization(combined)
        ds.save_to_cache()
        ds.normalize()
    return train, test


class TestSyntheticScene:
    def test_generated_layout(self, scene_dir):
        for rel in (
            "root.json", "images", "metas", "pts3d.npy",
            "SYN_001_DSM.tif", "SYN_001_DSM.txt", "SYN_001_CLS.tif",
            "semantic_own", "semantic_own_corrupted", "semantic_own_no_cars",
        ):
            assert (scene_dir / rel).exists(), rel

    def test_rpc_consistency(self, scene_dir):
        """Localizing then projecting through the stored RPC round-trips."""
        from satnerf_tpu.geo.rpc import RPCModel
        from satnerf_tpu.io.json_io import read_json

        meta = read_json(str(scene_dir / "metas" / "SYN_001_000_RGB.json"))
        rpc = RPCModel.from_dict(meta["rpc"])
        cols = np.linspace(1, 46, 12)
        rows = np.linspace(1, 46, 12)
        alts = np.full(12, 10.0)
        lon, lat = rpc.localization(cols, rows, alts)
        c2, r2 = rpc.projection(lon, lat, alts)
        np.testing.assert_allclose(c2, cols, atol=1e-6)
        np.testing.assert_allclose(r2, rows, atol=1e-6)


class TestRgbDataset:
    def test_load_and_normalize(self, cfg):
        train, test = _load_rgb_pair(cfg)
        n = 48 * 48
        assert train.combined["rays"].shape == (3 * n, 8)
        assert train.combined["rgbs"].shape == (3 * n, 3)
        assert train.combined["extras"].shape == (3 * n, 4)
        assert train.combined["semantic"].shape == (3 * n, 1)
        # normalized scene bounded by 1
        o = train.combined["rays"][:, :3]
        assert np.abs(o).max() <= 1.01
        # test split = 1 train image + test images (ref: datasets.py:60-64)
        assert len(test.data) == 2
        assert test.image_item(0)["split"] == "train"
        assert test.image_item(1)["split"] == "test"

    def test_cache_roundtrip(self, cfg):
        train, _ = _load_rgb_pair(cfg)
        train2 = SemanticDataset(cfg, "rgb", "train")
        assert train2.has_already_been_cached()
        train2.load()  # loads (unnormalised) rays from cache
        train2.initialize_normalization()  # from cached json
        train2.normalize()
        np.testing.assert_allclose(
            train2.combined["rays"], train.combined["rays"], atol=1e-6
        )

    def test_backprojection_recovers_altitude(self, cfg):
        """Ray + true depth back-projects to sensible lat/lon/alt."""
        train, _ = _load_rgb_pair(cfg)
        item = train.data[0]
        rays = item["rays"][:64]
        # depth 0 = origin = max_alt plane
        lats, lons, alts = train.get_latlonalt_from_nerf_prediction(
            rays, np.zeros(64)
        )
        np.testing.assert_allclose(alts, item["alt_max"], atol=0.5)
        # full far depth = min_alt plane
        far = rays[:, 7]
        lats, lons, alts = train.get_latlonalt_from_nerf_prediction(rays, far)
        np.testing.assert_allclose(alts, item["alt_min"], atol=0.5)


class TestDepthDataset:
    def test_depth_targets_match_geometry(self, cfg):
        train, _ = _load_rgb_pair(cfg)
        depth = DepthDataset(cfg, "depth", "train")
        depth.initialize_normalization()  # from cache written by rgb load
        depth.load()
        d = depth.combined
        assert d["rays"].shape[1] == 8
        assert (d["weights"] > 0).all() and (d["weights"] <= 1).all()
        # depths are within the normalised near/far span
        far = d["rays"][:, 7]
        assert (d["depths"][:, 0] >= -1e-3).all()
        assert (d["depths"][:, 0] <= far + 0.1).all()


class TestSemanticVariants:
    def test_corrupted_and_no_cars(self, cfg):
        cfg.pipeline = RSSemanticConfig(semantic_dataset_type="own_corrupted")
        train = SemanticDataset(cfg, "rgb", "train")
        train.load()
        c = train.combined
        assert "semantic_non_corrupted" in c
        diff = (c["semantic"] != c["semantic_non_corrupted"]).mean()
        assert 0.01 < diff < 0.25  # ~8% corruption
        assert train.car_cls_idx == 4
        assert train.semantic_n_classes == 5

    def test_sparsity_mask(self, cfg):
        cfg.pipeline = RSSemanticConfig(sparsity_n_images=1)
        train = SemanticDataset(cfg, "rgb", "train")
        train.load()
        m = train.combined["semantic_sparsity_mask"]
        n = 48 * 48
        assert m[:n].all()  # first image keeps labels
        assert not m[n:].any()


class TestEpochSampler:
    def test_epoch_without_replacement(self):
        s = EpochSampler(100, 10, seed=0)
        seen = np.concatenate([s.next_batch() for _ in range(10)])
        assert sorted(seen.tolist()) == list(range(100))
        assert s.epoch == 0
        s.next_batch()
        assert s.epoch == 1

    def test_subsample(self):
        s = EpochSampler(1000, 10, seed=0, subsample=0.1)
        assert s.epoch_size == 100
        assert s.steps_per_epoch == 10
        e0 = np.concatenate([s.next_batch() for _ in range(10)])
        assert np.unique(e0).size == 100

    def test_drop_ragged_tail(self):
        s = EpochSampler(25, 10, seed=0)
        batches = [s.next_batch() for _ in range(4)]
        assert all(b.shape == (10,) for b in batches)

    def test_subsample_without_shuffle_is_fresh_each_epoch(self):
        """shuffle=False + subsample must still draw a fresh random subset
        per epoch (a fixed arange prefix would never train 90% of rays)."""
        s = EpochSampler(1000, 10, seed=0, shuffle=False, subsample=0.1)
        e0 = np.concatenate([s.next_batch() for _ in range(10)])
        e1 = np.concatenate([s.next_batch() for _ in range(10)])
        assert np.unique(e0).size == 100 and np.unique(e1).size == 100
        assert not np.array_equal(np.sort(e0), np.sort(e1))
        # in-epoch order stays sequential (the shuffle=False contract)
        assert np.all(np.diff(e0) > 0) and np.all(np.diff(e1) > 0)


class TestCorruptionGenerator:
    def test_corrupt_labels_rates(self):
        """Corruption is substantial but not degenerate, and deterministic."""
        from satnerf_tpu.data_prep.prepare_annotations import (
            LABELS,
            corrupt_labels,
        )

        mask = np.zeros((128, 128), np.uint8)
        mask[20:60, 20:60] = LABELS["buildings"]
        mask[70:100, 30:80] = LABELS["vegetation"]
        mask[90:110, 90:120] = LABELS["water"]
        out = corrupt_labels(mask, seed=1)
        frac = (out != mask).mean()
        assert 0.02 < frac < 0.6, frac
        # deterministic per seed
        np.testing.assert_array_equal(out, corrupt_labels(mask, seed=1))
        assert (out != corrupt_labels(mask, seed=2)).any()
