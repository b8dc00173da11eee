"""Coverage for the remaining corners: LZW TIFF reading, DSM study tools,
profiler trace capture, multihost batch-slice math, fine-field ckpt import."""

import os

import numpy as np
import pytest


class TestLzwTiff:
    def test_read_pil_lzw_compressed(self, tmp_path):
        """The in-house LZW decoder reads PIL/GDAL-style LZW TIFFs (the
        DFC2019 distribution uses LZW)."""
        from PIL import Image

        from satnerf_tpu.io.tiff import read_geotiff

        rng = np.random.default_rng(0)
        # structured image (runs compress) + noise (exercises code growth)
        img = np.zeros((64, 80, 3), np.uint8)
        img[:32] = 200
        img[:, :40, 1] = 90
        img += rng.integers(0, 8, img.shape).astype(np.uint8)
        fp = str(tmp_path / "lzw.tif")
        Image.fromarray(img).save(fp, compression="tiff_lzw")
        arr, prof = read_geotiff(fp)
        np.testing.assert_array_equal(np.moveaxis(arr, 0, -1), img)


class TestStudyTools:
    def test_tif2png_and_dsm2ply(self, tmp_path):
        from satnerf_tpu.eval.extract_pointcloud import read_ply
        from satnerf_tpu.eval.study import extract_image_from_tif, extract_pc_from_dsm
        from satnerf_tpu.io.tiff import GeoProfile, write_geotiff

        rng = np.random.default_rng(1)
        dsm = rng.uniform(0, 30, (1, 20, 20)).astype(np.float32)
        dsm[0, :3, :3] = np.nan
        fp = str(tmp_path / "dsm.tif")
        write_geotiff(
            fp, dsm,
            GeoProfile(20, 20, 1, "float32",
                       transform=(0.5, 0.5, 435000.0, 3354000.0), epsg=32617),
        )
        png = extract_image_from_tif(fp, str(tmp_path / "dsm.png"))
        assert os.path.isfile(png)

        ply = extract_pc_from_dsm(fp, str(tmp_path / "dsm.ply"))
        rec = read_ply(ply)
        assert rec.shape[0] == 400 - 9  # nan cells dropped
        assert 434999 < rec["x"].mean() < 435011


class TestTraceCapture:
    def test_capture_window(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SATNERF_TPU_PROFILE_DIR", str(tmp_path / "trace"))
        from satnerf_tpu.train.profiling import TraceCapture

        import jax
        import jax.numpy as jnp

        tc = TraceCapture(start_step=1, n_steps=2)
        for step in range(5):
            tc.step(step)
            jnp.sum(jnp.ones(8)).block_until_ready()
        tc.close()
        assert tc._done
        # a trace directory was produced
        assert any(os.scandir(str(tmp_path / "trace")))


class TestMultihost:
    def test_local_batch_slice_single_host(self):
        from satnerf_tpu.parallel.multihost import local_batch_slice

        import jax

        # on one host local == global share
        got = local_batch_slice(1024)
        per_dev = 1024 // jax.device_count()
        assert got == per_dev * jax.local_device_count()


class TestFineFieldImport:
    def test_import_with_fine_and_separate_semantic_embedding(self, tmp_path):
        if not os.path.isdir("/root/reference"):
            pytest.skip("reference tree not available")
        import torch

        from satnerf_tpu.models.field import FieldConfig
        from satnerf_tpu.models.import_torch import params_from_lightning_ckpt

        import sys

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from types import SimpleNamespace

        from baseline.models.satnerf import SatNeRF

        cfgs = SimpleNamespace(pipeline=SimpleNamespace(fc_use_full_features=False))
        coarse = SatNeRF(cfgs, layers=2, feat=64, mapping=False, skips=[1],
                         siren=True, t_embedding_dims=4)
        fine = SatNeRF(cfgs, layers=2, feat=64, mapping=False, skips=[1],
                       siren=True, t_embedding_dims=4)
        t = torch.nn.Embedding(8, 4)
        t_s = torch.nn.Embedding(8, 4)
        state = {}
        for prefix, module in (
            ("model_coarse", coarse), ("model_fine", fine),
            ("model_t", t), ("model_t_s", t_s),
        ):
            for k, v in module.state_dict().items():
                state[f"{prefix}.{k}"] = v
        fp = str(tmp_path / "last.ckpt")
        torch.save({"state_dict": state}, fp)

        fcfg = FieldConfig(variant="satnerf", siren=True, mapping=False,
                           layers=2, feat=64, skips=(1,))
        params = params_from_lightning_ckpt(fp, fcfg, t_vocab=8)
        assert set(params) == {"field", "fine", "t", "t_s"}
        np.testing.assert_allclose(
            params["fine"]["trunk"][0]["w"],
            fine.fc_net[0].weight.detach().numpy().T,
        )
        np.testing.assert_allclose(params["t_s"], t_s.weight.detach().numpy())
