"""data_prep pipeline test: fake DFC2019 Track-3 layout -> step pipeline ->
root.json -> loadable training dataset."""

import glob
import os
import shutil

import numpy as np
import pytest

from satnerf_tpu.data_prep.dataset_config import (
    DatasetConfig,
    GeneralConfig,
    StepConfig,
)
from satnerf_tpu.data_prep.create_dataset import create_dataset
from satnerf_tpu.datasets.synthetic import generate_scene
from satnerf_tpu.io.json_io import read_json
from satnerf_tpu.io.tiff import read_geotiff, write_geotiff


@pytest.fixture(scope="module")
def raw_dfc(tmp_path_factory):
    """Fake DFC2019 distribution built from synthetic scene assets."""
    base = tmp_path_factory.mktemp("dfc")
    syn = base / "syn"
    generate_scene(str(syn), n_train=3, n_test=0, img_size=48, aoi_name="JAX_068")

    rgb_dp = base / "Track3-RGB"
    truth_dp = base / "Track3-Truth"
    meta_dp = base / "Track3-Metadata" / "JAX"
    for dp in (rgb_dp, truth_dp, meta_dp):
        os.makedirs(dp, exist_ok=True)

    # imagery with RPC tags
    for fp in sorted(glob.glob(str(syn / "images" / "*.tif"))):
        shutil.copy(fp, rgb_dp / os.path.basename(fp))

    # GT DSM WITHOUT georeferencing (the distribution quirk the adapter fixes)
    arr, profile = read_geotiff(str(syn / "JAX_068_DSM.tif"))
    profile.transform = None
    profile.epsg = None
    write_geotiff(str(truth_dp / "JAX_068_DSM.tif"), arr, profile)
    cls_arr, cls_profile = read_geotiff(str(syn / "JAX_068_CLS.tif"))
    cls_profile.transform = None
    cls_profile.epsg = None
    write_geotiff(str(truth_dp / "JAX_068_CLS.tif"), cls_arr, cls_profile)
    shutil.copy(str(syn / "JAX_068_DSM.txt"), truth_dp / "JAX_068_DSM.txt")

    # IMD files per image index: sun angles from the synthetic metas
    for meta_fp in sorted(glob.glob(str(syn / "metas" / "*.json"))):
        meta = read_json(meta_fp)
        idx = os.path.basename(meta_fp)[:-5]
        nn = idx[idx.find("_RGB") - 2 : idx.find("_RGB")]
        with open(meta_dp / f"{nn}.IMD", "w") as f:
            f.write(
                f'\tmeanSunAz = {meta["sun_azimuth"]:.2f};\n'
                f'\tmeanSunEl = {meta["sun_elevation"]:.2f};\n'
                '\tTLCTime = "20-03-15T15:30:00.000000Z";\n'
            )

    # semantic npy masks (as prepare_annotations would emit)
    masks_dp = base / "masks"
    os.makedirs(masks_dp, exist_ok=True)
    for fp in sorted(glob.glob(str(syn / "semantic_own" / "*.tif"))):
        arr, _ = read_geotiff(fp)
        name = os.path.basename(fp)[:-4].replace("_CLS", "_RGB")
        np.save(masks_dp / f"{name}.npy", arr[0].astype(np.uint8))

    return base


def test_full_data_prep_pipeline(raw_dfc, tmp_path):
    out_dp = str(tmp_path / "JAX_068")
    cfg = DatasetConfig(
        general=GeneralConfig(
            aoi_name="JAX_068",
            lazy=True,
            dfc_rgb_dp=str(raw_dfc / "Track3-RGB"),
            dfc_truth_dp=str(raw_dfc / "Track3-Truth"),
            dfc_metadata_dp=str(raw_dfc / "Track3-Metadata"),
            semantic_masks_dp=str(raw_dfc / "masks"),
            output_dp=out_dp,
            zone_string="17R",
            split_mode="fixed",
            n_test=1,
        ),
        steps=[
            StepConfig(file="adapter_dfc2019"),
            StepConfig(file="step_bundle_adjustment", params={"n_points": 200}),
            StepConfig(file="step_finish_meta_extraction"),
            StepConfig(file="step_create_root_file"),
            StepConfig(file="step_semantic"),
        ],
    )
    state = create_dataset(cfg)

    # manifest exists with all sections
    root = read_json(os.path.join(out_dp, "root.json"))
    assert len(root["train_split"]) == 2 and len(root["test_split"]) == 1
    assert root["semantic_cls_labels"]["4"] == "cars"
    assert "points3d_fp" in root

    # metas carry rpc + sun + keypoints + footprint
    meta = read_json(
        os.path.join(out_dp, "metas", root["train_split"][0])
    )
    assert "rpc" in meta and "keypoints" in meta and "geojson" in meta
    assert meta["sun_elevation"] > 0

    # GT DSM got georegistered by the adapter
    _, prof = read_geotiff(os.path.join(out_dp, root["dsm_tif_fp"]))
    assert prof.transform is not None and prof.epsg == 32617

    # lazy re-run: everything skippable
    state2 = create_dataset(cfg)
    assert state2["root_fp"] == state["root_fp"]


def test_prepared_dataset_is_trainable(raw_dfc, tmp_path):
    from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
    from satnerf_tpu.pipelines import load_pipeline
    from satnerf_tpu.train.loop import Trainer

    out_dp = str(tmp_path / "ds" / "JAX_068")
    cfg = DatasetConfig(
        general=GeneralConfig(
            aoi_name="JAX_068",
            dfc_rgb_dp=str(raw_dfc / "Track3-RGB"),
            dfc_truth_dp=str(raw_dfc / "Track3-Truth"),
            dfc_metadata_dp=str(raw_dfc / "Track3-Metadata"),
            semantic_masks_dp=str(raw_dfc / "masks"),
            output_dp=out_dp,
            split_mode="fixed",
            n_test=1,
        ),
        steps=[
            StepConfig(file="adapter_dfc2019"),
            StepConfig(file="step_bundle_adjustment", params={"n_points": 200}),
            StepConfig(file="step_create_root_file"),
            StepConfig(file="step_semantic"),
        ],
    )
    create_dataset(cfg)

    run = RunConfig(
        dataset_name="JAX_068", datasets_dp=str(tmp_path / "ds"),
        cache_dp=str(tmp_path / "cache"), workspace_dp=str(tmp_path / "train"),
        max_train_steps=4, num_sanity_val_steps=0,
    )
    pipe = RSSemanticConfig(
        n_samples=4, fc_layers=2, fc_units=32, fc_skips=[1], batch_size=128,
        depth_enabled=True, render_chunk_size=2048,
    )
    pipeline = load_pipeline(MainConfig(run, pipe))
    pipeline.prepare_run()
    pipeline.load_datasets()
    state = Trainer(pipeline, log_every=10).fit(validate_every_epoch=False)
    assert int(state.step) == 4


class TestPrecomputedBAImport:
    """Golden contract test: a recorded sat-bundleadjust output directory
    (ba_params/{pts3d,pts2d,cam_ind,pts_ind}.npy + geotiff_paths.txt +
    rpcs_adj/*.rpc_adj, ref: data_prep/processing/step_bundle_adjustment.py:72-97)
    imports via mode='precomputed' and feeds the depth dataset end-to-end."""

    def _record_ba_output(self, syn, ba):
        """Invert the meta distribution into the raw BA output layout."""
        from satnerf_tpu.geo.rpc import RPCModel

        meta_fps = sorted(glob.glob(os.path.join(str(syn), "metas", "*.json")))
        names = [os.path.basename(f)[:-5] for f in meta_fps]
        os.makedirs(os.path.join(str(ba), "ba_params"))
        os.makedirs(os.path.join(str(ba), "rpcs_adj"))
        orig, pts2d_all, cam_ind, pts_ind, paths = {}, [], [], [], []
        for ci, fp in enumerate(meta_fps):
            m = read_json(fp)
            orig[names[ci]] = m["keypoints"]
            k = m["keypoints"]
            pts2d_all.append(np.asarray(k["2d_coordinates"], np.float64))
            cam_ind += [ci] * len(k["pts3d_indices"])
            pts_ind += k["pts3d_indices"]
            # PAN paths exercise the reference's crop/band rewrites
            paths.append(
                f"/remote/pan_crops/{m['img'].replace('RGB.tif', 'PAN.tif')}"
            )
            RPCModel.from_dict(m["rpc"]).to_rpc_file(
                os.path.join(str(ba), "rpcs_adj", names[ci] + ".rpc_adj")
            )
            del m["keypoints"]  # a real import must recreate them
            from satnerf_tpu.io.json_io import write_json

            write_json(fp, m)
        bp = os.path.join(str(ba), "ba_params")
        np.save(os.path.join(bp, "pts3d.npy"),
                np.load(os.path.join(str(syn), "pts3d.npy")))
        np.save(os.path.join(bp, "pts2d.npy"), np.concatenate(pts2d_all))
        np.save(os.path.join(bp, "cam_ind.npy"), np.asarray(cam_ind))
        np.save(os.path.join(bp, "pts_ind.npy"), np.asarray(pts_ind))
        with open(os.path.join(bp, "geotiff_paths.txt"), "w") as f:
            f.write("\n".join(paths) + "\n")
        return names, orig

    def test_import_restores_contract_and_feeds_depth_dataset(self, tmp_path):
        from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
        from satnerf_tpu.data_prep.steps.step_bundle_adjustment import (
            ProcessingStep,
        )
        from satnerf_tpu.datasets import DepthDataset, SemanticDataset
        from satnerf_tpu.geo.rpc import RPCModel

        syn = tmp_path / "SYN_BA"
        generate_scene(str(syn), n_train=3, n_test=0, img_size=32,
                       n_tie_points=100)
        names, orig = self._record_ba_output(syn, tmp_path / "ba_out")

        cfg = DatasetConfig(general=GeneralConfig(output_dp=str(syn)))
        scfg = StepConfig(
            file="step_bundle_adjustment",
            params={"mode": "precomputed",
                    "precomputed_dp": str(tmp_path / "ba_out")},
        )
        state = {"metas_dp": str(syn / "metas"), "image_names": names}
        step = ProcessingStep(cfg, scfg, state)
        step.run(cfg, state)
        step.update_state(cfg, state, True)
        assert state["points3d_fp"] == str(syn / "pts3d.npy")

        for name in names:
            m = read_json(str(syn / "metas" / (name + ".json")))
            np.testing.assert_allclose(
                np.asarray(m["keypoints"]["2d_coordinates"]),
                np.asarray(orig[name]["2d_coordinates"]),
                atol=1e-9,
            )
            assert m["keypoints"]["pts3d_indices"] == orig[name]["pts3d_indices"]
            # adjusted rpc survived the .rpc_adj text round trip
            rpc = RPCModel.from_dict(m["rpc"])
            cols = np.linspace(1, 30, 5)
            lon, lat = rpc.localization(cols, cols, np.full(5, 10.0))
            c2, r2 = rpc.projection(lon, lat, np.full(5, 10.0))
            np.testing.assert_allclose(c2, cols, atol=1e-5)

        # the depth dataset consumes the imported contract end-to-end
        run = RunConfig(
            dataset_name="SYN_BA", datasets_dp=str(tmp_path),
            cache_dp=str(tmp_path / "cache"),
            workspace_dp=str(tmp_path / "train"),
        )
        mcfg = MainConfig(run, RSSemanticConfig())
        rgb = SemanticDataset(mcfg, "rgb", "train")
        rgb.load()
        rgb.initialize_normalization(rgb.combined["rays"])
        rgb.save_to_cache()
        depth = DepthDataset(mcfg, "depth", "train")
        depth.initialize_normalization()
        depth.load()
        d = depth.combined
        assert d["rays"].shape[0] > 0
        assert (d["weights"] > 0).all() and (d["weights"] <= 1.0).all()
        assert np.isfinite(d["depths"]).all()
