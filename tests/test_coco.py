"""Pure-python COCO decoding tests (pycocotools replacement) against
hand-checked fixtures. ref: data_prep/prepare_annotations.py:61-255."""

import json
import os

import numpy as np

from satnerf_tpu.data_prep.coco import (
    CocoIndex,
    ann_to_mask,
    decode_rle,
    encode_rle,
    rasterize_polygon,
    rle_counts_from_string,
    rle_counts_to_string,
)
from satnerf_tpu.data_prep.prepare_annotations import LABELS, coco_to_masks


class TestRLE:
    def test_decode_known_runs_column_major(self):
        # 3x2 mask, column-major runs: 1 bg, 2 fg, 3 bg
        m = decode_rle([1, 2, 3], 3, 2)
        expect = np.array([[0, 0], [1, 0], [1, 0]], dtype=bool)
        np.testing.assert_array_equal(m, expect)

    def test_encode_decode_roundtrip_random(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            mask = rng.uniform(size=(13, 7)) < 0.4
            counts = encode_rle(mask)
            np.testing.assert_array_equal(decode_rle(counts, 13, 7), mask)

    def test_encode_leading_foreground_gets_zero_run(self):
        mask = np.ones((2, 2), dtype=bool)
        assert encode_rle(mask) == [0, 4]

    def test_string_roundtrip(self):
        for counts in (
            [0, 4],
            [1, 2, 3],
            [5, 100, 5, 100, 7],      # exercises the delta coding (i > 2)
            [1000, 1, 100000, 2, 3],  # multi-chunk LEB values
            [3, 50, 2, 1, 2, 40],     # negative deltas
        ):
            s = rle_counts_to_string(counts)
            assert rle_counts_from_string(s) == counts

    def test_string_roundtrip_random_masks(self):
        rng = np.random.default_rng(1)
        for _ in range(5):
            mask = rng.uniform(size=(31, 17)) < rng.uniform(0.1, 0.9)
            counts = encode_rle(mask)
            back = rle_counts_from_string(rle_counts_to_string(counts))
            np.testing.assert_array_equal(decode_rle(back, 31, 17), mask)


class TestPolygon:
    def test_axis_aligned_square_exact(self):
        # square with corners (1,1)-(4,4): pixel centers strictly inside are
        # x, y in {1.5, 2.5, 3.5} -> index range [1, 4)
        m = rasterize_polygon([1, 1, 4, 1, 4, 4, 1, 4], 6, 6)
        expect = np.zeros((6, 6), dtype=bool)
        expect[1:4, 1:4] = True
        np.testing.assert_array_equal(m, expect)

    def test_triangle_area(self):
        h = w = 64
        m = rasterize_polygon([0, 0, 60, 0, 0, 60], h, w)
        assert abs(m.sum() - 1800) / 1800 < 0.05  # ~half the 60x60 square

    def test_polygon_clipped_at_image_bounds(self):
        m = rasterize_polygon([-5, -5, 3, -5, 3, 3, -5, 3], 4, 4)
        expect = np.zeros((4, 4), dtype=bool)
        expect[:3, :3] = True
        np.testing.assert_array_equal(m, expect)

    def test_even_odd_hole(self):
        # self-intersecting bowtie: even-odd leaves the crossing point region
        outer = [0, 0, 8, 8, 8, 0, 0, 8]
        m = rasterize_polygon(outer, 8, 8)
        # bowtie covers two triangles; center column pixels appear once
        assert m[1, 4] or m[6, 4] or m.sum() > 0  # smoke: no crash, nonempty


class TestAnnToMask:
    def test_uncompressed_rle_dict(self):
        ann = {"segmentation": {"size": [3, 2], "counts": [1, 2, 3]}}
        m = ann_to_mask(ann, 3, 2)
        assert m[1, 0] and m[2, 0] and m.sum() == 2

    def test_compressed_rle_string(self):
        mask = np.zeros((5, 5), dtype=bool)
        mask[1:4, 2:4] = True
        s = rle_counts_to_string(encode_rle(mask))
        ann = {"segmentation": {"size": [5, 5], "counts": s}}
        np.testing.assert_array_equal(ann_to_mask(ann, 5, 5), mask)

    def test_multi_polygon_or_merge(self):
        ann = {
            "segmentation": [
                [0, 0, 2, 0, 2, 2, 0, 2],
                [3, 3, 5, 3, 5, 5, 3, 5],
            ]
        }
        m = ann_to_mask(ann, 6, 6)
        assert m[0, 0] and m[3, 3] and not m[0, 4]


def _write_fixture_json(fp: str):
    """Two 8x8 images: a building square with an overlapping car (ranking),
    and a water RLE region."""
    d = {
        "images": [
            {"id": 1, "file_name": "JAX_TEST_000_RGB.jpg", "height": 8, "width": 8},
            {"id": 2, "file_name": "JAX_TEST_001_RGB.jpg", "height": 8, "width": 8},
        ],
        "categories": [
            {"id": 10, "name": "buildings"},
            {"id": 11, "name": "cars"},
            {"id": 12, "name": "water"},
        ],
        "annotations": [
            # building block covering pixel centers [1,5) x [1,5)
            {"id": 1, "image_id": 1, "category_id": 10,
             "segmentation": [[1, 1, 5, 1, 5, 5, 1, 5]]},
            # car overlapping the building at [3,5) x [3,5): must win ranking
            {"id": 2, "image_id": 1, "category_id": 11,
             "segmentation": [[3, 3, 5, 3, 5, 5, 3, 5]]},
            # water as uncompressed RLE: first column of image 2
            {"id": 3, "image_id": 2, "category_id": 12,
             "segmentation": {"size": [8, 8], "counts": [0, 8, 56]}},
        ],
    }
    with open(fp, "w") as f:
        json.dump(d, f)


class TestCocoToMasks:
    def test_end_to_end_ranking_and_default_class(self, tmp_path):
        jfp = str(tmp_path / "_annotations.coco.json")
        _write_fixture_json(jfp)
        out = str(tmp_path / "masks")
        coco_to_masks(jfp, out, default_class="ground")

        m0 = np.load(os.path.join(out, "JAX_TEST_000_RGB.npy"))
        expect = np.full((8, 8), LABELS["ground"], np.uint8)
        expect[1:5, 1:5] = LABELS["buildings"]
        expect[3:5, 3:5] = LABELS["cars"]  # ranking: cars > buildings
        np.testing.assert_array_equal(m0, expect)

        m1 = np.load(os.path.join(out, "JAX_TEST_001_RGB.npy"))
        expect1 = np.full((8, 8), LABELS["ground"], np.uint8)
        expect1[:, 0] = LABELS["water"]
        np.testing.assert_array_equal(m1, expect1)

    def test_no_cars_variant(self, tmp_path):
        jfp = str(tmp_path / "_annotations.coco.json")
        _write_fixture_json(jfp)
        out = str(tmp_path / "masks_nc")
        coco_to_masks(jfp, out, no_cars=True)
        m0 = np.load(os.path.join(out, "JAX_TEST_000_RGB.npy"))
        assert (m0 != LABELS["cars"]).all()
        assert (m0[1:5, 1:5] == LABELS["buildings"]).all()

    def test_default_class_per_scene(self, tmp_path):
        jfp = str(tmp_path / "_annotations.coco.json")
        _write_fixture_json(jfp)
        out = str(tmp_path / "masks_veg")
        coco_to_masks(jfp, out, default_class="vegetation")
        m0 = np.load(os.path.join(out, "JAX_TEST_000_RGB.npy"))
        assert m0[0, 0] == LABELS["vegetation"]

    def test_coco_index(self, tmp_path):
        jfp = str(tmp_path / "_annotations.coco.json")
        _write_fixture_json(jfp)
        coco = CocoIndex(jfp)
        assert len(coco.imgs) == 2
        assert coco.category_name(11) == "cars"
        assert len(coco.image_anns(1)) == 2

    def test_namespaced_file_name(self, tmp_path):
        """roboflow exports may namespace file_name with a subdirectory."""
        jfp = str(tmp_path / "ann.json")
        d = {
            "images": [{"id": 1, "file_name": "images/sub/JAX_X_RGB.jpg",
                        "height": 4, "width": 4}],
            "categories": [{"id": 1, "name": "buildings"}],
            "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                             "segmentation": [[0, 0, 3, 0, 3, 3, 0, 3]]}],
        }
        json.dump(d, open(jfp, "w"))
        out = str(tmp_path / "masks")
        coco_to_masks(jfp, out)
        assert os.path.isfile(os.path.join(out, "images/sub/JAX_X_RGB.npy"))
