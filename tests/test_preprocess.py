"""Tests for the offline preprocessing subsystem (rotations, reprocessors,
integrity checker)."""

import json
import os

import numpy as np
import pytest

from egotap_tpu.core.config import Config
from egotap_tpu.core.rotations import is_rotation, local_rot, ur2r, vec2vec_rotation
from egotap_tpu.core.skeleton import get_skeleton
from egotap_tpu.data.heatmaps import heatmap_to_camera2d, pts2d_to_heatmap
from egotap_tpu.data.integrity import check_split
from egotap_tpu.preprocess import egocap
from egotap_tpu.preprocess.unrealego import enrich_frame, reprocess


class TestRotations:
    def test_ur2r_is_rotation(self, rng):
        thetas = rng.uniform(-180, 180, size=(10, 3))
        R = ur2r(thetas)
        assert R.shape == (10, 3, 3)
        for r in R:
            assert is_rotation(r)
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)

    def test_ur2r_identity(self):
        np.testing.assert_allclose(ur2r(np.zeros(3)), np.eye(3), atol=1e-7)

    def test_local_rot_unit_vectors(self, rng):
        sk = get_skeleton("UnrealEgo")
        pose = rng.normal(size=(16, 3))
        lr = local_rot(pose, sk.parents_array())
        assert np.allclose(lr[0], 0)
        np.testing.assert_allclose(np.linalg.norm(lr[1:], axis=-1), 1.0,
                                   rtol=1e-5)

    def test_vec2vec(self, rng):
        v1, v2 = rng.normal(size=3), rng.normal(size=3)
        R = vec2vec_rotation(v1, v2)
        got = R @ (v1 / np.linalg.norm(v1))
        np.testing.assert_allclose(got, v2 / np.linalg.norm(v2), atol=1e-6)


class TestPointHeatmaps:
    def test_pts2d_to_heatmap_peak(self):
        hm = pts2d_to_heatmap(np.array([512.0, 256.0]))
        assert hm.max() == pytest.approx(1.0, rel=1e-5)
        assert np.unravel_index(hm.argmax(), hm.shape) == (16, 32)

    def test_heatmap_to_camera2d_roundtrip(self):
        hm = pts2d_to_heatmap(np.array([512.0, 256.0]))[None]
        coords = heatmap_to_camera2d(hm)
        np.testing.assert_allclose(coords[0], [16, 32])
        empty = np.zeros((1, 64, 64), np.float32)
        assert np.all(heatmap_to_camera2d(empty) == -1.0)


def _make_raw_unrealego(root, rng, n_frames=3):
    """Synthetic raw UnrealEgo tree: npy + json metadata per frame."""
    sk = get_skeleton("UnrealEgo")
    sub = "all_data_with_img-256_hm-64_pose-16_npy"
    seq = os.path.join(root, "Mocap", "001", "seq000")
    os.makedirs(os.path.join(seq, sub), exist_ok=True)
    os.makedirs(os.path.join(seq, "json"), exist_ok=True)
    for t in range(n_frames):
        pose = rng.normal(size=(16, 3)).astype(np.float32) * 10
        item = {
            "input_rgb_left": rng.normal(size=(3, 32, 32)).astype(np.float32),
            "input_rgb_right": rng.normal(size=(3, 32, 32)).astype(np.float32),
            "gt_heatmap_left": rng.random((15, 64, 64)).astype(np.float32),
            "gt_heatmap_right": rng.random((15, 64, 64)).astype(np.float32),
            "gt_local_pose": pose,
        }
        np.save(os.path.join(seq, sub, f"frame_{t}.npy"),
                np.array(item, dtype=object))
        joints = {}
        names = list(sk.joint_names) + ["pelvis"]
        for name in names:
            joints[name] = {
                "camera_left_pts2d": rng.uniform(100, 900, 2).tolist(),
                "camera_right_pts2d": rng.uniform(100, 900, 2).tolist(),
                "camera_left_pts3d": rng.normal(size=3).tolist(),
                "camera_right_pts3d": rng.normal(size=3).tolist(),
                "trans": rng.normal(size=3).tolist(),
                "rot": rng.uniform(-90, 90, 3).tolist(),
            }
        meta = {"ground_z_value": 12.0, "joints": joints}
        with open(os.path.join(seq, "json", f"frame_{t}.json"), "w") as f:
            json.dump(meta, f)
    for mode in ("train", "validation", "test"):
        with open(os.path.join(root, f"{mode}.txt"), "w") as f:
            f.write("./UnrealEgoData/Mocap/001/seq000\n")
    return seq


class TestUnrealEgoReprocess:
    def test_enrich_and_write(self, tmp_path, rng):
        raw = str(tmp_path / "raw")
        out = str(tmp_path / "out")
        _make_raw_unrealego(raw, rng)
        cfg = Config(data_dir=out, metadata_dir=(raw,),
                     default_data_path="./UnrealEgoData").derive()
        os.makedirs(out, exist_ok=True)
        for mode in ("train", "validation", "test"):
            with open(os.path.join(out, f"{mode}.txt"), "w") as f:
                f.write("./UnrealEgoData/Mocap/001/seq000\n")
        fails = reprocess(cfg, modes=("train",))
        assert fails == 0

        frame = np.load(os.path.join(
            out, "Mocap", "001", "seq000",
            "all_data_with_img-256_hm-64_pose-16_npy", "frame_1.npy"),
            allow_pickle=True).item()
        assert frame["gt_heatmap_left"].shape == (16, 64, 64)  # pelvis added
        assert frame["gt_camera_2d_left"].shape == (16, 2)
        assert frame["gt_limb_heatmap_left"].shape == (15, 64, 64)
        assert frame["gt_limb_theta"].shape == (15,)
        assert is_rotation(frame["gt_root_rotation"])
        assert frame["gt_root_translation_delta"].shape == (3,)
        assert frame["gt_local_rot"].shape == (16, 3)
        assert os.path.exists(os.path.join(out, "meanstd.npy"))
        # frame_0 is context-only, not written
        assert not os.path.exists(os.path.join(
            out, "Mocap", "001", "seq000",
            "all_data_with_img-256_hm-64_pose-16_npy", "frame_0.npy"))

    def test_integrity_checker(self, tmp_path, rng):
        raw = str(tmp_path / "raw")
        _make_raw_unrealego(raw, rng)
        cfg = Config(data_dir=raw, default_data_path="./UnrealEgoData").derive()
        report = check_split(cfg, "train", check_keys=False)
        assert report["sequences_present"] == 1
        assert report["frames"] == 3
        assert report["category_counts"] == {"001": 3}
        assert os.path.exists(os.path.join(raw, "inuse_train.txt"))

    def test_integrity_checker_raw_branches(self, tmp_path, rng):
        """Raw JSON/depth/RGB verification (reference
        check_dataset.py:48-137): valid files pass, corrupt/missing land
        in corrupt_{json,depth,rgb}_{mode}.txt."""
        from PIL import Image
        raw = str(tmp_path / "raw")
        _make_raw_unrealego(raw, rng)
        seq = os.path.join(raw, "Mocap", "001", "seq000")
        # frame_0/1/2 exist; give all frames valid depth+rgb PNGs...
        for sub, stem in (("fisheye_depth_image", "depth"),
                          ("fisheye_final_image", "final")):
            for side in ("camera_left", "camera_right"):
                d = os.path.join(seq, sub, side)
                os.makedirs(d)
                for t in range(3):
                    Image.new("L", (4, 4)).save(
                        os.path.join(d, f"{stem}_{t}.png"))
        # ...then break exactly one of each kind
        bad_json = os.path.join(seq, "json", "frame_1.json")
        with open(bad_json, "w") as f:
            f.write("{not json")
        bad_depth = os.path.join(seq, "fisheye_depth_image",
                                 "camera_right", "depth_2.png")
        with open(bad_depth, "wb") as f:
            f.write(b"not a png")
        bad_rgb = os.path.join(seq, "fisheye_final_image",
                               "camera_left", "final_0.png")
        os.remove(bad_rgb)  # missing counts as corrupt (bare except)

        cfg = Config(data_dir=raw, default_data_path="./UnrealEgoData").derive()
        report = check_split(cfg, "train", check_keys=False, check_raw=True)
        assert report["corrupt_raw"]["json"] == [bad_json]
        assert report["corrupt_raw"]["depth"] == [bad_depth]
        assert report["corrupt_raw"]["rgb"] == [bad_rgb]
        for kind, path in (("json", bad_json), ("depth", bad_depth),
                           ("rgb", bad_rgb)):
            out = os.path.join(raw, f"corrupt_{kind}_train.txt")
            with open(out) as f:
                assert f.read().strip() == path
        # per-kind gating mirrors the reference's independent flags
        report = check_split(cfg, "train", check_keys=False,
                             check_raw=("json",), write_reports=False)
        assert report["corrupt_raw"]["json"] == [bad_json]
        assert report["corrupt_raw"]["depth"] == []

    def test_integrity_checker_metadata_dir_fallback(self, tmp_path, rng):
        """Raw trees living under a separate metadata root resolve through
        cfg.metadata_dir (reference check_dataset.py:76-82)."""
        raw = str(tmp_path / "npys")
        meta = str(tmp_path / "meta")
        _make_raw_unrealego(raw, rng)
        # move the json tree to the metadata root
        seq_rel = os.path.join("Mocap", "001", "seq000")
        os.makedirs(os.path.join(meta, seq_rel))
        os.rename(os.path.join(raw, seq_rel, "json"),
                  os.path.join(meta, seq_rel, "json"))
        cfg = Config(data_dir=raw, metadata_dir=(meta,),
                     default_data_path="./UnrealEgoData").derive()
        report = check_split(cfg, "train", check_keys=False,
                             check_raw=("json",), write_reports=False)
        assert report["corrupt_raw"]["json"] == []


class TestEgoCapParsers:
    def test_parse_calibration(self, tmp_path):
        txt = "\n".join([
            "#polynomial C2W", "", "pol 1.0 -2.0 0.5", "",
            "#polynomial W2C", "", "invpol 300.0 -150.0 -20.0", "",
            "#center", "", "500.5 640.25", "",
            "#affine", "", "1.0 0.0 0.0", "",
            "#size", "", "1024 1280", ""])
        p = tmp_path / "calib.txt"
        p.write_text(txt)
        c = egocap.parse_egocap_calib(str(p))
        assert c["polynomialC2W"] == [1.0, -2.0, 0.5]
        assert c["polynomialW2C"] == [300.0, -150.0, -20.0]
        assert c["image_center"] == [500.5, 640.25]
        assert c["size"] == [1024, 1280]

    def test_crop_center(self):
        c = {"image_center": [500.0, 641.0], "name": "egocap_pose"}
        cc = egocap.crop_center_for_calib(c)
        assert cc["orig_image_center"] == [500.0, 641.0]
        assert cc["image_center"][1] == 641.0 - 640 + 512

    def test_process_coordinates(self):
        coords = np.array([[700.0, 300.0]])
        got = egocap.process_coordinates(coords, orig_center_x=641.0)
        np.testing.assert_allclose(got, [[700.0 - 640 + 512, 300.0]])

    def test_flip_reorder(self):
        coords = np.stack([np.arange(18), np.arange(18)], axis=-1).astype(float)
        flipped = egocap.flip_raw_coordinates(coords)
        assert flipped.shape == (18, 2)
        np.testing.assert_allclose(flipped[2, 0], 1280.0 - 6)  # left<->right

    def test_parse_2d_datafile(self, tmp_path):
        content = "\n".join([
            "# 1", "./images/S7_v003_cam0_frame-100.jpg",
            "640", "512", "3", "18",
            "0 10.0 20.0", "1 30.0 40.0", "",
            "# 2", "./images/S7_v003_cam1_frame-15.jpg",
            "640", "512", "3", "18",
            "2 50.0 60.0", ""])
        p = tmp_path / "dataset.txt"
        p.write_text(content)
        data = egocap.parse_2d_datafile(str(p))
        assert len(data) == 2
        # (row, col) half-res -> (x=col*2? stored (y*2, x*2)) per reference
        np.testing.assert_allclose(data[0]["coordinates"][0], [20.0, 40.0])

    def test_build_frame_keys(self, rng):
        cfg = Config(joint_preset="EgoCap").derive()
        img = rng.integers(0, 255, size=(3, 256, 256)).astype(np.float32)
        coords = rng.uniform(0, 1024, size=(18, 2)).astype(np.float32)
        pose = rng.normal(size=(18, 3)).astype(np.float32) * 10
        frame = egocap.build_frame(img, img, coords, coords, pose, cfg)
        assert frame["gt_heatmap_left"].shape == (17, 64, 64)
        assert frame["gt_limb_heatmap_left"].shape == (17, 64, 64)
        assert frame["input_rgb_left"].shape == (3, 256, 256)
        assert frame["gt_local_pose"].dtype == np.float32

    def test_cam1_extrinsics_shape(self):
        E = egocap.cam1_extrinsics()
        assert E.shape == (4, 4)
        # z-flip conjugation preserves the bottom row
        np.testing.assert_allclose(E[3], [0, 0, 0, 1])
