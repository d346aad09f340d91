import numpy as np
import pytest

import jax.numpy as jnp

from egotap_tpu.core.skeleton import get_skeleton
from egotap_tpu.data import heatmaps as H
from egotap_tpu.data.dataset import FrameDataset, load_frame, natsorted
from egotap_tpu.data.pipeline import (
    BatchLoader, _stack_batch, make_device_preprocess, make_loader)
from egotap_tpu.data.synthetic import generate_dataset, synthetic_config


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    generate_dataset(root, "UnrealEgo", num_sequences=2, frames_per_seq=5)
    return root


def test_natsorted():
    xs = ["frame_10.npy", "frame_2.npy", "frame_1.npy"]
    assert natsorted(xs) == ["frame_1.npy", "frame_2.npy", "frame_10.npy"]


class TestDataset:
    def test_discovery(self, synth_root):
        cfg = synthetic_config(synth_root)
        ds = FrameDataset(cfg, "train")
        assert len(ds) == 10
        frame = ds[0]
        assert frame["input_rgb_left"].shape == (256, 256, 3)
        assert frame["gt_camera_2d_left"].shape == (16, 2)
        assert frame["gt_local_pose"].shape == (16, 3)

    def test_category_filter(self, synth_root):
        cfg = synthetic_config(synth_root)
        n_all = len(FrameDataset(cfg, "train"))
        n_cat = len(FrameDataset(cfg, "train", category_id="001"))
        n_cat2 = len(FrameDataset(cfg, "train", category_id="002"))
        assert n_cat + n_cat2 == n_all
        assert 0 < n_cat < n_all

    def test_experiment_cap(self, synth_root):
        cfg = synthetic_config(synth_root, experiment=True)
        assert len(FrameDataset(cfg, "train")) <= 100

    def test_most_joints_in_view(self, synth_root):
        cfg = synthetic_config(synth_root)
        ds = FrameDataset(cfg, "train")
        frac = []
        for i in range(len(ds)):
            p = ds[i]["gt_camera_2d_left"]
            inview = (p[:, 0] >= 0) & (p[:, 0] < 1024) & \
                     (p[:, 1] >= 0) & (p[:, 1] < 1024)
            frac.append(inview.mean())
        assert np.mean(frac) > 0.7, np.mean(frac)


class TestLoader:
    def test_train_loader_shapes(self, synth_root):
        cfg = synthetic_config(synth_root, batch_size=4)
        loader = make_loader(cfg, "train")
        assert len(loader) == 2  # 10 frames, drop_last
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["input_rgb_left"].shape == (4, 256, 256, 3)
        assert b["mask"].sum() == 4

    def test_eval_padding(self, synth_root):
        cfg = synthetic_config(synth_root, batch_size=4)
        loader = make_loader(cfg, "validation")  # 10 frames -> 3 batches
        batches = list(loader)
        assert len(batches) == 3
        assert batches[-1]["mask"].sum() == 2
        assert batches[-1]["input_rgb_left"].shape == (4, 256, 256, 3)


class TestDevicePreprocess:
    def test_targets_match_reference_host_path(self, synth_root):
        cfg = synthetic_config(synth_root, num_heatmap=15, num_rot_heatmap=15,
                               heatmap_type="sin", batch_size=4)
        sk = get_skeleton("UnrealEgo")
        loader = make_loader(cfg, "validation")
        batch = next(iter(loader))
        pre = make_device_preprocess(cfg)
        feed = {k: jnp.asarray(v) for k, v in batch.items() if k != "paths"}
        out = pre(feed)

        assert out["gt_heatmap_left"].shape == (4, 64, 64, 15)
        assert out["gt_limb_heatmap_left"].shape == (4, 64, 64, 30)
        assert out["gt_plength_left"].shape == (4, 30)
        assert out["gt_local_pose"].shape == (4, 16, 3)

        # reference host-side target pipeline for sample 0
        i = 0
        p2d = batch["gt_camera_2d_left"][i]
        want_hm = H.coord2d_to_heatmap(p2d[1:], res=64)
        np.testing.assert_allclose(
            np.asarray(out["gt_heatmap_left"][i]).transpose(2, 0, 1),
            want_hm, atol=3e-6)

        pts3d = batch["gt_local_pose"][i] + batch["gt_pelvis_left"][i][None]
        raw, lengths, theta = H.limb_data(p2d, pts3d, sk.parents_array())
        raw2 = raw * 2
        cos_hm, sin_hm = H.sin_limb_heatmaps(raw2, theta)
        want_limb = np.concatenate([cos_hm, sin_hm], axis=0)
        np.testing.assert_allclose(
            np.asarray(out["gt_limb_heatmap_left"][i]).transpose(2, 0, 1),
            want_limb, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out["gt_plength_left"][i]),
            np.concatenate([lengths, lengths]), rtol=1e-5)

    def test_egocap_pose_rows(self, tmp_path):
        root = str(tmp_path / "ec")
        generate_dataset(root, "EgoCap", num_sequences=1, frames_per_seq=4)
        cfg = synthetic_config(root, "EgoCap", num_heatmap=17,
                               num_rot_heatmap=17, heatmap_type="sin",
                               batch_size=2)
        loader = make_loader(cfg, "test")
        batch = next(iter(loader))
        pre = make_device_preprocess(cfg)
        feed = {k: jnp.asarray(v) for k, v in batch.items() if k != "paths"}
        out = pre(feed)
        # EgoCap: root not estimated -> pose rows exclude joint 0
        assert out["gt_local_pose"].shape == (2, 17, 3)
        assert out["gt_heatmap_left"].shape == (2, 64, 64, 17)


class TestPreprocessCache:
    def test_same_signature_reuses_jitted_fn(self, tmp_path):
        from egotap_tpu.data.pipeline import make_device_preprocess
        from egotap_tpu.data.synthetic import synthetic_config
        import dataclasses
        cfg = synthetic_config(str(tmp_path / "a"), "UnrealEgo",
                               num_heatmap=15, num_rot_heatmap=15,
                               heatmap_type="sin",
                               load_size_heatmap=(16, 16))
        # a config copy with identical preprocess-relevant fields (the
        # category-eval loop's situation) must hit the cache...
        same = dataclasses.replace(cfg, batch_size=7).derive()
        assert make_device_preprocess(cfg) is make_device_preprocess(same)
        # ...while changing a closed-over field must miss it
        other = dataclasses.replace(cfg, num_rot_heatmap=10).derive()
        assert make_device_preprocess(other) is not make_device_preprocess(cfg)
