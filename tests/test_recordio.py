"""Native packed-record reader tests (builds the C++ library)."""

import os

import numpy as np
import pytest

from egotap_tpu.data.dataset import FrameDataset
from egotap_tpu.data.pipeline import (PackedBatchLoader, PrefetchLoader,
                                      make_loader)
from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
from egotap_tpu.native import recordio


@pytest.fixture(scope="module")
def packed_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("packed"))
    generate_dataset(root, "UnrealEgo", num_sequences=2, frames_per_seq=5,
                     image_size=16)
    cfg = synthetic_config(root, load_size_heatmap=(16, 16))
    for mode in ("train", "validation", "test"):
        recordio.pack_split(cfg, mode)
    return root


def test_build_library():
    so = recordio.build_library()
    assert os.path.exists(so)


def test_roundtrip(packed_root):
    cfg = synthetic_config(packed_root, load_size_heatmap=(16, 16))
    ds = FrameDataset(cfg, "train")
    reader = recordio.RecordReader(recordio.packed_path(cfg, "train"))
    assert reader.num_records == len(ds)

    batch = reader.gather(np.array([0, 3, 7]))
    for k in ("input_rgb_left", "gt_camera_2d_left", "gt_local_pose",
              "gt_pelvis_right", "gt_local_rot"):
        want = np.stack([ds[i][k] for i in (0, 3, 7)])
        np.testing.assert_array_equal(batch[k], want), k
    assert reader.paths is not None
    assert reader.paths[0] == ds.paths[0]


def test_out_of_range(packed_root):
    cfg = synthetic_config(packed_root, load_size_heatmap=(16, 16))
    reader = recordio.RecordReader(recordio.packed_path(cfg, "train"))
    with pytest.raises(IndexError):
        reader.gather(np.array([10 ** 6]))


def test_make_loader_uses_packed(packed_root):
    cfg = synthetic_config(packed_root, load_size_heatmap=(16, 16),
                           batch_size=4)
    loader = make_loader(cfg, "validation")
    assert isinstance(loader, PrefetchLoader)  # background-prefetch wrapper
    assert isinstance(loader._inner, PackedBatchLoader)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["mask"].sum() == 2
    # content identical to the npy path
    cfg2 = synthetic_config(packed_root, load_size_heatmap=(16, 16),
                            batch_size=4)
    ds = FrameDataset(cfg2, "validation")
    np.testing.assert_array_equal(
        batches[0]["input_rgb_left"][0], ds[0]["input_rgb_left"])


def test_prefetch_wrapper_semantics(packed_root):
    cfg = synthetic_config(packed_root, load_size_heatmap=(16, 16),
                           batch_size=4)
    loader = make_loader(cfg, "validation")
    # re-iterable: two full epochs yield identical batch counts/content
    e1, e2 = list(loader), list(loader)
    assert len(e1) == len(e2) == len(loader) == 3
    np.testing.assert_array_equal(e1[0]["input_rgb_left"],
                                  e2[0]["input_rgb_left"])
    # early break (watchdog path) must not wedge subsequent epochs
    for b in loader:
        break
    assert len(list(loader)) == 3

    # worker exceptions propagate to the consumer
    class Boom:
        def __iter__(self):
            yield {"x": np.zeros(1)}
            raise RuntimeError("boom")

        def __len__(self):
            return 2

    it = iter(PrefetchLoader(Boom(), depth=2))
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_f16_pack_roundtrip(tmp_path):
    root = str(tmp_path)
    generate_dataset(root, "UnrealEgo", num_sequences=1, frames_per_seq=5,
                     image_size=16)
    cfg = synthetic_config(root, load_size_heatmap=(16, 16), batch_size=4)
    out = recordio.pack_split(cfg, "train", rgb_dtype="float16")
    reader = recordio.RecordReader(out)
    ds = FrameDataset(cfg, "train")
    assert reader.num_records == len(ds)  # streamed-count back-patch
    batch = reader.gather(np.arange(4))
    assert batch["input_rgb_left"].dtype == np.float16
    # RGB within f16 rounding; non-RGB fields bit-exact
    np.testing.assert_allclose(
        batch["input_rgb_left"][1].astype(np.float32),
        ds[1]["input_rgb_left"], rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(batch["gt_local_pose"][2],
                                  ds[2]["gt_local_pose"])

    # the jitted device preprocess casts f16 feeds back to f32
    from egotap_tpu.data.pipeline import make_device_preprocess
    import jax.numpy as jnp
    loader = make_loader(cfg, "train")
    pre = make_device_preprocess(cfg)
    b = next(iter(loader))
    b.pop("paths", None)
    feed = pre({k: jnp.asarray(v) for k, v in b.items()})
    assert feed["input_rgb"].dtype == jnp.float32


def test_category_filter_packed(packed_root):
    cfg = synthetic_config(packed_root, load_size_heatmap=(16, 16),
                           batch_size=4)
    l1 = make_loader(cfg, "train", category_id="001")
    l2 = make_loader(cfg, "train", category_id="002")
    n1 = sum(int(b["mask"].sum()) for b in make_loader(cfg, "validation"))
    assert n1 == 10
    total = len(l1.indices) + len(l2.indices)
    assert total == 10
