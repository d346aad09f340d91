import numpy as np
import torch

from egotap_tpu.compat.torch_loader import (
    load_torch_checkpoint, strip_module_prefix)


def test_load_state_dict_roundtrip(tmp_path, rng):
    state = {
        "layer.weight": torch.from_numpy(rng.normal(size=(4, 3)).astype(np.float32)),
        "layer.bias": torch.from_numpy(rng.normal(size=(4,)).astype(np.float32)),
        "bn.running_mean": torch.from_numpy(rng.normal(size=(4,)).astype(np.float64)),
        "count": torch.tensor(7, dtype=torch.int64),
    }
    path = tmp_path / "ckpt.pth"
    torch.save(state, str(path))

    loaded = load_torch_checkpoint(str(path))
    assert set(loaded.keys()) == set(state.keys())
    for k in state:
        np.testing.assert_array_equal(np.asarray(loaded[k]),
                                      state[k].numpy())


def test_noncontiguous_tensor(tmp_path):
    t = torch.arange(24, dtype=torch.float32).reshape(4, 6).t()  # strided
    torch.save({"w": t}, str(tmp_path / "c.pth"))
    loaded = load_torch_checkpoint(str(tmp_path / "c.pth"))
    np.testing.assert_array_equal(loaded["w"], t.numpy())


def test_real_module_state_dict(tmp_path, rng):
    m = torch.nn.Sequential(torch.nn.Linear(3, 5), torch.nn.BatchNorm1d(5))
    torch.save(m.state_dict(), str(tmp_path / "m.pth"))
    loaded = load_torch_checkpoint(str(tmp_path / "m.pth"))
    sd = m.state_dict()
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(np.asarray(loaded[k]), sd[k].numpy())


def test_strip_module_prefix():
    s = {"module.a.b": 1, "c": 2}
    assert strip_module_prefix(s) == {"a.b": 1, "c": 2}
