"""Pure-python reader for PyTorch ``.pth`` checkpoints (no torch needed).

The reference saves per-subnet ``state_dict`` files
(``{tag}_net_{Name}.pth``, reference model/base_model.py:64-114); this
module reads the zip+pickle container directly into numpy arrays so the
framework can convert released checkpoints without a torch dependency.

Supports the torch >= 1.6 zipfile serialization format with typed storages
(the format the reference's torch 2.0.1 writes).
"""

from __future__ import annotations

import pickle
import zipfile
from typing import Any, Dict

import numpy as np

try:  # bfloat16 support comes with jax's ml_dtypes
    import ml_dtypes
    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
    "BFloat16Storage": _BFLOAT16,
}


class _StorageType:
    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name)


def _rebuild_tensor(storage: np.ndarray, storage_offset, size, stride, *_):
    if len(size) == 0:
        return np.asarray(storage[storage_offset]).copy()
    itemsize = storage.itemsize
    view = np.lib.stride_tricks.as_strided(
        storage[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=True, *_):
    return data


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name in (
                "_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "collections" and name == "OrderedDict":
            import collections
            return collections.OrderedDict
        if module == "torch" and name in ("Size",):
            return tuple
        raise pickle.UnpicklingError(
            f"unsupported global in torch checkpoint: {module}.{name}")

    def persistent_load(self, pid):
        kind, storage_type, key, _location, _numel = pid
        assert kind == "storage"
        raw = self._zf.read(self._prefix + "data/" + key)
        dtype = storage_type.dtype
        if dtype is None:
            raise ValueError(
                f"unsupported storage dtype {storage_type.name}")
        return np.frombuffer(bytearray(raw), dtype=dtype)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a .pth file into a flat dict of numpy arrays (state_dict)."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path}: not a torch zip checkpoint")
        pkl_name = min(pkl_names, key=len)
        prefix = pkl_name[: -len("data.pkl")]
        with zf.open(pkl_name) as f:
            obj = _Unpickler(f, zf, prefix).load()
    return dict(obj)


def strip_module_prefix(state: Dict[str, Any]) -> Dict[str, Any]:
    """Remove DataParallel's 'module.' prefixes
    (reference model/base_model.py:164-171)."""
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in state.items()}
