"""Python side of the packed record format: writer + ctypes reader.

See recordio.cc for the on-disk layout. The writer packs per-frame dicts
(the raw arrays `egotap_tpu.data.dataset.load_frame` returns) into one
fixed-stride file per split; the reader mmaps it and gathers whole batches
in native code. Frame paths live in a sidecar ``.paths`` text file.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

MAGIC = b"EGTPREC1"
_DTYPES = {0: np.float32, 1: np.uint8, 2: np.float16, 3: np.int32}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}

_FIELD_FMT = "<64sII6QQ"  # name, dtype, ndim, dims[6], offset
_HDR_FMT = "<8sQQII"


def _so_path() -> str:
    build = os.path.join(os.path.dirname(__file__), "build")
    return os.path.join(build, "librecordio.so")


def build_library(force: bool = False) -> str:
    so = _so_path()
    src = os.path.join(os.path.dirname(__file__), "recordio.cc")
    if force or (not os.path.exists(so)) or \
            os.path.getmtime(so) < os.path.getmtime(src):
        os.makedirs(os.path.dirname(so), exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", so],
            check=True)
    return so


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        lib.egr_open.restype = ctypes.c_void_p
        lib.egr_open.argtypes = [ctypes.c_char_p]
        lib.egr_close.argtypes = [ctypes.c_void_p]
        lib.egr_num_records.restype = ctypes.c_uint64
        lib.egr_num_records.argtypes = [ctypes.c_void_p]
        lib.egr_record_bytes.restype = ctypes.c_uint64
        lib.egr_record_bytes.argtypes = [ctypes.c_void_p]
        lib.egr_num_fields.restype = ctypes.c_uint32
        lib.egr_num_fields.argtypes = [ctypes.c_void_p]
        lib.egr_field_info.restype = ctypes.c_int
        lib.egr_field_info.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
        lib.egr_gather.restype = ctypes.c_int
        lib.egr_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint32]
        lib.egr_gather_fields.restype = ctypes.c_int
        lib.egr_gather_fields.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint32]
        _lib = lib
    return _lib


def write_records(path: str, frames, paths: Optional[Sequence[str]] = None,
                  cast: Optional[Dict[str, np.dtype]] = None) -> int:
    """Pack frame dicts (consistent keys/shapes/dtypes) into one .egr.

    `frames` may be any iterable (streamed — one frame resident at a
    time; the record count is back-patched into the header at the end).
    `cast` optionally converts named fields on the way in, e.g.
    {"input_rgb_left": np.float16} to halve the dominant RGB bytes
    (the loader-side device preprocess casts back to f32 on the TPU).
    Returns the number of records written.
    """
    it = iter(frames)
    try:
        first = next(it)
    except StopIteration:
        raise ValueError("write_records: empty frame iterable")
    cast = {k: np.dtype(v) for k, v in (cast or {}).items()}

    def prep(fr, k):
        arr = np.asarray(fr[k])
        if k in cast and arr.dtype != cast[k]:
            arr = arr.astype(cast[k])
        return np.ascontiguousarray(arr)

    keys = [k for k in first if k != "path"]
    fields = []
    offset = 0
    for k in keys:
        arr = prep(first, k)
        code = _DTYPE_CODES[arr.dtype]
        dims = list(arr.shape) + [0] * (6 - arr.ndim)
        fields.append((k, code, arr.ndim, dims, offset, arr.nbytes))
        offset += arr.nbytes
    record_bytes = offset

    n = 0
    with open(path, "wb") as f:
        f.write(struct.pack(_HDR_FMT, MAGIC, 0, record_bytes,
                            len(fields), 0))
        for (k, code, ndim, dims, off, _) in fields:
            f.write(struct.pack(_FIELD_FMT, k.encode()[:64], code, ndim,
                                *dims, off))
        import itertools
        for fr in itertools.chain([first], it):
            for (k, code, ndim, dims, off, nbytes) in fields:
                arr = prep(fr, k)
                assert arr.nbytes == nbytes, f"inconsistent field {k}"
                f.write(arr.tobytes())
            n += 1
        f.seek(8)  # back-patch num_records (right after the magic)
        f.write(struct.pack("<Q", n))

    if paths is not None:
        with open(path + ".paths", "w") as f:
            f.write("\n".join(paths) + "\n")
    return n


class RecordReader:
    """mmap'd batch reader over a packed split."""

    def __init__(self, path: str, num_threads: int = 2):
        self._lib = _get_lib()
        self._h = self._lib.egr_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open record file {path}")
        self.num_threads = num_threads
        self.record_bytes = self._lib.egr_record_bytes(self._h)
        self.num_records = self._lib.egr_num_records(self._h)
        self.fields: List[Tuple[str, np.dtype, Tuple[int, ...], int]] = []
        for i in range(self._lib.egr_num_fields(self._h)):
            name = ctypes.create_string_buffer(64)
            dtype = ctypes.c_uint32()
            ndim = ctypes.c_uint32()
            dims = (ctypes.c_uint64 * 6)()
            off = ctypes.c_uint64()
            self._lib.egr_field_info(self._h, i, name, ctypes.byref(dtype),
                                     ctypes.byref(ndim), dims,
                                     ctypes.byref(off))
            shape = tuple(int(dims[d]) for d in range(ndim.value))
            self.fields.append((name.value.decode(),
                                np.dtype(_DTYPES[dtype.value]), shape,
                                int(off.value)))
        self.paths: Optional[List[str]] = None
        if os.path.exists(path + ".paths"):
            with open(path + ".paths") as f:
                self.paths = [l.strip() for l in f if l.strip()]

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        """Fetch a batch: one native FIELD-MAJOR gather straight into the
        final per-field arrays (batch, *field_shape) — a single pass over
        the mmap'd payload and zero python-side copies (the record-major
        variant needed a second strided numpy copy per field, which
        dominated the batch cost on the one host core)."""
        indices = np.ascontiguousarray(indices, dtype=np.uint64)
        n = len(indices)
        out: Dict[str, np.ndarray] = {}
        ptrs = (ctypes.c_void_p * len(self.fields))()
        fbytes = (ctypes.c_uint64 * len(self.fields))()
        for i, (name, dtype, shape, _off) in enumerate(self.fields):
            arr = np.empty((n,) + shape, dtype=dtype)
            out[name] = arr
            ptrs[i] = arr.ctypes.data_as(ctypes.c_void_p)
            fbytes[i] = arr.nbytes // n
        rc = self._lib.egr_gather_fields(
            self._h, indices.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            n, ptrs, fbytes, self.num_threads)
        if rc != 0:
            raise IndexError("record index out of range")
        return out

    def close(self) -> None:
        if self._h:
            self._lib.egr_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def pack_split(cfg, mode: str, rgb_dtype: Optional[str] = None) -> str:
    """Pack one split of an npy-dict dataset into {data_dir}/packed/.

    Frames are streamed (one resident at a time — real splits run to
    hundreds of GB). rgb_dtype="float16" halves the dominant stereo-RGB
    bytes; the device preprocess casts back to f32 on-TPU (max relative
    deviation ~5e-4 on ImageNet-normalized values — serving/AMP configs
    compute in bf16 anyway, but leave it unset for bit-exact f32 parity
    runs)."""
    from egotap_tpu.data.dataset import FrameDataset
    ds = FrameDataset(cfg, mode)
    out_dir = os.path.join(cfg.data_dir, "packed")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{cfg.data_prefix}{mode}.egr")
    cast = None
    if rgb_dtype is not None:
        cast = {"input_rgb_left": np.dtype(rgb_dtype),
                "input_rgb_right": np.dtype(rgb_dtype)}
    write_records(out, (ds[i] for i in range(len(ds))), paths=ds.paths,
                  cast=cast)
    return out


def packed_path(cfg, mode: str) -> str:
    return os.path.join(cfg.data_dir, "packed", f"{cfg.data_prefix}{mode}.egr")
