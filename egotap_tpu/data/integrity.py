"""Dataset integrity checking (reference check_dataset.py:15-137 +
image_folder.py check_integrity mode).

Validates that every listed sequence exists and its frame files load,
writes ``inuse_{mode}.txt`` (sequences actually present),
``corrupt_{mode}.txt`` (unloadable frames) and ``missing_{mode}.txt``
(sequences with gaps), and reports per-motion-category frame counts.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np

from egotap_tpu.core.config import Config
from egotap_tpu.data.dataset import natsorted

REQUIRED_KEYS = ("input_rgb_left", "gt_camera_2d_left",
                 "gt_local_pose", "gt_pelvis_left")


def check_split(cfg: Config, mode: str,
                check_keys: bool = True,
                write_reports: bool = True) -> Dict:
    list_path = os.path.join(cfg.data_dir, cfg.data_prefix + mode + ".txt")
    with open(list_path) as f:
        seq_paths = [s.strip() for s in f.readlines() if s.strip()]

    inuse: List[str] = []
    missing: List[str] = []
    corrupt: List[str] = []
    category_counts: Dict[str, int] = {}
    n_frames = 0

    for orig in seq_paths:
        path = orig.replace(cfg.default_data_path, cfg.data_dir, 1)
        frame_dir = os.path.join(path, cfg.data_sub_path)
        frames = natsorted(glob.glob(os.path.join(frame_dir, "*.npy")))
        if not frames:
            missing.append(frame_dir)
            continue
        inuse.append(orig)
        category = frame_dir.rstrip("/").split("/")[-3]
        for p in frames:
            try:
                item = np.load(p, allow_pickle=True).item()
                if check_keys:
                    for k in REQUIRED_KEYS:
                        if k not in item:
                            raise KeyError(k)
            except Exception:
                corrupt.append(p)
                continue
            n_frames += 1
            category_counts[category] = category_counts.get(category, 0) + 1

    if write_reports:
        def _write(name, lines):
            with open(os.path.join(cfg.data_dir, f"{name}_{mode}.txt"), "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
        _write("inuse", inuse)
        _write("corrupt", corrupt)
        _write("missing", missing)

    return {
        "mode": mode,
        "sequences": len(seq_paths),
        "sequences_present": len(inuse),
        "frames": n_frames,
        "corrupt": corrupt,
        "missing": missing,
        "category_counts": category_counts,
    }
