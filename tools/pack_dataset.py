"""Pack an npy-dict dataset into native .egr record files.

    python tools/pack_dataset.py --data_dir /data/UnrealEgoData \
        [--joint_preset UnrealEgo] [--modes train validation test]

After packing, `egotap_tpu.data.pipeline.make_loader` automatically uses
the native reader for those splits.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from egotap_tpu.core.config import Config  # noqa: E402
from egotap_tpu.native.recordio import pack_split  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--default_data_path", default="./UnrealEgoData")
    ap.add_argument("--joint_preset", default="UnrealEgo")
    ap.add_argument("--data_prefix", default="")
    ap.add_argument("--modes", nargs="+",
                    default=["train", "validation", "test"])
    ap.add_argument("--rgb_dtype", default=None, choices=[None, "float16"],
                    help="pack stereo RGB as float16 (halves the pack size "
                         "and doubles feed rate; device preprocess casts "
                         "back to f32 — skip for bit-exact f32 parity runs)")
    args = ap.parse_args()

    cfg = Config(data_dir=args.data_dir,
                 default_data_path=args.default_data_path,
                 joint_preset=args.joint_preset,
                 data_prefix=args.data_prefix).derive()
    for mode in args.modes:
        out = pack_split(cfg, mode, rgb_dtype=args.rgb_dtype)
        print(f"packed {mode} -> {out}")


if __name__ == "__main__":
    main()
