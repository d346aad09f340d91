"""Dataset integrity checker CLI (reference check_dataset.py equivalent).

    python tools/check_dataset.py --data_dir /data/UnrealEgoData \
        [--modes train validation test]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from egotap_tpu.core.config import Config  # noqa: E402
from egotap_tpu.data.integrity import check_split  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--default_data_path", default="./UnrealEgoData")
    ap.add_argument("--joint_preset", default="UnrealEgo")
    ap.add_argument("--data_prefix", default="")
    ap.add_argument("--modes", nargs="+",
                    default=["train", "validation", "test"])
    # raw-dataset verification (reference check_dataset.py:48-137 +
    # file_check_options.py): JSON metadata parses, depth/RGB PNGs decode
    ap.add_argument("--check_json", action="store_true")
    ap.add_argument("--check_depth_image", action="store_true")
    ap.add_argument("--check_rgb_image", action="store_true")
    ap.add_argument("--metadata_dir", nargs="*", default=[],
                    help="alternative roots holding the raw json/image "
                         "trees (first existing one wins)")
    args = ap.parse_args()

    check_raw = tuple(
        kind for kind, on in (("json", args.check_json),
                              ("depth", args.check_depth_image),
                              ("rgb", args.check_rgb_image)) if on)
    cfg = Config(data_dir=args.data_dir,
                 default_data_path=args.default_data_path,
                 joint_preset=args.joint_preset,
                 metadata_dir=tuple(args.metadata_dir),
                 data_prefix=args.data_prefix).derive()
    for mode in args.modes:
        report = check_split(cfg, mode, check_raw=check_raw)
        print(f"[{mode}] sequences {report['sequences_present']}/"
              f"{report['sequences']}  frames {report['frames']}  "
              f"corrupt {len(report['corrupt'])}  "
              f"missing {len(report['missing'])}")
        if check_raw:
            raw = report["corrupt_raw"]
            print(f"  raw: corrupt json {len(raw['json'])}  "
                  f"depth {len(raw['depth'])}  rgb {len(raw['rgb'])}")
        for cat, n in sorted(report["category_counts"].items()):
            print(f"  category {cat}: {n} frames")


if __name__ == "__main__":
    main()
