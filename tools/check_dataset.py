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
    args = ap.parse_args()

    cfg = Config(data_dir=args.data_dir,
                 default_data_path=args.default_data_path,
                 joint_preset=args.joint_preset,
                 data_prefix=args.data_prefix).derive()
    for mode in args.modes:
        report = check_split(cfg, mode)
        print(f"[{mode}] sequences {report['sequences_present']}/"
              f"{report['sequences']}  frames {report['frames']}  "
              f"corrupt {len(report['corrupt'])}  "
              f"missing {len(report['missing'])}")
        for cat, n in sorted(report["category_counts"].items()):
            print(f"  category {cat}: {n} frames")


if __name__ == "__main__":
    main()
