"""UnrealEgo reprocessing CLI (reference reprocess_unrealego_data.py).

    python tools/reprocess_unrealego.py --data_dir /out/UnrealEgoData \
        --metadata_dir /raw/UnrealEgoData [--experiment true]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from egotap_tpu.core.config import Config  # noqa: E402
from egotap_tpu.preprocess.unrealego import reprocess  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--metadata_dir", nargs="+", required=True)
    ap.add_argument("--default_data_path", default="./UnrealEgoData")
    ap.add_argument("--data_sub_path",
                    default="all_data_with_img-256_hm-64_pose-16_npy")
    ap.add_argument("--experiment", action="store_true")
    args = ap.parse_args()

    cfg = Config(data_dir=args.data_dir,
                 metadata_dir=tuple(args.metadata_dir),
                 default_data_path=args.default_data_path,
                 data_sub_path=args.data_sub_path,
                 experiment=args.experiment).derive()
    fails = reprocess(cfg)
    print(f"Failed to modify {fails} sequences")


if __name__ == "__main__":
    main()
