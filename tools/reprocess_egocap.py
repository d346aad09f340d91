"""EgoCap reprocessing CLI (reference reprocess_egocap_data.py).

    python tools/reprocess_egocap.py --data_dir /out/EgoCap \
        --raw_dir /raw/EgoCap [--hdf5 path/to/Ego_pose_stereo_cleaned.hdf5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from egotap_tpu.core.config import Config  # noqa: E402
from egotap_tpu.preprocess.egocap import reprocess  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--raw_dir", default=None)
    ap.add_argument("--hdf5", default=None)
    ap.add_argument("--no_crop", action="store_true")
    ap.add_argument("--experiment", action="store_true")
    args = ap.parse_args()

    cfg = Config(data_dir=args.data_dir, joint_preset="EgoCap",
                 experiment=args.experiment).derive()
    reprocess(cfg, raw_dir=args.raw_dir, hdf5_path=args.hdf5,
              do_crop=not args.no_crop)


if __name__ == "__main__":
    main()
