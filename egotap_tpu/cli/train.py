"""Training CLI (reference train.py equivalent).

    python -m egotap_tpu.cli.train --preset egotap_unrealego \
        --data_dir /data/UnrealEgoData [--flag value ...]
"""

from __future__ import annotations

import sys

from egotap_tpu.core.config import Config
from egotap_tpu.train.loop import run_training


def main(argv=None) -> None:
    cfg = Config.from_args(argv)
    run_training(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
