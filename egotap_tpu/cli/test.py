"""Evaluation CLI (reference test.py equivalent).

Loads the ``best`` checkpoint, runs the full test split (per-frame stats +
pose dumps) and the 30-way motion-category evaluation, writing
``detail_result.txt`` / ``categorical_result.txt`` under
``{result_dir}/{experiment_name}`` like the reference.
"""

from __future__ import annotations

import os
import sys

import jax

from egotap_tpu.core.config import Config
from egotap_tpu.data.pipeline import make_loader
from egotap_tpu.eval.categories import MOTION_CATEGORIES
from egotap_tpu.eval.evaluate import (
    append_categorical_result, evaluate, write_categorical_header,
    write_detail_result)
from egotap_tpu.train import state as state_lib
from egotap_tpu.train.loop import _init_task_state
from egotap_tpu.train.tasks import create_task


def main(argv=None) -> None:
    cfg = Config.from_args(argv)
    cfg.is_train = False
    cfg.use_amp = False  # reference forces fp32 at test (test_options.py:15)
    os.makedirs(cfg.results_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.experiment_dir, "test_opt.txt"))

    if not state_lib.checkpoint_exists(cfg.experiment_dir, "best"):
        raise SystemExit(
            f"no 'best' checkpoint under {cfg.experiment_dir} — train "
            f"{cfg.experiment_name!r} first (fail-fast before model init)")
    task = create_task(cfg)
    state = _init_task_state(cfg, task, iters_per_epoch=1)
    state = state_lib.load_checkpoint(cfg.experiment_dir, "best", state,
                                      restore_opt_state=False)

    print("-----------------Test Best Model-----------------")
    metrics, stats, pps = evaluate(cfg, task, state, mode="test",
                                   save_result=True)
    write_detail_result(os.path.join(cfg.results_dir, "detail_result.txt"),
                        stats)
    for k, v in metrics.items():
        print(f"{k}: {v:.4e}")
    print(f"throughput: {pps:.1f} pairs/s")

    cat_path = os.path.join(cfg.results_dir, "categorical_result.txt")
    write_categorical_header(cat_path, metrics)
    print("-----------------Start Category-Specific Evaluation----------")
    for key, name in MOTION_CATEGORIES.items():
        n = len(make_loader(cfg, "test", key))
        cat_metrics, _, _ = evaluate(cfg, task, state, mode="test",
                                     category_id=key)
        if not cat_metrics:
            continue
        append_categorical_result(cat_path, key, name, n, cat_metrics)
        print(f"category {key}_{name}: " +
              " ".join(f"{k}: {v}" for k, v in cat_metrics.items()))

    print("-----------------All Process Finished-----------------")


if __name__ == "__main__":
    main(sys.argv[1:])
