"""CLI-path int8 calibration (cfg.calib_batches) through evaluate().

VERDICT r3 item 4: the eval CLI previously prepared int8 inference with
dynamic (batch-coupled) activation scales only; `cfg.calib_batches > 0`
now calibrates static scales on the first N eval batches. The headline
property: one sample's int8 pose must be IDENTICAL whether it is
evaluated alone or inside a mixed batch (mirrors
tests/test_quantized.py::test_calibrated_outputs_are_batch_invariant but
through the evaluate() loop the test CLI uses)."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~16 min: several full evaluate() compiles

import jax
import jax.numpy as jnp

from egotap_tpu.data.pipeline import make_device_preprocess, make_loader
from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
from egotap_tpu.eval.evaluate import _has_calibrated_scales, evaluate
from egotap_tpu.train.tasks import LifterTask


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("calib_e2e"))
    generate_dataset(path, "UnrealEgo", num_sequences=1, frames_per_seq=5,
                     image_size=16)
    return path


def _cfg(root, tmp_path, batch_size, **kw):
    base = dict(
        model="egotap_autoencoder", num_heatmap=15, num_rot_heatmap=15,
        heatmap_type="sin", skel_layer="PU", ae_hidden_size=32,
        patched_heatmap_ae=True, load_size_heatmap=(16, 16),
        batch_size=batch_size, niter=1, niter_decay=1, use_amp=True,
        int8_heatmap_inference=True, int8_lifter_inference=True,
        result_dir=str(tmp_path / f"results_b{batch_size}"),
        experiment_name="calib_test")
    base.update(kw)
    return synthetic_config(root, **base)


class TestEvalCalibration:
    def test_evaluate_calibrates_and_reports(self, root, tmp_path, capsys):
        cfg = _cfg(root, tmp_path, batch_size=4, calib_batches=1)
        task = LifterTask(cfg)
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
        assert not _has_calibrated_scales(state.frozen)
        metrics, _, _ = evaluate(cfg, task, state, mode="test")
        assert "calibrated static (1 batches)" in capsys.readouterr().out
        assert np.isfinite(list(metrics.values())).all()

    def test_cli_int8_eval_is_batch_invariant(self, root, tmp_path, capsys):
        """Same sample, same calibrated state: pose row 0 must match
        bitwise between a batch-1 run (alone) and a batch-4 run (mixed
        with other frames) of the full evaluate() loop."""
        cfg4 = _cfg(root, tmp_path, batch_size=4, calib_batches=1)
        task = LifterTask(cfg4)
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)

        # calibrate once, the way cli/test.py's evaluate() does internally
        loader = make_loader(cfg4, "test")
        pre = make_device_preprocess(cfg4)
        batch = next(iter(loader))
        batch.pop("paths", None)
        feed = pre({k: jnp.asarray(v) for k, v in batch.items()})
        prepped = task.prepare_inference(
            state, calib_batches=[{"input_rgb": feed["input_rgb"]}])
        assert _has_calibrated_scales(prepped.frozen)

        cfg1 = dataclasses.replace(
            cfg4, batch_size=1,
            result_dir=str(tmp_path / "results_b1")).derive()
        preds = {}
        for cfg in (cfg4, cfg1):
            evaluate(cfg, task, prepped, mode="test", save_result=True)
            # a pre-calibrated state must not be re-calibrated per run
            # (the test CLI calls evaluate 30x across categories)
            assert "pre-calibrated" in capsys.readouterr().out
            preds[cfg.batch_size] = np.load(
                f"{cfg.results_dir}/pred_pose.npy")
        assert preds[1].shape == preds[4].shape
        np.testing.assert_array_equal(preds[1][0], preds[4][0])
