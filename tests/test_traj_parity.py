"""N-step TRAINING-TRAJECTORY parity against the reference (slow tier).

Replays the exact optimizer steps recorded by tools/gen_traj_golden.py
(which drives the reference model drivers on CPU) through egotap_tpu's
jitted train_steps, from the identical converted initialization and the
identical batches, and asserts:

  * per-step training losses match (torch Adam/AdamW semantics including
    eps placement and bias correction, loss wiring, BN train-mode batch
    statistics — reference model/heatmap_shared_model.py:110-153,
    model/egotap_autoencoder_model.py:284-296, model/network.py:35-78);
  * the learning-rate schedule stepping convention matches (per-epoch
    'lambda' vs per-iteration 'cos_anneal_warmup', train.py:129-130, 224);
  * final parameters match after N steps;
  * final BatchNorm running stats match — including the stage-2 FROZEN
    heatmap nets, whose train-mode BN keeps evolving during lifter
    training (reference train.py:91, egotap_autoencoder_model.py:177-216).
"""

import os
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.compat.convert import convert_heatmap_net, convert_lifter
from egotap_tpu.core.config import Config
from egotap_tpu.train.tasks import HeatmapTask, LifterTask

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.slow


def load_traj(name, gen_arg):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        if not os.path.isdir("/root/reference"):
            pytest.skip(f"{name} missing and no reference repo")
        subprocess.run(
            ["python", "tools/gen_traj_golden.py", gen_arg],
            cwd=os.path.join(os.path.dirname(__file__), os.pardir),
            check=True)
    return np.load(path, allow_pickle=True)


def group(data, prefix):
    plen = len(prefix)
    return {k[plen:]: data[k] for k in data.files if k.startswith(prefix)}


def nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def feed_from_batch(b):
    """Reference NCHW batch dict -> the task feed layout
    (data/pipeline.py:make_device_preprocess output)."""
    out = {
        "input_rgb": np.stack([nhwc(b["input_rgb_left"]),
                               nhwc(b["input_rgb_right"])], axis=1),
        "gt_local_pose": b["gt_local_pose"],
    }
    for side in ("left", "right"):
        out[f"gt_heatmap_{side}"] = nhwc(b[f"gt_heatmap_{side}"])
        out[f"gt_limb_heatmap_{side}"] = nhwc(b[f"gt_limb_heatmap_{side}"])
        out[f"gt_plength_{side}"] = b[f"gt_plength_{side}"]
    return {k: jnp.asarray(v) for k, v in out.items()}


def tree_max_diff(a, b):
    diffs = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(jnp.asarray(x, jnp.float32)
                                           - jnp.asarray(y, jnp.float32)))),
        a, b)
    leaves, _ = jax.tree_util.tree_flatten_with_path(diffs)
    worst = max(leaves, key=lambda kv: kv[1])
    return worst[1], jax.tree_util.keystr(worst[0])


def assert_losses(got_steps, data, names, rtol):
    """got_steps: list of per-step loss dicts (ours); data: fixture."""
    for name, fixture_key in names.items():
        want = data[f"loss/{fixture_key}"]
        got = np.asarray([float(s[name]) for s in got_steps])
        np.testing.assert_allclose(
            got, want, rtol=rtol, atol=1e-7,
            err_msg=f"per-step loss trajectory diverged for {name}")


class TestStage1Trajectory:
    @pytest.fixture(scope="class")
    def run(self):
        data = load_traj("traj_stage1.npz", "stage1")
        steps = int(data["steps"])
        cfg = Config(
            model="heatmap_shared", joint_preset="UnrealEgo",
            num_heatmap=15, num_rot_heatmap=15, heatmap_type="sin",
            optimizer_type="Adam", lr=2e-5, weight_decay=0.1,
            lr_policy="lambda", epoch_count=1, niter=1, niter_decay=3,
            use_amp=False, compute_dtype="float32", batch_size=4,
        ).derive()
        task = HeatmapTask(cfg)
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=4)
        variables = jax.tree.map(
            jnp.asarray, convert_heatmap_net(group(data, "init_sd/"),
                                             "resnet18"))
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"],
                              opt_state=task.tx.init(variables["params"]))
        losses = []
        for i in range(steps):
            feed = feed_from_batch(group(data, f"batch{i}/"))
            state, loss_d = task.train_step(state, feed)
            losses.append({k: float(v) for k, v in loss_d.items()})
        return data, state, losses

    def test_per_step_losses(self, run):
        data, _, losses = run
        # rtol 1e-4: pure f32 reduction-order noise (XLA vs oneDNN convs)
        # accumulates to ~3e-5 rel by step 8; semantic errors sit orders
        # of magnitude higher (wrong eps ~10% shift, wrong decay mode
        # >1e-3, missing per-view BN ~0.6% at step 0)
        assert_losses(losses, data, {
            "heatmap_left": "heatmap_left",
            "heatmap_right": "heatmap_right",
            "limb_heatmap_left": "limb_heatmap_left",
            "limb_heatmap_right": "limb_heatmap_right",
        }, rtol=1e-4)

    def test_final_params(self, run):
        data, state, _ = run
        want = jax.tree.map(jnp.asarray, convert_heatmap_net(
            group(data, "final_sd/"), "resnet18"))
        diff, where = tree_max_diff(state.params, want["params"])
        assert diff <= 1e-4, f"max param diff {diff:.3e} at {where}"

    def test_final_bn_running_stats(self, run):
        data, state, _ = run
        want = jax.tree.map(jnp.asarray, convert_heatmap_net(
            group(data, "final_sd/"), "resnet18"))
        diff, where = tree_max_diff(state.batch_stats,
                                    want["batch_stats"])
        assert diff <= 1e-4, f"max BN stat diff {diff:.3e} at {where}"


class TestStage2Trajectory:
    @pytest.fixture(scope="class")
    def run(self):
        data = load_traj("traj_stage2.npz", "stage2")
        steps = int(data["steps"])
        cfg = Config(
            model="egotap_autoencoder", joint_preset="UnrealEgo",
            num_heatmap=15, num_rot_heatmap=15, heatmap_type="sin",
            skel_layer="PU", ae_hidden_size=128, patched_heatmap_ae=True,
            load_size_heatmap=(32, 32),
            optimizer_type="AdamW", lr=2e-4, weight_decay=1e-2,
            opt_eps=1e-4, lr_policy="cos_anneal_warmup",
            epoch_count=1, niter=1, niter_decay=3,
            lambda_mpjpe=0.1, lambda_cos_sim=-0.01,
            use_amp=False, compute_dtype="float32", batch_size=2,
        ).derive()
        task = LifterTask(cfg)
        hv = jax.tree.map(jnp.asarray, convert_heatmap_net(
            group(data, "init_pos_sd/"), "resnet18"))
        rv = jax.tree.map(jnp.asarray, convert_heatmap_net(
            group(data, "init_rot_sd/"), "resnet18"))
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=3,
                                heatmap_vars=hv, rot_heatmap_vars=rv)
        lv = jax.tree.map(jnp.asarray,
                          convert_lifter(group(data, "init_sd/")))
        state = state.replace(params=lv["params"],
                              batch_stats=lv["batch_stats"],
                              opt_state=task.tx.init(lv["params"]))
        losses = []
        for i in range(steps):
            feed = feed_from_batch(group(data, f"batch{i}/"))
            state, loss_d = task.train_step(state, feed)
            losses.append({k: float(v) for k, v in loss_d.items()})
        return data, state, losses

    def test_per_step_losses(self, run):
        data, _, losses = run
        assert_losses(losses, data,
                      {"pose": "pose", "cos_sim": "cos_sim"}, rtol=1e-5)

    def test_final_lifter_params(self, run):
        data, state, _ = run
        want = jax.tree.map(jnp.asarray,
                            convert_lifter(group(data, "final_sd/")))
        diff, where = tree_max_diff(state.params, want["params"])
        assert diff <= 1e-4, f"max param diff {diff:.3e} at {where}"

    def test_final_lifter_bn_stats(self, run):
        data, state, _ = run
        want = jax.tree.map(jnp.asarray,
                            convert_lifter(group(data, "final_sd/")))
        diff, where = tree_max_diff(state.batch_stats,
                                    want["batch_stats"])
        assert diff <= 1e-4, f"max lifter BN stat diff {diff:.3e} at {where}"

    def test_frozen_bn_evolution(self, run):
        """The frozen heatmap nets' running stats must evolve EXACTLY like
        the reference's train-mode frozen nets (train.py:91;
        egotap_autoencoder_model.py:177-216)."""
        data, state, _ = run
        for key, init_prefix, final_prefix in (
                ("heatmap", "init_pos_sd/", "final_pos_bn/"),
                ("rot_heatmap", "init_rot_sd/", "final_rot_bn/")):
            sd = group(data, init_prefix)
            sd.update(group(data, final_prefix))   # evolved running stats
            want = convert_heatmap_net(sd, "resnet18")["batch_stats"]
            diff, where = tree_max_diff(state.frozen[key]["batch_stats"],
                                        want)
            assert diff <= 1e-4, \
                f"frozen {key} BN stats diff {diff:.3e} at {where}"

    def test_lr_schedule_trace(self, run):
        """cos_anneal_warmup stepped per iteration: the lr used at step k
        equals HF get_cosine_schedule_with_warmup's lambda(k)
        (network.py:49-52; torch schedulers apply lambda(0) at
        construction, so step 0 trains at lr=0 when warmup > 0)."""
        data, _, _ = run
        from egotap_tpu.train.optim import make_schedule
        cfg = Config(lr=2e-4, lr_policy="cos_anneal_warmup",
                     epoch_count=1, niter=1, niter_decay=3)
        sched = make_schedule(cfg, iters_per_epoch=3)
        got = np.asarray([float(sched(k)) for k in range(int(data["steps"]))])
        np.testing.assert_allclose(got, data["lr"], rtol=1e-6, atol=1e-12)
