import math

import numpy as np
import pytest
import torch

from egotap_tpu.core.config import PRESETS, Config
from egotap_tpu.train.optim import make_schedule


class TestConfig:
    def test_derive_unrealego(self):
        cfg = Config(joint_preset="UnrealEgo").derive()
        assert cfg.estimate_head and cfg.stereo
        assert cfg.views == 2
        assert cfg.num_joints_out == 16

    def test_derive_egocap(self):
        cfg = Config(joint_preset="EgoCap", num_heatmap=17).derive()
        assert not cfg.estimate_head and cfg.stereo
        assert cfg.num_joints_out == 17

    def test_derive_mono(self):
        cfg = Config(joint_preset="xR-Egopose").derive()
        assert cfg.estimate_head and not cfg.stereo
        assert cfg.views == 1

    def test_limb_dim(self):
        assert Config(heatmap_type="sin").limb_dim == 2
        assert Config(heatmap_type="limb").limb_dim == 1
        assert Config(heatmap_type="none").limb_dim == 0

    def test_from_args_preset(self):
        cfg = Config.from_args(["--preset", "egotap_unrealego",
                                "--data_dir", "/tmp/x", "--batch_size", "8"])
        assert cfg.skel_layer == "PU"
        assert cfg.ae_hidden_size == 128
        assert cfg.patched_heatmap_ae
        assert cfg.batch_size == 8          # override wins
        assert cfg.data_dir == "/tmp/x"
        assert cfg.heatmap_type == "sin"
        assert cfg.optimizer_type == "AdamW"

    def test_from_args_explicit_flag_equal_to_default_overrides_preset(self):
        # regression: explicit flags whose value equals the dataclass
        # default must still override the preset (argparse.SUPPRESS
        # sentinels; previously `--lr_policy lambda` over a preset that
        # sets cos_anneal_warmup was silently dropped)
        cfg = Config.from_args(["--preset", "egotap_unrealego",
                                "--lr_policy", "lambda",
                                "--use_amp", "false"])
        assert cfg.lr_policy == "lambda"
        assert cfg.use_amp is False
        # unpassed flags keep the preset value
        assert cfg.optimizer_type == "AdamW"
        assert cfg.batch_size == 32

    def test_from_args_preset_kwarg_and_optional_int(self):
        cfg = Config.from_args(["--watchdog_check_iters", "123"],
                               preset="egotap_unrealego")
        assert cfg.skel_layer == "PU"          # preset kwarg applied
        assert cfg.watchdog_check_iters == 123  # Optional[int] parsed as int
        # --preset flag wins over the kwarg
        cfg2 = Config.from_args(["--preset", "unrealego_heatmap_joint"],
                                preset="egotap_unrealego")
        assert cfg2.model == "heatmap_shared"

    def test_presets_cover_shipped_scripts(self):
        names = {"unrealego_heatmap_joint", "unrealego_heatmap_limb",
                 "egotap_unrealego", "egotap_egocap",
                 "egocap_heatmap_joint", "egocap_heatmap_limb"}
        assert names <= set(PRESETS)

    def test_save(self, tmp_path):
        cfg = Config().derive()
        cfg.save(str(tmp_path / "train_opt.txt"))
        text = (tmp_path / "train_opt.txt").read_text()
        assert "batch_size: 16" in text


class TestSchedules:
    def _torch_lambda_lrs(self, cfg, epochs):
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=cfg.lr)
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt, lambda e: 1.0 - max(0, e + cfg.epoch_count - cfg.niter)
            / float(cfg.niter_decay + 1))
        lrs = []
        for _ in range(epochs):
            lrs.append(opt.param_groups[0]["lr"])
            sched.step()
        return lrs

    def test_lambda_matches_torch(self):
        cfg = Config(lr=1e-3, niter=2, niter_decay=5, lr_policy="lambda")
        ipe = 10
        sched = make_schedule(cfg, ipe)
        want = self._torch_lambda_lrs(cfg, 7)
        got = [float(sched(e * ipe)) for e in range(7)]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_cos_anneal_warmup_matches_hf(self):
        cfg = Config(lr=1e-3, niter=1, niter_decay=3,
                     lr_policy="cos_anneal_warmup")
        ipe = 8
        sched = make_schedule(cfg, ipe)
        warmup, total = 1 * ipe, 4 * ipe

        def hf(step):  # transformers get_cosine_schedule_with_warmup
            if step < warmup:
                return step / max(1, warmup)
            progress = (step - warmup) / max(1, total - warmup)
            return max(0.0, 0.5 * (1.0 + math.cos(math.pi * progress)))

        for step in range(0, total + 4):
            assert float(sched(step)) == pytest.approx(
                cfg.lr * hf(min(step, total)), abs=1e-9), step

    def test_step_and_exponent(self):
        cfg = Config(lr=1.0, lr_policy="step", lr_decay_iters_step=2)
        sched = make_schedule(cfg, 1)
        assert float(sched(0)) == 1.0
        assert float(sched(2)) == 0.5
        assert float(sched(4)) == 0.25
        cfg2 = Config(lr=1.0, lr_policy="exponent")
        s2 = make_schedule(cfg2, 1)
        assert float(s2(3)) == pytest.approx(0.95 ** 3)


class TestLearnedLROptimizers:
    """DAdam / Prodigy (reference model/network.py:79-116) via optax.contrib."""

    @pytest.mark.parametrize("opt_type", ["DAdam", "Prodigy", "DSGD",
                                          "DAdaGrad"])
    def test_converges_on_quadratic(self, opt_type):
        import jax.numpy as jnp
        import optax
        from egotap_tpu.train.optim import make_optimizer
        cfg = Config(optimizer_type=opt_type, lr=1.0, lr_policy="cos_anneal",
                     niter=1, niter_decay=0).derive()
        tx = make_optimizer(cfg, iters_per_epoch=200)
        params = {"w": jnp.full((4,), 5.0)}
        state = tx.init(params)
        for _ in range(150):
            grads = {"w": params["w"]}   # f = 0.5 ||w||^2
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        # the learned step size must have adapted enough to make progress
        # from d0=1e-6 despite lr being left at its 1.0 default
        assert float(jnp.linalg.norm(params["w"])) < 5.0 * 0.5

    @pytest.mark.parametrize("opt_type", ["DSGD", "DAdaGrad"])
    def test_dadapt_d_estimate_grows(self, opt_type):
        import jax.numpy as jnp
        import optax
        from egotap_tpu.train.optim import make_optimizer
        cfg = Config(optimizer_type=opt_type, lr=1.0, lr_policy="cos_anneal",
                     niter=1, niter_decay=0).derive()
        tx = make_optimizer(cfg, iters_per_epoch=500)
        params = {"w": jnp.full((8,), 3.0)}
        state = tx.init(params)
        assert float(state.d) == pytest.approx(1e-6)
        for _ in range(50):
            grads = {"w": params["w"]}
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        # d must have grown from d0 toward the true distance-to-solution
        # scale, and must stay finite
        assert float(state.d) > 1e-4
        assert np.isfinite(float(state.d))

    def test_dadapt_growth_rate_caps_d(self):
        import jax.numpy as jnp
        from egotap_tpu.train.optim import dadapt_sgd
        tx = dadapt_sgd(lambda s: 1.0, growth_rate=1.5, d0=1e-6)
        params = {"w": jnp.full((4,), 5.0)}
        state = tx.init(params)
        prev_d = float(state.d)
        for _ in range(10):
            _, state = tx.update({"w": params["w"]}, state, params)
            assert float(state.d) <= prev_d * 1.5 * (1 + 1e-6)
            prev_d = float(state.d)

    def test_dadam_coupled_decay_warns(self):
        from egotap_tpu.train.optim import make_optimizer
        cfg = Config(optimizer_type="DAdam", weight_decay=0.01,
                     decouple=False).derive()
        with pytest.warns(UserWarning, match="decoupled"):
            make_optimizer(cfg, iters_per_epoch=10)

    def test_plugs_into_train_step(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from egotap_tpu.data.synthetic import synthetic_config
        from egotap_tpu.train.tasks import HeatmapTask
        cfg = synthetic_config(
            str(tmp_path / "d"), "UnrealEgo", model="heatmap_shared",
            num_heatmap=15, num_rot_heatmap=0, heatmap_type="none",
            optimizer_type="Prodigy", lr=1.0, lr_policy="cos_anneal",
            batch_size=2, niter=1, niter_decay=1, load_size_heatmap=(8, 8))
        task = HeatmapTask(cfg)
        state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1)
        batch = {
            "input_rgb": jnp.zeros((2, 2, 32, 32, 3)),
            "gt_heatmap_left": jnp.zeros((2, 8, 8, 15)),
            "gt_heatmap_right": jnp.zeros((2, 8, 8, 15)),
        }
        state, losses = task.train_step(state, batch)
        assert all(np.isfinite(float(v)) for v in losses.values())
