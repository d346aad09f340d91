import numpy as np
import pytest
import torch

import jax.numpy as jnp

from egotap_tpu.core.skeleton import get_skeleton
from egotap_tpu.eval.metrics import (
    MetricAccumulator, RunningAverage, RunningAverageStd, pose_metrics)
from egotap_tpu.ops.procrustes import similarity_align
from egotap_tpu.train import losses


def _torch_similarity_align(S1, S2):
    """Oracle transcription of the reference batched Procrustes
    (utils/util.py:328-379)."""
    S1 = torch.from_numpy(S1).permute(0, 2, 1)
    S2 = torch.from_numpy(S2).permute(0, 2, 1)
    mu1 = S1.mean(dim=-1, keepdim=True)
    mu2 = S2.mean(dim=-1, keepdim=True)
    X1, X2 = S1 - mu1, S2 - mu2
    var1 = (X1 ** 2).sum(dim=1).sum(dim=1)
    K = X1.bmm(X2.permute(0, 2, 1))
    U, s, V = torch.svd(K)
    Z = torch.eye(3).unsqueeze(0).repeat(K.shape[0], 1, 1)
    Z[:, -1, -1] *= torch.sign(torch.det(U.bmm(V.permute(0, 2, 1))))
    R = V.bmm(Z.bmm(U.permute(0, 2, 1)))
    scale = torch.stack([torch.trace(x) for x in R.bmm(K)]) / var1
    t = mu2 - scale[:, None, None] * R.bmm(mu1)
    out = scale[:, None, None] * R.bmm(S1) + t
    return out.permute(0, 2, 1).numpy()


class TestProcrustes:
    def test_matches_torch_oracle(self, rng):
        S1 = rng.normal(size=(8, 16, 3)).astype(np.float32)
        S2 = rng.normal(size=(8, 16, 3)).astype(np.float32)
        want = _torch_similarity_align(S1, S2)
        got = np.asarray(similarity_align(jnp.asarray(S1), jnp.asarray(S2)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_perfect_alignment_under_similarity(self, rng):
        S2 = rng.normal(size=(4, 16, 3)).astype(np.float64)
        # S1 = rotated/scaled/translated S2 -> alignment recovers S2
        theta = 0.7
        R = np.array([[np.cos(theta), -np.sin(theta), 0],
                      [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
        S1 = 2.5 * S2 @ R.T + np.array([1.0, -2.0, 3.0])
        got = np.asarray(similarity_align(jnp.asarray(S1), jnp.asarray(S2)))
        np.testing.assert_allclose(got, S2, atol=1e-4)

    def test_reflection_handling(self, rng):
        S2 = rng.normal(size=(2, 16, 3)).astype(np.float32)
        S1 = (S2 * np.array([1, 1, -1.0])).astype(np.float32)  # mirrored
        got = np.asarray(similarity_align(jnp.asarray(S1), jnp.asarray(S2)))
        want = _torch_similarity_align(S1, S2)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestLosses:
    def test_mpjpe_matches_torch(self, rng):
        a = rng.normal(size=(4, 16, 3)).astype(np.float32)
        b = rng.normal(size=(4, 16, 3)).astype(np.float32)
        want = torch.linalg.norm(torch.from_numpy(b) - torch.from_numpy(a),
                                 dim=-1).mean().item()
        got = float(losses.mpjpe(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(want, rel=1e-6)

    @pytest.mark.parametrize("preset,estimate_head", [
        ("UnrealEgo", True), ("EgoCap", False)])
    def test_cos_sim_matches_torch(self, rng, preset, estimate_head):
        sk = get_skeleton(preset)
        nj = sk.num_joints if estimate_head else sk.num_joints - 1
        pred = rng.normal(size=(4, nj, 3)).astype(np.float32)
        gt = rng.normal(size=(4, nj, 3)).astype(np.float32)

        # torch oracle per reference utils/loss.py:54-77
        tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
        if not estimate_head:
            z = torch.zeros((4, 1, 3))
            tp = torch.cat([z, tp], dim=1)
            tg = torch.cat([z, tg], dim=1)
        par = list(sk.parents)
        bv_p = (tp - tp[:, par, :])[:, 1:, :]
        bv_g = (tg - tg[:, par, :])[:, 1:, :]
        cos = torch.nn.CosineSimilarity(dim=2)(bv_p, bv_g)
        if not estimate_head:
            cos = cos[:, 1:]
        want = torch.mean(torch.sum(cos, dim=1), dim=0).item()

        got = float(losses.cos_sim(jnp.asarray(pred), jnp.asarray(gt),
                                   sk.parents_array(),
                                   estimate_head=estimate_head))
        assert got == pytest.approx(want, rel=1e-5)

    def test_limb_heatmap_mse_matches_reference_formula(self, rng):
        pred = rng.normal(size=(2, 64, 64, 30)).astype(np.float32)
        gt = rng.normal(size=(2, 64, 64, 30)).astype(np.float32)
        pl = rng.uniform(1, 60, size=(2, 30)).astype(np.float32)
        want = np.mean(((pred - gt) / np.sqrt(pl)[:, None, None, :]) ** 2)
        got = float(losses.limb_heatmap_mse(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(pl)))
        assert got == pytest.approx(float(want), rel=1e-5)


class TestMetrics:
    def test_pose_metrics_shapes_and_units(self, rng):
        pred = rng.normal(size=(6, 16, 3)).astype(np.float32)
        gt = pred + 0.1  # 1 mm offset in cm units
        m = pose_metrics(jnp.asarray(pred), jnp.asarray(gt))
        assert m["mpjpe"].shape == (6,)
        np.testing.assert_allclose(np.asarray(m["mpjpe"]),
                                   np.sqrt(3) * 0.1 * 10, rtol=1e-4)
        # PA-aligned error should be <= raw error (here ~0, offset removed)
        assert np.all(np.asarray(m["pa_mpjpe"]) <= np.asarray(m["mpjpe"]) + 1e-4)

    def test_running_average(self, rng):
        vals = rng.normal(size=100)
        ra = RunningAverage()
        for chunk in np.split(vals, 10):
            ra.update(chunk)
        assert ra.mean == pytest.approx(vals.mean())
        assert ra.count == 100

    def test_running_std(self, rng):
        vals = rng.normal(size=50)
        rs = RunningAverageStd()
        rs.update(vals)
        assert rs.mean == pytest.approx(vals.mean())
        assert rs.std == pytest.approx(vals.std(ddof=1), rel=1e-6)

    def test_accumulator_with_mask(self):
        acc = MetricAccumulator()
        acc.update({"mpjpe": np.array([1.0, 2.0, 99.0])},
                   mask=np.array([1, 1, 0]))
        acc.update({"mpjpe": np.array([3.0])})
        assert acc.means()["mpjpe"] == pytest.approx(2.0)
        assert acc.count == 3


def test_l1_regularizer():
    import jax.numpy as jnp
    from egotap_tpu.train.losses import l1_regularizer
    params = {"a": jnp.array([1.0, -2.0]), "b": {"w": jnp.array([[3.0]])}}
    assert float(l1_regularizer(params)) == 6.0
