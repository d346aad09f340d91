"""One-command MPJPE validation against released EgoTAP weights.

North-star check (BASELINE.md): "MPJPE within 1 mm of released UnrealEgo
weights". Released weights/data are not provisioned in the build
environment, so this tool makes provisioning the ONLY missing input: point
it at the release ``.pth`` triple (README.md:79-88 of the reference:
best_net_HeatMap / best_net_RotHeatMap / best_net_AutoEncoder) and a
reprocessed dataset directory, and it

  1. converts the checkpoints (pure-python .pth reader, no torch),
  2. runs the full f32 test-split evaluation (the reference test.py:21-80
     flow: per-sample MPJPE / PA-MPJPE in mm),
  3. prints the metric table and, when --expected_mpjpe is given (the
     paper's number or one minted by running the reference), asserts the
     |diff| <= --tolerance_mm (default 1.0).

On a mismatch, localize per layer with tools/diff_activations.py.

Usage:
  python tools/validate_released.py \
      --weights_dir /path/to/unrealego_release \
      --data_dir /path/to/UnrealEgoData \
      [--preset UnrealEgo] [--expected_mpjpe N] [--expected_pa_mpjpe N]

  python tools/validate_released.py --smoke   # self-test, no inputs needed

Smoke mode builds the actual reference networks (from /root/reference,
torch on CPU), saves their random-init state_dicts as real ``.pth`` files,
generates a synthetic dataset, and drives the exact same validation path
end to end — proving the converter + eval flow works before real weights
arrive.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def build_cfg(preset: str, data_dir: str, batch_size: int):
    from egotap_tpu.core.config import Config
    nh = 15 if preset == "UnrealEgo" else 17
    return Config(
        joint_preset=preset, model="egotap_autoencoder",
        num_heatmap=nh, num_rot_heatmap=nh, heatmap_type="sin",
        skel_layer="PU", ae_hidden_size=128, patched_heatmap_ae=True,
        data_dir=data_dir, default_data_path=data_dir,
        batch_size=batch_size, use_amp=False,  # f32: parity eval
    ).derive()


def build_state(cfg, task, heatmap_pth, rot_heatmap_pth, lifter_pth):
    """Converted release weights -> a LifterTask eval state."""
    import jax
    import jax.numpy as jnp
    from egotap_tpu.compat.convert import convert_heatmap_net, convert_lifter
    from egotap_tpu.compat.torch_loader import load_torch_checkpoint

    as_vars = lambda v: jax.tree.map(jnp.asarray, v)  # noqa: E731
    hv = as_vars(convert_heatmap_net(load_torch_checkpoint(heatmap_pth),
                                     cfg.model_name))
    rv = as_vars(convert_heatmap_net(load_torch_checkpoint(rot_heatmap_pth),
                                     cfg.model_name))
    lv = as_vars(convert_lifter(load_torch_checkpoint(lifter_pth)))
    state = task.init_state(jax.random.PRNGKey(0), iters_per_epoch=1,
                            heatmap_vars=hv, rot_heatmap_vars=rv)
    return state.replace(params=lv["params"],
                         batch_stats=lv.get("batch_stats", {}))


def run_validation(cfg, heatmap_pth, rot_heatmap_pth, lifter_pth,
                   expected_mpjpe=None, expected_pa_mpjpe=None,
                   tolerance_mm=1.0, max_batches=None):
    from egotap_tpu.eval.evaluate import evaluate
    from egotap_tpu.train.tasks import LifterTask

    task = LifterTask(cfg)
    state = build_state(cfg, task, heatmap_pth, rot_heatmap_pth, lifter_pth)
    metrics, _, pps = evaluate(cfg, task, state, mode="test",
                               max_batches=max_batches)
    if not metrics:
        raise SystemExit("test split is empty — check --data_dir")

    print("\n===== released-weights validation =====")
    print(f"{'metric':12s} {'ours (mm)':>12s} {'expected':>10s} {'diff':>8s}")
    ok = True
    for key, expected in (("mpjpe", expected_mpjpe),
                          ("pa_mpjpe", expected_pa_mpjpe)):
        ours = metrics.get(key)
        if ours is None:
            continue
        if expected is None:
            print(f"{key:12s} {ours:12.3f} {'-':>10s} {'-':>8s}")
        else:
            diff = abs(ours - expected)
            ok &= diff <= tolerance_mm
            print(f"{key:12s} {ours:12.3f} {expected:10.3f} {diff:8.3f}"
                  + ("" if diff <= tolerance_mm
                     else f"   FAIL (> {tolerance_mm} mm)"))
    print(f"throughput: {pps:.1f} pairs/s")
    print(json.dumps({"metrics": {k: float(v) for k, v in metrics.items()},
                      "pairs_per_sec": pps, "within_tolerance": ok}))
    if not ok:
        raise SystemExit(
            f"MPJPE deviates more than {tolerance_mm} mm from the released "
            "weights — localize per layer with tools/diff_activations.py")
    return metrics


# ---------------------------------------------------------------------------
def smoke(tmp_root: str, preset: str = "UnrealEgo"):
    """Self-test: real reference nets (random init) -> .pth -> full flow."""
    import importlib.machinery
    import types

    # the reference imports torchvision; stub it (resnet factories are
    # provided below because HeatMap_UnrealEgo_Shared calls them)
    import torch
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    tvm.__spec__ = importlib.machinery.ModuleSpec("torchvision.models", None)
    tv.__version__ = "0.15.0"
    tv.models = tvm
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tvm)
    sys.path.insert(0, "/root/reference")
    # torchvision-compatible resnet18 twin (state_dict keys match)
    from tests.torch_twin import TorchResNet18
    tvm.resnet18 = lambda pretrained=False, **kw: TorchResNet18()

    import model.net_architecture as na

    nh = 15 if preset == "UnrealEgo" else 17
    opt = argparse.Namespace(
        joint_preset=preset, ae_hidden_size=128, heatmap_type="sin",
        num_heatmap=nh, num_rot_heatmap=nh,
        estimate_head=(preset == "UnrealEgo"), patched_heatmap_ae=True,
        skel_layer="PU", load_size_heatmap=[64, 64], model="resnet18",
        init_ImageNet=False)

    os.makedirs(tmp_root, exist_ok=True)
    torch.manual_seed(0)
    paths = {}
    # the reference builds pos/rot nets from mutated opt copies
    # (egotap_autoencoder_model.py:104-107)
    opt.num_rot_heatmap = 0
    pos_net = na.HeatMap_UnrealEgo_Shared(opt, input_channel_scale=2)
    opt.num_rot_heatmap, opt.num_heatmap = nh, 0
    rot_net = na.HeatMap_UnrealEgo_Shared(opt, input_channel_scale=2)
    opt.num_heatmap = nh
    lifter = na.EgoTAPAutoEncoder(opt, input_channel_scale=2)
    for name, net in (("HeatMap", pos_net), ("RotHeatMap", rot_net),
                      ("AutoEncoder", lifter)):
        p = os.path.join(tmp_root, f"best_net_{name}.pth")
        torch.save(net.state_dict(), p)
        paths[name] = p

    from egotap_tpu.data.synthetic import generate_dataset
    data_dir = os.path.join(tmp_root, "data")
    generate_dataset(data_dir, preset, num_sequences=1, frames_per_seq=4,
                     image_size=64)

    cfg = build_cfg(preset, data_dir, batch_size=4)
    cfg.default_data_path = "./SyntheticData"  # synthetic list-file token
    metrics = run_validation(cfg, paths["HeatMap"], paths["RotHeatMap"],
                             paths["AutoEncoder"], max_batches=1)
    assert all(v == v for v in metrics.values()), metrics  # finite
    print("smoke OK — validation flow runs end to end")

    # reverse direction: JAX -> reference .pth export must strict-load
    # into the real reference nets with every forwarded tensor bit-equal
    # (compat/export.py; the unused fc / cls_token / pooler tensors are
    # synthesized zeros and excluded from the value check)
    import numpy as np
    from egotap_tpu.compat.convert import convert_heatmap_net, convert_lifter
    from egotap_tpu.compat.export import export_heatmap_net, export_lifter
    from egotap_tpu.compat.torch_loader import load_torch_checkpoint
    synthesized = ("backbone.fc.", "cls_token", "pooler.")
    for name, net, conv, exp in (
            ("HeatMap", pos_net, convert_heatmap_net, export_heatmap_net),
            ("RotHeatMap", rot_net, convert_heatmap_net, export_heatmap_net),
            ("AutoEncoder", lifter, convert_lifter, export_lifter)):
        sd = load_torch_checkpoint(paths[name])
        exported = exp(conv(sd))
        missing, unexpected = net.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in exported.items()}, strict=True)
        assert not missing and not unexpected, (name, missing, unexpected)
        for k, v in net.state_dict().items():
            if any(s in k for s in synthesized):
                continue
            ref = np.asarray(sd[k])
            got = v.detach().cpu().numpy()
            assert np.array_equal(ref.astype(got.dtype), got), \
                f"{name}: exported tensor differs at {k}"
    print("smoke OK — reverse export strict-loads bit-equal into the "
          "reference nets")


def main():
    ap = argparse.ArgumentParser(
        description="Validate converted released EgoTAP weights (MPJPE "
                    "parity, target <= 1 mm)")
    ap.add_argument("--weights_dir", help="dir holding best_net_*.pth")
    ap.add_argument("--heatmap_pth")
    ap.add_argument("--rot_heatmap_pth")
    ap.add_argument("--lifter_pth")
    ap.add_argument("--data_dir")
    ap.add_argument("--preset", default="UnrealEgo",
                    choices=["UnrealEgo", "EgoCap"])
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--expected_mpjpe", type=float, default=None,
                    help="released-weights MPJPE (mm) to compare against")
    ap.add_argument("--expected_pa_mpjpe", type=float, default=None)
    ap.add_argument("--tolerance_mm", type=float, default=1.0)
    ap.add_argument("--max_batches", type=int, default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="self-test on synthetic weights + data")
    args = ap.parse_args()

    if args.smoke:
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            smoke(d, args.preset)
        return

    if args.weights_dir:
        args.heatmap_pth = args.heatmap_pth or os.path.join(
            args.weights_dir, "best_net_HeatMap.pth")
        args.rot_heatmap_pth = args.rot_heatmap_pth or os.path.join(
            args.weights_dir, "best_net_RotHeatMap.pth")
        args.lifter_pth = args.lifter_pth or os.path.join(
            args.weights_dir, "best_net_AutoEncoder.pth")
    for p in (args.heatmap_pth, args.rot_heatmap_pth, args.lifter_pth):
        if not p or not os.path.isfile(p):
            raise SystemExit(f"missing checkpoint: {p!r} (use --weights_dir "
                             "or the three --*_pth flags)")
    if not args.data_dir:
        raise SystemExit("--data_dir required (reprocessed dataset root)")

    cfg = build_cfg(args.preset, args.data_dir, args.batch_size)
    run_validation(cfg, args.heatmap_pth, args.rot_heatmap_pth,
                   args.lifter_pth, args.expected_mpjpe,
                   args.expected_pa_mpjpe, args.tolerance_mm,
                   args.max_batches)


if __name__ == "__main__":
    main()
