"""Run the complete two-stage pipeline end to end on a synthetic dataset.

Reproduces the reference's full workflow through the real CLIs
(scripts/train/Heatmap/{Joint,Limb} -> scripts/train/PoseEstimator ->
scripts/test): trains the joint and limb heatmap estimators, trains the
lifter on the frozen pretrained nets via the sibling-dir convention, then
runs the test CLI and checks the artifacts. Useful as a hardware
integration check (takes ~20-40 min on the CI TPU, relay compiles
dominating).

    python tools/e2e_pipeline.py [--workdir /tmp/e2e] [--res 64]
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def run(args):
    print("+", " ".join(args), flush=True)
    subprocess.run(args, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/egotap_e2e")
    ap.add_argument("--res", type=int, default=64,
                    help="heatmap resolution (RGB is 4x)")
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--batch_size", type=int, default=32)
    args = ap.parse_args()

    data = os.path.join(args.workdir, "data")
    logd = os.path.join(args.workdir, "log")
    resd = os.path.join(args.workdir, "results")

    from egotap_tpu.data.synthetic import generate_dataset
    if not os.path.exists(os.path.join(data, "train.txt")):
        generate_dataset(data, "UnrealEgo", num_sequences=1,
                         frames_per_seq=args.frames, image_size=args.res)

    common = [
        "--data_dir", data, "--default_data_path", "./SyntheticData",
        "--load_size_heatmap", str(args.res), str(args.res),
        "--batch_size", str(args.batch_size), "--niter", "1",
        "--niter_decay", "0", "--lr", "1e-4", "--use_amp", "true",
        "--log_dir", logd, "--result_dir", resd,
    ]
    py = [sys.executable, "-m"]

    run(py + ["egotap_tpu.cli.train", "--model", "heatmap_shared",
              "--num_heatmap", "15", "--num_rot_heatmap", "0",
              "--heatmap_type", "none", "--experiment_name", "hm_pos"]
        + common)
    run(py + ["egotap_tpu.cli.train", "--model", "heatmap_shared",
              "--num_heatmap", "0", "--num_rot_heatmap", "15",
              "--heatmap_type", "sin", "--experiment_name", "hm_sin"]
        + common)

    lifter = ["--model", "egotap_autoencoder", "--num_heatmap", "15",
              "--num_rot_heatmap", "15", "--heatmap_type", "sin",
              "--skel_layer", "PU", "--ae_hidden_size", "128",
              "--patched_heatmap_ae", "true",
              "--path_to_trained_heatmap",
              os.path.join(logd, "hm", "best.pth"),
              "--experiment_name", "egotap_full"]
    run(py + ["egotap_tpu.cli.train"] + lifter
        + ["--optimizer_type", "AdamW", "--lr_policy", "cos_anneal_warmup"]
        + common)
    run(py + ["egotap_tpu.cli.test"] + lifter + common)

    for f in ("detail_result.txt", "categorical_result.txt",
              "pred_pose.npy", "input_paths.pkl"):
        path = os.path.join(resd, "egotap_full", f)
        assert os.path.exists(path), f"missing artifact {path}"
        print("artifact ok:", path)
    print("pipeline complete")


if __name__ == "__main__":
    main()
