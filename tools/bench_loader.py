"""Input-pipeline headroom proof: host-side feed rate vs the train step.

Usage: python tools/bench_loader.py [--frames 128] [--batch 32] [--skip_pack]

The fused train step consumes raw batches (uint8/f32 stereo RGB + small
pose arrays); ALL per-frame target synthesis (heatmap rendering, limb
maps, 2.5D conversions) runs on-device inside the jitted step
(data/device_render.py), so the only host-side work per step is
read + stack + device_put. This tool measures that host feed rate at
real shapes (256x256 stereo f32 frames, ~1.6 MB/frame — LARGER than the
reference's uint8 frames, so the number is conservative) on the one host
core, for both loader paths:

  npy      BatchLoader over per-frame .npy dicts (threaded pool)
  packed   PackedBatchLoader over a .egr pack (one field-major native
           mmap gather per batch; native/recordio.cc)
  packed16 same, RGB packed as float16 (pack_split rgb_dtype) — halves
           the dominant bytes
  overlap  prefetch-wrapped packed loader while the consumer burns
           ~1/TRAIN_PPS s of host work per batch — the effective rate
           the training loop sees (PrefetchLoader hides the gather)
  +put     packed loader + jax.device_put of the arrays. NOTE: on the
           CI relay every device_put is a ~37 ms tunneled RPC, so this
           number reflects the relay, NOT the PCIe-DMA feed of a real
           TPU host; read `packed`/`overlap` for loader capacity.

and reports headroom vs the measured train-step rate
(EGOTAP_TRAIN_PAIRS_PER_SEC env, default 476.9 = bench.py train, r4).
Reference comparison loop: /root/reference/dataloader/data_loader.py
(torch DataLoader, per-frame python preprocessing on host workers).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

TRAIN_PPS = float(os.environ.get("EGOTAP_TRAIN_PAIRS_PER_SEC", "476.9"))


def time_loader(loader, epochs: int, batch: int, device_put: bool = False,
                work_s: float = 0.0):
    """Pairs/s over `epochs` full passes (first pass warms the page cache /
    thread pool and is excluded). work_s simulates per-batch consumer
    compute (spin, not sleep — the host core is genuinely busy during a
    train step's dispatch + loss sync)."""
    import jax
    n = 0
    for b in loader:  # warm-up pass
        n += 1
    t0 = time.perf_counter()
    last = None
    for _ in range(epochs):
        for b in loader:
            if device_put:
                b.pop("paths", None)
                last = {k: jax.device_put(v) for k, v in b.items()}
            if work_s > 0.0:
                spin_until = time.perf_counter() + work_s
                while time.perf_counter() < spin_until:
                    pass
    if last is not None:  # drain async dispatch
        jax.block_until_ready(last)
    dt = time.perf_counter() - t0
    return epochs * n * batch / dt, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128,
                    help="train frames to generate (~1.6 MB each)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--root", default="/tmp/egotap_loader_bench")
    ap.add_argument("--skip_pack", action="store_true")
    args = ap.parse_args()

    from egotap_tpu.data.pipeline import (BatchLoader, PrefetchLoader,
                                          make_loader)
    from egotap_tpu.data.dataset import FrameDataset
    from egotap_tpu.data.synthetic import generate_dataset, synthetic_config
    from egotap_tpu.native.recordio import RecordReader, pack_split

    seqs = max(1, args.frames // 32)
    marker = os.path.join(args.root, f".gen_{seqs}x32")
    if not os.path.exists(marker):
        print(f"generating {seqs * 32} train frames at 256x256 stereo ...")
        generate_dataset(args.root, "UnrealEgo", num_sequences=seqs,
                         frames_per_seq=32, image_size=64)
        open(marker, "w").close()
    cfg = synthetic_config(args.root, batch_size=args.batch,
                           load_size_heatmap=(64, 64))

    results = {}
    ds = FrameDataset(cfg, "train")
    npy = BatchLoader(ds, args.batch, shuffle=True, drop_last=True,
                      num_threads=cfg.num_threads, seed=0)
    results["npy"], nb = time_loader(npy, args.epochs, args.batch)
    print(f"npy loader    : {results['npy']:8.1f} pairs/s "
          f"({nb} batches/epoch, {cfg.num_threads} threads)")

    if not args.skip_pack:
        if not os.path.exists(os.path.join(args.root, "packed", "train.egr")):
            pack_split(cfg, "train")
        packed = make_loader(cfg, "train")
        assert type(packed).__name__ == "PrefetchLoader", type(packed)
        raw = packed._inner  # unwrapped: the raw gather capacity
        results["packed"], _ = time_loader(raw, args.epochs, args.batch)
        print(f"packed loader : {results['packed']:8.1f} pairs/s "
              f"(raw field-major gather)")

        # f16-RGB pack: half the dominant bytes
        pack16 = os.path.join(args.root, "packed", "f16_train.egr")
        if not os.path.exists(pack16):
            import shutil
            tmp = pack_split(cfg, "train", rgb_dtype="float16")
            shutil.move(tmp, pack16)
            if os.path.exists(tmp + ".paths"):
                shutil.move(tmp + ".paths", pack16 + ".paths")
            pack_split(cfg, "train")  # restore the f32 pack
        from egotap_tpu.data.pipeline import PackedBatchLoader
        raw16 = PackedBatchLoader(RecordReader(pack16, cfg.num_threads),
                                  args.batch, shuffle=True, drop_last=True)
        results["packed16"], _ = time_loader(raw16, args.epochs, args.batch)
        print(f"packed16      : {results['packed16']:8.1f} pairs/s "
              f"(RGB as float16)")

        # effective rate with per-batch consumer work == one train step:
        # PrefetchLoader should hide the gather behind it
        work_s = args.batch / TRAIN_PPS
        eff, _ = time_loader(PrefetchLoader(raw, depth=2), args.epochs,
                             args.batch, work_s=work_s)
        bound = TRAIN_PPS  # perfect overlap runs at the compute rate
        results["overlap"] = eff
        print(f"overlap       : {eff:8.1f} pairs/s effective with "
              f"{work_s * 1e3:.0f} ms/batch consumer work "
              f"({100 * eff / bound:.0f}% of the compute-only bound)")

        results["packed+put"], _ = time_loader(
            raw, args.epochs, args.batch, device_put=True)
        import jax
        print(f"packed+put    : {results['packed+put']:8.1f} pairs/s "
              f"(device_put -> {jax.devices()[0].platform}; on the CI "
              f"relay this measures the tunnel, not PCIe)")

    feed = results.get("packed16", results["npy"])
    print(f"\ntrain step    : {TRAIN_PPS:8.1f} pairs/s "
          f"(EGOTAP_TRAIN_PAIRS_PER_SEC)")
    print(f"headroom      : {feed / TRAIN_PPS:8.2f}x raw feed "
          f"({'OK >= 2x' if feed >= 2 * TRAIN_PPS else 'LOW — deepen prefetch'})"
          f"; overlap eff. {results.get('overlap', float('nan')) / TRAIN_PPS:.2f}x")


if __name__ == "__main__":
    main()
