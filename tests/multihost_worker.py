"""Subprocess worker for the real 2-process jax.distributed integration
test (tests/test_multihost_distributed.py). Not collected by pytest.

Each process initializes the distributed runtime via
`parallel.mesh.initialize_multihost`, loads its shard of a synthetic
dataset through `data.pipeline.make_host_sharded_loader`, assembles
global arrays with `parallel.mesh.make_global_batch`, runs a jitted
global reduction over them, and exercises the evaluate-module allgather
helpers — then dumps everything to a JSON file for the parent to check.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    coord, pid, nproc, data_dir, out_path = sys.argv[1:6]
    from egotap_tpu.parallel.mesh import (initialize_multihost,
                                          make_global_batch, make_mesh)
    initialize_multihost(coord, int(nproc), int(pid))
    assert jax.process_count() == int(nproc), jax.process_count()
    assert len(jax.devices()) == 2 * int(nproc)

    import jax.numpy as jnp
    import numpy as np

    from egotap_tpu.data.pipeline import make_host_sharded_loader
    from egotap_tpu.data.synthetic import synthetic_config
    from egotap_tpu.eval.evaluate import _allgather_rows, _allgather_strings

    cfg = synthetic_config(data_dir, "UnrealEgo", model="heatmap_shared",
                           num_heatmap=15, num_rot_heatmap=0,
                           heatmap_type="none", load_size_heatmap=(16, 16),
                           batch_size=4)
    loader = make_host_sharded_loader(cfg, "validation")
    mesh = make_mesh()

    @jax.jit
    def global_sum(mask):
        return jnp.sum(mask)

    total = 0.0
    batches = 0
    for batch in loader:
        batch.pop("paths")
        gb = make_global_batch(
            {"mask": np.asarray(batch["mask"], np.float32)}, mesh)
        assert not gb["mask"].is_fully_addressable
        total += float(global_sum(gb["mask"]))
        batches += 1

    rows = _allgather_rows(
        np.full((int(pid) + 1, 2), int(pid), dtype=np.int32))
    strs = _allgather_strings(
        np.asarray([f"host{pid}-a", f"host{pid}-bb"]))

    with open(out_path, "w") as f:
        json.dump({"process_count": jax.process_count(),
                   "total": total, "batches": batches,
                   "rows": rows.tolist(),
                   "strs": [str(s) for s in strs]}, f)


if __name__ == "__main__":
    main()
