import os
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egotap_tpu.compat.convert import VariableBuilder, convert_pu
from egotap_tpu.models.cells import PUChain

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(name):
    """Load a golden fixture, generating it from the reference repo if
    missing (fixtures are too large to commit)."""
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        if not os.path.isdir("/root/reference"):
            pytest.skip(f"golden fixture {name} missing and no reference repo")
        subprocess.run(
            ["python", "tools/gen_golden.py"],
            cwd=os.path.join(os.path.dirname(__file__), os.pardir),
            check=True)
    data = np.load(path)
    state = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    rest = {k: data[k] for k in data.files if not k.startswith("sd/")}
    return state, rest


class TestPUChainParity:
    @pytest.fixture(scope="class")
    def fixture(self):
        return load_golden("pu_chain.npz")

    def test_chain_matches_reference_walk(self, fixture):
        state, rest = fixture
        b = VariableBuilder()
        convert_pu(state, b, "", "skelnet", num_layers=2)
        params = jax.tree.map(jnp.asarray, b.params["skelnet"])

        model = PUChain(input_size=256, bridge_size=256, hidden_size=512,
                        num_layers=2, semantics="chain")
        out = model.apply({"params": params},
                          jnp.asarray(rest["x"]), jnp.asarray(rest["bridge"]))
        np.testing.assert_allclose(np.asarray(out), rest["out"],
                                   atol=2e-5, rtol=1e-4)

    def test_tree_differs_from_chain(self, fixture):
        """Sanity check: true-tree semantics give different outputs on a
        branching skeleton (if they matched, the chain finding would be
        wrong)."""
        state, rest = fixture
        b = VariableBuilder()
        convert_pu(state, b, "", "skelnet", num_layers=2)
        params = jax.tree.map(jnp.asarray, b.params["skelnet"])

        parents = (0, 0, 1, 1, 2, 3, 4, 5, 2, 3, 8, 9, 10, 11, 12, 13)
        chain = PUChain(256, 256, 512, 2, semantics="chain")
        tree = PUChain(256, 256, 512, 2, semantics="tree", parents=parents)
        x, br = jnp.asarray(rest["x"]), jnp.asarray(rest["bridge"])
        out_c = chain.apply({"params": params}, x, br)
        out_t = tree.apply({"params": params}, x, br)
        # first two steps agree (parent == previous), later steps diverge
        np.testing.assert_allclose(np.asarray(out_t[:, :2]),
                                   np.asarray(out_c[:, :2]), atol=1e-6)
        assert not np.allclose(np.asarray(out_t), np.asarray(out_c))

    def test_init_shapes(self):
        model = PUChain(256, 256, 512, 2)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 15, 256)), jnp.zeros((1, 15, 256)))
        p = variables["params"]
        assert p["cell0"]["x2f"]["kernel"].shape == (256, 768)
        assert p["cell0"]["b2h"]["kernel"].shape == (256, 2048)
        assert p["cell1"]["x2f"]["kernel"].shape == (512, 512)
        assert "b2h" not in p["cell1"]

    def test_jit_and_grad(self, fixture):
        state, rest = fixture
        b = VariableBuilder()
        convert_pu(state, b, "", "skelnet", num_layers=2)
        params = jax.tree.map(jnp.asarray, b.params["skelnet"])
        model = PUChain(256, 256, 512, 2)

        @jax.jit
        def loss(p, x, br):
            return jnp.sum(model.apply({"params": p}, x, br) ** 2)

        g = jax.grad(loss)(params, jnp.asarray(rest["x"]),
                           jnp.asarray(rest["bridge"]))
        assert jnp.isfinite(g["cell0"]["x2h"]["kernel"]).all()
