"""3D z-slab domain decomposition: sharded == single-device on the
8-device virtual CPU mesh (3D analog of test_stencil_distributed.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from helmnet_tpu.core.meshes import make_mesh3d
from helmnet_tpu.distributed.slab3d import (
    make_sharded_residual3d,
    make_sharded_residual_norm3d,
    slab_put,
)
from helmnet_tpu.ops.spectral3d import (
    helmholtz_residual3d,
    make_operator3d,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh3d(data=2, z=4)


class TestSlab3D:
    @pytest.mark.parametrize("method", ["transpose", "scatter", "overlap"])
    def test_sharded_residual_equals_single_device(self, mesh, method):
        n = 24
        op = make_operator3d(n, n, n, 4, 2.0, 1.0)
        rng = np.random.default_rng(11)
        u = rng.standard_normal((2, n, n, n, 2)).astype(np.float32)
        k_sq = rng.uniform(0.5, 1.2, (2, n, n, n)).astype(np.float32)
        src = rng.standard_normal((2, n, n, n, 2)).astype(np.float32)

        expected = np.asarray(
            helmholtz_residual3d(op, u, k_sq, src, "matmul")
        )
        residual = make_sharded_residual3d(mesh, op, method=method)
        u_s, k_s, s_s = slab_put(
            mesh, (jnp.asarray(u), jnp.asarray(k_sq), jnp.asarray(src))
        )
        got = np.asarray(residual(u_s, k_s, s_s))
        # the distributed z-matmul reduces partial products in a different
        # order than the single-device einsum; f32 reassociation only
        scale = np.abs(expected).max()
        np.testing.assert_allclose(got, expected, atol=1e-5 * scale)

    def test_sharded_norm(self, mesh):
        rng = np.random.default_rng(12)
        res = rng.standard_normal((2, 16, 16, 16, 2)).astype(np.float32)
        norm_fn = make_sharded_residual_norm3d(mesh)
        got = np.asarray(norm_fn(slab_put(mesh, jnp.asarray(res))))
        expected = np.sqrt((res**2).mean(axis=(1, 2, 3, 4)))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_gspmd_rollout3d_sharded(self, mesh):
        """The full learned 3D rollout under plain GSPMD z-slab sharding
        (XLA partitions convs/matmuls, inserting halos + collectives)
        matches the single-device trajectory."""
        import dataclasses

        from helmnet_tpu.core.config import Config
        from helmnet_tpu.models import hybridnet3d
        from helmnet_tpu.ops.spectral3d import point_source_map3d
        from helmnet_tpu.solvers.iterative3d import rollout3d

        n = 16
        cfg = Config()
        cfg = cfg.replace(
            geometry=dataclasses.replace(
                cfg.geometry, domain_size=n, pml_size=4
            ),
            model=dataclasses.replace(
                cfg.model, depth=2, state_depth=2, features=4,
                state_channels=2, in_channels=7,
            ),
        )
        op = make_operator3d(n, n, n, 4, 2.0, cfg.k0)
        params = hybridnet3d.init_params(jax.random.PRNGKey(0), cfg.model)
        rng = np.random.default_rng(13)
        sos = rng.uniform(1.0, 1.5, (2, n, n, n)).astype(np.float32)
        src = np.stack(
            [point_source_map3d(n, n, n, (n - 6, n // 2, n // 2), 10.0)] * 2
        )

        def run(sos_a, src_a):
            return rollout3d(
                params, op, src_a, sos_a, cfg=cfg, num_iterations=3,
                collect=("rmse",),
            )["rmse"]

        ref = np.asarray(jax.jit(run)(jnp.asarray(sos), jnp.asarray(src)))
        sos_s = jax.device_put(
            jnp.asarray(sos), NamedSharding(mesh, P("data", "z", None, None))
        )
        src_s = jax.device_put(
            jnp.asarray(src),
            NamedSharding(mesh, P("data", "z", None, None, None)),
        )
        got = np.asarray(jax.jit(run)(sos_s, src_s))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-6)
