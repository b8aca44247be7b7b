"""Worker process for the 2-process CPU multihost test.

Launched by tests/test_multihost.py as:
    python tests/multihost_worker.py <process_id> <num_processes> <port> <ckpt_dir>

Each process owns 4 virtual CPU devices; together they form one 8-device
cluster. The worker builds the hybrid (data=8) mesh, runs one
deterministic sharded train step (all seeds fixed), prints the loss,
then exercises the sharded orbax save/restore roundtrip.
"""

import os
import sys


def main():
    pid, nproc, port, ckpt_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from helmnet_tpu.distributed import multihost

    multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from helmnet_tpu.core.config import ParallelConfig
    from helmnet_tpu.core.meshes import make_mesh
    from helmnet_tpu.data.ellipses import make_dataset
    from helmnet_tpu.distributed.multihost import fetch_global, put_global
    from helmnet_tpu.train.loop import Trainer
    from helmnet_tpu.train.replay import ExperienceBatch
    from tests.test_training import tiny_config

    mesh = make_mesh(ParallelConfig(data=8))
    print(f"[worker {pid}] mesh devices across processes:",
          sorted({d.process_index for d in mesh.devices.ravel()}), flush=True)

    cfg = tiny_config()
    maps = make_dataset(8, 32, seed=0)
    t = Trainer(cfg)  # identical seeds on every process
    t.fill_buffer(maps)
    batch = t.buffer.sample(8)

    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))
    params = jax.tree.map(lambda a: put_global(a, rep), t.params)
    opt_state = jax.tree.map(lambda a: put_global(a, rep), t.opt_state)
    op = jax.tree.map(lambda a: put_global(a, rep), t.op)
    dev_batch = ExperienceBatch(
        *[put_global(a, dat) for a in batch[:-1]],
        put_global(batch.indices, rep),
    )
    params, opt_state, metrics, _ = t._train_step(
        params, opt_state, op, dev_batch, 1
    )
    loss = float(fetch_global(metrics["loss"]))
    print(f"[worker {pid}] LOSS {loss:.9e}", flush=True)

    # ---- sharded orbax save/restore roundtrip (DCN-spanning arrays) ----
    from helmnet_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    save_checkpoint(ckpt_dir, 0, {"params": params})
    multihost.barrier("saved")
    template = jax.tree.map(
        lambda a: jnp.zeros_like(put_global(np.zeros(a.shape, a.dtype), rep)),
        {"params": params},
    )
    back = restore_checkpoint(ckpt_dir, 0, template, sharded=True)
    ref = fetch_global(params["outc"]["b"])
    got = fetch_global(back["params"]["outc"]["b"])
    np.testing.assert_allclose(got, ref, atol=0)
    print(f"[worker {pid}] CKPT_ROUNDTRIP_OK", flush=True)

    # ---- spatial-DD stencil residual on the cross-host hybrid mesh ----
    # batch over DCN (the production layout), y/x halo exchange within
    # hosts; result must equal the single-device reference bit-exactly
    from helmnet_tpu.distributed.halo import make_sharded_stencil_residual
    from helmnet_tpu.ops import stencil

    mesh2 = make_mesh(ParallelConfig(data=2, y=2, x=2))
    st = stencil.make_stencil_operator(32, 32, 4, 2.0, 1.0, order=2)
    rng = np.random.default_rng(0)
    u = rng.standard_normal((2, 32, 32, 2)).astype(np.float32)
    ksq = np.ones((2, 32, 32), np.float32)
    srcm = np.zeros((2, 32, 32, 2), np.float32)
    want = np.asarray(stencil.helmholtz_residual_stencil(
        st, jnp.asarray(u), jnp.asarray(ksq), jnp.asarray(srcm)))
    sh4 = NamedSharding(mesh2, P("data", "y", "x", None))
    sh3 = NamedSharding(mesh2, P("data", "y", "x"))
    residual2 = make_sharded_stencil_residual(mesh2, st)
    got2 = fetch_global(residual2(
        put_global(u, sh4), put_global(ksq, sh3), put_global(srcm, sh4)))
    np.testing.assert_allclose(got2, want, rtol=1e-6, atol=1e-6)
    print(f"[worker {pid}] SPATIAL_DD_OK", flush=True)


if __name__ == "__main__":
    main()
