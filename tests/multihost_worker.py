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


if __name__ == "__main__":
    main()
