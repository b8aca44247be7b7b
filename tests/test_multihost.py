"""Real 2-process CPU cluster: jax.distributed.initialize + hybrid mesh +
sharded train step + sharded orbax checkpointing (the multi-host path the
reference covers with Lightning DDP, train.py:14-25)."""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helmnet_tpu.data.ellipses import make_dataset
from helmnet_tpu.train.loop import Trainer
from helmnet_tpu.train.replay import ExperienceBatch
from tests.test_training import tiny_config

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference_loss() -> float:
    """The same deterministic step the workers run, single-process."""
    cfg = tiny_config()
    maps = make_dataset(8, 32, seed=0)
    t = Trainer(cfg)
    t.fill_buffer(maps)
    batch = t.buffer.sample(8)
    dev_batch = ExperienceBatch(*[jnp.asarray(a) for a in batch])
    _, _, metrics, _ = t._train_step(t.params, t.opt_state, t.op, dev_batch, 1)
    return float(metrics["loss"])


class TestMultihost:
    def test_two_process_cluster(self, tmp_path):
        """Two real OS processes form one 8-device cluster; the sharded
        train-step loss matches the single-process value bit-for-tolerance,
        and the cross-host orbax roundtrip succeeds."""
        port = _free_port()
        env = dict(os.environ)
        # the axon sitecustomize initializes a PJRT backend at interpreter
        # start, which breaks jax.distributed.initialize — disable it
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            PYTHONPATH=os.path.abspath(ROOT),
        )
        ckpt_dir = str(tmp_path / "ckpt")
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.join(ROOT, "tests", "multihost_worker.py"),
                 str(pid), "2", str(port), ckpt_dir],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env,
            )
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {pid} failed:\n{out}"
            assert "CKPT_ROUNDTRIP_OK" in out, out
            assert "SPATIAL_DD_OK" in out, out

        losses = []
        for out in outs:
            for line in out.splitlines():
                if "LOSS" in line:
                    losses.append(float(line.split("LOSS")[1]))
        assert len(losses) == 2, outs
        ref = _reference_loss()
        for l in losses:
            assert l == pytest.approx(ref, rel=1e-5), (losses, ref)
