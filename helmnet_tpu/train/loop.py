"""Unsupervised physics-residual training loop.

Reproduces the reference training scheme (hybridnet.py:385-505) the TPU way:

* truncated BPTT: sample partially-solved problems from the replay buffer,
  unroll `unrolling_steps` learned updates under grad, loss = amplify *
  mean(residuals^2) over all unrolled steps;
* curriculum: experiences may only evolve up to min(slope*epoch+1, max_iter)
  solver iterations before being restarted from a fresh sos map;
* re-admission gate: evolved experiences return to their buffer slot only if
  mean(res^2) < 1 (divergence guard), else the slot restarts at iteration 0;
* Adam(0.9, 0.95) + L2 weight decay + grad value-clipping 1.0 +
  ReduceLROnPlateau(factor .5, patience 10) on the epoch-mean train loss.

The jitted train_step is data-parallel: pass a mesh and batches are sharded
over the 'data' axis; XLA inserts the gradient all-reduce (replacing the
reference's Lightning DDP/NCCL, train.py:14-25).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import Config
from ..core.meshes import shard_batch  # noqa: F401  (public re-export)
from ..models import hybridnet
from ..models.registry import get_architecture
from ..ops.source import line_source_map, point_source_map
from ..ops.spectral import helmholtz_residual, make_operator
from ..solvers.iterative import (
    SolverCarry,
    get_initials,
    n_steps,
    residual_rmse,
    rollout,
)
from .replay import ExperienceBatch, ReplayBuffer


def resolve_epoch_cap(
    start_epoch: int,
    max_epochs: int,
    *,
    warm_started: bool = False,
    epoch_budget: Optional[int] = None,
) -> int:
    """Absolute epoch at which a run driver should stop.

    Resumes of an interrupted run keep the ABSOLUTE `max_epochs` cap (the
    run simply continues toward its original budget). A warm start
    (--init-from) is a NEW run that inherits the source checkpoint's epoch
    counter only for curriculum/bookkeeping continuity — so its cap is a
    BUDGET measured from the restored counter. An explicit `epoch_budget`
    always wins (needed to RESUME a warm-started run, where the driver can
    no longer tell it was warm-started).

    Lesson from the tpu_r3d negative result (TRAINING_r3d.md): warm-starting
    from r3a restored epoch≈950 under the absolute 1000 cap, truncating the
    planned re-anneal to ~50 high-lr epochs.
    """
    if epoch_budget is not None:
        return start_epoch + epoch_budget
    if warm_started:
        return start_epoch + max_epochs
    return max_epochs


def shard_experience(mesh, batch):
    """Domain-partitioned placement of an ExperienceBatch on the
    (data, y, x) mesh: field arrays [B, H, W, C] shard over
    (data, y, x), k_sq [B, H, W] likewise, the flat recurrent states
    [B, C, L] and per-slot iteration counters over data only (the flat
    state packing interleaves per-depth grids, so a spatial split of L
    is not meaningful — the network's scan carries reshape them
    per-level inside the step, where GSPMD re-partitions freely)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..distributed.multihost import put_global

    sp4 = NamedSharding(mesh, P("data", "y", "x", None))
    sp3 = NamedSharding(mesh, P("data", "y", "x"))
    d1 = NamedSharding(mesh, P("data"))
    return batch._replace(
        wavefield=put_global(batch.wavefield, sp4),
        residual=put_global(batch.residual, sp4),
        source=put_global(batch.source, sp4),
        k_sq=put_global(batch.k_sq, sp3),
        states=put_global(batch.states, d1),
        iteration=put_global(batch.iteration, d1),
    )


def make_optimizer(cfg: Config):
    """torch-Adam-equivalent: clip grads by value, L2 into grads, Adam."""
    t = cfg.training
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip(t.gradient_clip) if t.gradient_clip > 0 else optax.identity(),
            optax.add_decayed_weights(t.weight_decay),
            optax.scale_by_adam(b1=t.adam_b1, b2=t.adam_b2),
            optax.scale(-learning_rate),
        )
    )(learning_rate=t.learning_rate)


class PlateauScheduler:
    """ReduceLROnPlateau(min, factor, patience) — hybridnet.py:270-283."""

    def __init__(self, lr: float, factor: float, patience: int, min_lr: float):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


class Trainer:
    """Owns params/opt state, replay buffer, operator; runs epochs."""

    def __init__(
        self,
        cfg: Config,
        params=None,
        key=None,
        mesh=None,
        log_dir: Optional[str] = None,
        device_buffer: bool = False,
        sanitize: bool = False,
    ):
        """device_buffer=True keeps the replay buffer + sos dataset in HBM
        and fuses sample/train/write-back into one jitted call
        (train/device_buffer.py) — the TPU-native path; the host-side
        buffer remains the default for interop and tiny-memory runs.

        sanitize=True checkify-instruments the train step (core/sanitize.py):
        a NaN/inf born anywhere inside the unrolled loss/grad computation
        raises immediately with the offending primitive's location, instead
        of surfacing epochs later as a non-finite epoch loss. Debug-only —
        instrumentation blocks some XLA fusions and disables buffer
        donation."""
        self.cfg = cfg
        self.mesh = mesh
        self.device_buffer = device_buffer
        self.sanitize = sanitize
        self._dev_buf = None
        self._sos_pool = None
        key = key if key is not None else jax.random.PRNGKey(0)
        self.arch = get_architecture(cfg.model.architecture)
        self.params = (
            params if params is not None else self.arch.init_params(key, cfg.model)
        )
        g = cfg.geometry
        self.height = self.width = g.domain_size
        self.op = make_operator(
            self.height, self.width, g.pml_size, g.sigma_max, cfg.k0
        )
        s = cfg.source
        self.source_map = jnp.asarray(
            point_source_map(
                self.height, self.width, tuple(s.location), s.amplitude,
                s.phase, s.omega, 0.0, s.smoothing,
            )
        )
        t = cfg.training
        auto_sparse = (
            device_buffer
            and t.p_extended_source <= 0
            and self.height * self.width >= 256 * 256
        )
        self._sparse_sources = (
            t.sparse_source_pool
            if t.sparse_source_pool is not None
            else auto_sparse
        )
        if self._sparse_sources and t.p_extended_source > 0:
            raise ValueError(
                "sparse_source_pool stores point locations only; extended "
                "line-segment sources need the dense pool"
            )
        self.src_pool = jnp.asarray(
            self._build_source_locs()
            if self._sparse_sources
            else self._build_source_pool()
        )
        self.optimizer = make_optimizer(cfg)
        self.opt_state = self.optimizer.init(self.params)
        self.capacity = cfg.training.buffer_size
        # the host-side buffer is only materialized on the host path;
        # the device path keeps everything in HBM (train/device_buffer.py)
        self.buffer = None if device_buffer else ReplayBuffer(
            cfg.training.buffer_size,
            self.height,
            self.width,
            cfg.model.state_channels,
            self.arch.total_state_length(self.height, cfg.model),
        )
        self.rng = np.random.default_rng(0)
        self.scheduler = PlateauScheduler(
            cfg.training.learning_rate,
            cfg.training.plateau_factor,
            cfg.training.plateau_patience,
            cfg.training.minimum_learning_rate,
        )
        self.epoch = 0
        self.global_step = 0
        self.log_dir = log_dir
        self._log_file = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._log_file = open(os.path.join(log_dir, "train_log.jsonl"), "a")
            self._tb = self._make_tb_writer(log_dir)
        self.terminate_on_nan = True  # reference train.py --terminate_on_nan
        self._build_jitted_fns()

    @staticmethod
    def _make_tb_writer(log_dir):
        """TensorBoard logging (reference TensorBoardLogger, train.py:88);
        optional — uses torch's pure-python summary writer if available."""
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(os.path.join(log_dir, "tb"))
        except Exception:
            return None

    # ------------------------------------------------------------------

    def _build_jitted_fns(self):
        cfg = self.cfg
        arch = self.arch
        optimizer = self.optimizer
        num_steps = cfg.training.unrolling_steps

        def train_step(params, opt_state, op, batch: ExperienceBatch, pick):
            def loss_fn(p):
                carry = SolverCarry(
                    batch.wavefield,
                    batch.residual,
                    arch.unflatten_states(
                        batch.states, batch.wavefield.shape[1:3], cfg.model
                    ),
                )
                _, ys = n_steps(
                    p, op, batch.source, batch.k_sq, carry,
                    cfg=cfg, num_steps=num_steps,
                    remat=cfg.training.remat,
                )
                res = ys["residuals"]  # [U, B, H, W, 2]
                loss = cfg.training.loss_amplify * jnp.mean(res**2)
                return loss, ys

            (loss, ys), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            take = lambda a: jax.lax.dynamic_index_in_dim(
                a, pick, axis=0, keepdims=False
            )
            evolved = {
                "wavefield": take(ys["wavefields"]),
                "states": take(ys["states"]),
                "residual": take(ys["residuals"]),
            }
            evolved["res_sq_mean"] = jnp.mean(
                evolved["residual"] ** 2, axis=(1, 2, 3)
            )
            res = ys["residuals"]
            metrics = {
                "loss": loss,
                "rel_loss": jnp.mean(
                    jnp.sqrt(jnp.mean(res**2, axis=(2, 3, 4)))
                ),
                "grad_norm": optax.global_norm(grads),
            }
            return params, opt_state, metrics, evolved

        if self.sanitize:
            from ..core.sanitize import checked

            # Two-tier sanitizer: the fast path runs the UNinstrumented
            # step (checkify-instrumenting value_and_grad compiles
            # pathologically slowly — measured >15 min even at 16^2), and
            # only when a non-finite loss/grad appears do we replay the
            # FORWARD pass under checkify to localize the first
            # NaN/inf-producing primitive. Zero overhead when clean
            # beyond a per-step host sync; full localization on failure.
            def loss_forward(params, op, batch):
                carry = SolverCarry(
                    batch.wavefield,
                    batch.residual,
                    arch.unflatten_states(
                        batch.states, batch.wavefield.shape[1:3], cfg.model
                    ),
                )
                _, ys = n_steps(
                    params, op, batch.source, batch.k_sq, carry,
                    cfg=cfg, num_steps=num_steps,
                    remat=cfg.training.remat,
                )
                return cfg.training.loss_amplify * jnp.mean(
                    ys["residuals"] ** 2
                )

            base_step = jax.jit(train_step)  # no donation: batch replayed
            checked_fwd = checked(loss_forward, jit=True)

            def sane_step(params, opt_state, op, batch, pick):
                out = base_step(params, opt_state, op, batch, pick)
                m = out[2]
                loss = float(m["loss"])
                gn = float(m["grad_norm"])
                if not (np.isfinite(loss) and np.isfinite(gn)):
                    # raises with the primitive location if forward-born
                    checked_fwd(params, op, batch)
                    raise FloatingPointError(
                        f"non-finite training step (loss={loss}, "
                        f"grad_norm={gn}) with a finite forward pass: the "
                        "NaN/inf was produced in the BACKWARD pass (e.g. a "
                        "derivative at a non-differentiable point)"
                    )
                return out

            self._train_step = sane_step
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

        def init_experiences(op, source, sos_maps):
            """Fresh iteration-0 experiences (train_dataloader fill logic,
            hybridnet.py:199-218)."""
            k_sq, wavefield = get_initials(sos_maps, cfg.source.omega)
            states = arch.init_states(
                sos_maps.shape[0], sos_maps.shape[1:3], cfg.model
            )
            residual = helmholtz_residual(
                op, wavefield, k_sq, source, cfg.operator_mode
            )
            return {
                "wavefield": wavefield,
                "states": arch.flatten_states(states),
                "k_sq": k_sq,
                "residual": residual,
            }

        self._init_experiences = jax.jit(init_experiences)

        if self.device_buffer:
            from .device_buffer import make_device_buffer_fns

            self._init_dev_buffer, self._mega_step = make_device_buffer_fns(
                cfg, self.optimizer, sparse_sources=self._sparse_sources
            )

    # ------------------------------------------------------------------

    def _build_source_pool(self) -> np.ndarray:
        """[K, H, W, 2] candidate training sources. Index 0 is the fixed
        training source (hybridnet.py:145-156); when p_random_source > 0 the
        distinct integer circle locations of the validation protocol
        (hybridnet.py:178-190) fill the next indices; when
        p_extended_source > 0 a seeded pool of random line segments follows
        (our far-OOD curriculum — the reference trains point sources only)."""
        s = self.cfg.source
        maps = [np.asarray(self.source_map)]
        if self.cfg.training.p_random_source > 0:
            for loc in self._circle_locations():
                maps.append(
                    point_source_map(
                        self.height, self.width, loc, s.amplitude,
                        s.phase, s.omega, 0.0, s.smoothing,
                    )
                )
        self._n_point_sources = len(maps)
        if self.cfg.training.p_extended_source > 0:
            seg_rng = np.random.default_rng(4242)
            for _ in range(256):
                p0, p1 = self.random_line_endpoints(seg_rng)
                maps.append(
                    line_source_map(
                        self.height, self.width, p0, p1, s.amplitude,
                        s.phase, s.omega, 0.0, s.smoothing,
                    )
                )
        return np.stack(maps).astype(np.float32)

    def _circle_locations(self) -> list:
        """Distinct integer circle locations of the validation protocol
        (hybridnet.py:178-190) used as the random-source curriculum pool."""
        L = self.height // 2
        dL = L - self.cfg.geometry.pml_size - 2
        locs = {
            (int(L + dL * np.cos(t)), int(L + dL * np.sin(t)))
            for t in np.linspace(0, 2 * np.pi, 720, endpoint=False)
        }
        return sorted(locs)

    def _build_source_locs(self) -> np.ndarray:
        """[K, 2] int32 point-source locations (sparse pool representation):
        index 0 is the fixed training source, the rest the circle
        curriculum. Source maps are stamped on device from separable
        kernels (ops/source.point_source_kernels) — the dense pool is
        O(K*H*W) HBM, 5.6 GB at 1024^2."""
        locs = [tuple(self.cfg.source.location)]
        if self.cfg.training.p_random_source > 0:
            locs.extend(self._circle_locations())
        self._n_point_sources = len(locs)
        return np.asarray(locs, np.int32)

    def random_line_endpoints(self, rng=None):
        """Endpoints of a random interior segment: center anywhere outside
        the PML, random orientation, length uniform in [n/8, n/2]."""
        rng = rng if rng is not None else self.rng
        n = min(self.height, self.width)
        margin = self.cfg.geometry.pml_size + 4
        length = rng.uniform(n / 8, n / 2)
        theta = rng.uniform(0, np.pi)
        dr = 0.5 * length * np.sin(theta)
        dc = 0.5 * length * np.cos(theta)
        cr = rng.uniform(margin + abs(dr), self.height - margin - abs(dr))
        cc = rng.uniform(margin + abs(dc), self.width - margin - abs(dc))
        p0 = (int(round(cr - dr)), int(round(cc - dc)))
        p1 = (int(round(cr + dr)), int(round(cc + dc)))
        return p0, p1

    def _sample_src_idx(self, n: int) -> np.ndarray:
        """Per-slot source-pool indices: extended segment with probability
        p_extended_source, else a random circle source with probability
        p_random_source, else the fixed training source."""
        p_rand = self.cfg.training.p_random_source
        p_ext = self.cfg.training.p_extended_source
        k = self.src_pool.shape[0]
        if (p_rand <= 0 and p_ext <= 0) or k == 1:
            return np.zeros(n, np.int64)
        n_pt = self._n_point_sources
        idx = np.zeros(n, np.int64)
        u = self.rng.random(n)
        if p_ext > 0 and k > n_pt:
            ext = u < p_ext
            idx[ext] = self.rng.integers(n_pt, k, size=int(ext.sum()))
        else:
            ext = np.zeros(n, bool)
        if p_rand > 0 and n_pt > 1:
            circ = (~ext) & (u < p_ext + p_rand)
            idx[circ] = self.rng.integers(1, n_pt, size=int(circ.sum()))
        return idx

    def fill_buffer(self, sos_maps: np.ndarray):
        """Seed all slots with fresh problems; slot i gets starting age 10*i
        (hybridnet.py:199-218) so curriculum ages are spread out."""
        cap = self.capacity
        src_idx = self._sample_src_idx(cap)
        if self.device_buffer:
            self._sos_pool = jnp.asarray(sos_maps)
            maps = sos_maps[np.arange(cap) % len(sos_maps)]
            self._dev_buf = self._init_dev_buffer(
                self.op, self.src_pool, jnp.asarray(src_idx, jnp.int32),
                jnp.asarray(maps), jnp.arange(cap, dtype=jnp.int32) * 10,
            )
            return
        maps = sos_maps[np.arange(cap) % len(sos_maps)]
        chunk = 64
        pool_np = np.asarray(self.src_pool)
        for start in range(0, cap, chunk):
            sl = slice(start, min(start + chunk, cap))
            n = sl.stop - sl.start
            src = pool_np[src_idx[sl]]
            exp = self._init_experiences(
                self.op, jnp.asarray(src), jnp.asarray(maps[sl])
            )
            exp = jax.device_get(exp)
            self.buffer.append_batch(
                np.arange(sl.start, sl.stop),
                exp["wavefield"],
                exp["states"],
                exp["k_sq"],
                exp["residual"],
                src,
                np.arange(sl.start, sl.stop) * 10,
            )

    def max_allowed_iterations(self) -> int:
        t = self.cfg.training
        return min(self.epoch * t.curriculum_slope + 1, self.cfg.max_iterations)

    def training_epoch(self, train_maps: np.ndarray) -> dict:
        """One pass over the sos dataset (batch count = len/batch_size)."""
        if self.device_buffer:
            return self._training_epoch_device(train_maps)
        t = self.cfg.training
        bs = t.train_batch_size
        maxiter = self.max_allowed_iterations()
        num_batches = max(len(train_maps) // bs, 1)
        order = self.rng.permutation(len(train_maps))
        losses, restarts = [], 0
        tic = time.time()
        for b in range(num_batches):
            sos_batch = train_maps[order[b * bs : (b + 1) * bs]]
            batch = self.buffer.sample(bs)
            pick = int(self.rng.integers(t.unrolling_steps))
            dev_batch = ExperienceBatch(
                *[jnp.asarray(a) for a in batch[:-1]], batch.indices
            )
            if self.mesh is not None:
                dev_batch = shard_experience(self.mesh, dev_batch)
            self.params, self.opt_state, metrics, evolved = self._train_step(
                self.params, self.opt_state, self.op, dev_batch, pick
            )
            # multihost-safe fetch (allgathers cross-host shards; plain
            # device_get single-process)
            from ..distributed.multihost import fetch_global

            metrics = jax.tree.map(fetch_global, metrics)
            evolved = jax.tree.map(fetch_global, evolved)
            losses.append(float(metrics["loss"]))

            # ---- buffer write-back (hybridnet.py:427-464) ----
            new_t = batch.iteration + pick + 1
            keep = (evolved["res_sq_mean"] < 1.0) & (new_t < maxiter)
            fresh_sos = sos_batch[
                self.rng.integers(len(sos_batch), size=bs)
            ]
            fresh_src = np.asarray(self.src_pool)[self._sample_src_idx(bs)]
            fresh = jax.device_get(
                self._init_experiences(
                    self.op, jnp.asarray(fresh_src), jnp.asarray(fresh_sos)
                )
            )
            k = keep[:, None, None, None]
            src_np = np.asarray(batch.source)
            self.buffer.append_batch(
                batch.indices,
                np.where(k, evolved["wavefield"], fresh["wavefield"]),
                np.where(keep[:, None, None], evolved["states"], fresh["states"]),
                np.where(keep[:, None, None], batch.k_sq, fresh["k_sq"]),
                np.where(k, evolved["residual"], fresh["residual"]),
                np.where(k, src_np, fresh_src),
                np.where(keep, new_t, 0),
            )
            restarts += int((~keep).sum())
            self.global_step += 1

        return self._finish_epoch(losses, restarts, maxiter, tic)

    def _finish_epoch(self, losses, restarts, maxiter, tic) -> dict:
        """Shared epoch-end bookkeeping: nan guard, plateau LR, logging."""
        epoch_loss = float(np.mean(losses))
        if self.terminate_on_nan and not np.isfinite(epoch_loss):
            raise FloatingPointError(
                f"non-finite training loss at epoch {self.epoch}: {losses}"
            )
        lr = self.scheduler.step(epoch_loss)
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
        stats = {
            "epoch": self.epoch,
            "train_loss_mean": epoch_loss,
            "maxiter": maxiter,
            "new_sos": restarts,
            "lr": lr,
            "epoch_time_s": time.time() - tic,
            "global_step": self.global_step,
        }
        self._log(stats)
        if self._tb is not None:
            for k in ("train_loss_mean", "maxiter", "new_sos", "lr"):
                self._tb.add_scalar(f"train/{k}", stats[k], self.global_step)
        self.epoch += 1
        return stats

    def _training_epoch_device(self, train_maps: np.ndarray) -> dict:
        """Device-buffer epoch: host contributes RNG integers only."""
        t = self.cfg.training
        bs = t.train_batch_size
        cap = self.capacity
        maxiter = self.max_allowed_iterations()
        num_batches = max(len(train_maps) // bs, 1)
        step_metrics = []  # device scalars, fetched lazily at epoch end
        tic = time.time()
        for _ in range(num_batches):
            slot_idx = jnp.asarray(
                self.rng.choice(cap, bs, replace=False), jnp.int32
            )
            fresh_idx = jnp.asarray(
                self.rng.integers(len(self._sos_pool), size=bs), jnp.int32
            )
            fresh_src_idx = jnp.asarray(self._sample_src_idx(bs), jnp.int32)
            pick = jnp.asarray(int(self.rng.integers(t.unrolling_steps)))
            (
                self.params,
                self.opt_state,
                self._dev_buf,
                metrics,
            ) = self._mega_step(
                self.params, self.opt_state, self._dev_buf, self.op,
                self.src_pool, self._sos_pool, slot_idx, fresh_idx,
                fresh_src_idx, pick, jnp.asarray(maxiter),
            )
            step_metrics.append(metrics)
            self.global_step += 1
        fetched = jax.device_get(step_metrics)
        losses = [float(m["loss"]) for m in fetched]
        restarts = int(sum(int(m["restarts"]) for m in fetched))
        return self._finish_epoch(losses, restarts, maxiter, tic)

    # ------------------------------------------------------------------

    def random_circle_location(self) -> tuple[int, int]:
        """Random source on a circle (hybridnet.py:178-190)."""
        theta = 2 * np.pi * self.rng.random()
        L = self.height // 2
        dL = L - self.cfg.geometry.pml_size - 2
        return (int(L + dL * np.cos(theta)), int(L + dL * np.sin(theta)))

    def make_val_sources(
        self, n: int, seed: int = 1234, extended_frac: float = 0.0
    ) -> np.ndarray:
        """Fixed random-circle validation sources [n, H, W, 2]: a dedicated
        seed keeps the set identical across epochs so in-run top-k selection
        compares checkpoints on the same problems (eval protocol parity).
        `extended_frac` > 0 replaces that fraction (the first entries) with
        seeded random line segments so selection also scores the
        extended-source regime the far-OOD problems live in."""
        s = self.cfg.source
        rng = np.random.default_rng(seed)
        L = self.height // 2
        dL = L - self.cfg.geometry.pml_size - 2
        n_ext = int(round(n * extended_frac))
        out = []
        for _ in range(n_ext):
            p0, p1 = self.random_line_endpoints(rng)
            out.append(
                line_source_map(
                    self.height, self.width, p0, p1, s.amplitude, s.phase,
                    s.omega, 0.0, s.smoothing,
                )
            )
        for _ in range(n - n_ext):
            th = 2 * np.pi * rng.random()
            loc = (int(L + dL * np.cos(th)), int(L + dL * np.sin(th)))
            out.append(
                point_source_map(
                    self.height, self.width, loc, s.amplitude, s.phase,
                    s.omega, 0.0, s.smoothing,
                )
            )
        return np.stack(out).astype(np.float32)

    def validate(
        self, val_maps: np.ndarray, num_iterations=None, batch=8, sources=None
    ) -> dict:
        """Full rollouts from random circle sources; terminal residual RMSE
        (hybridnet.py:333-376). Pass `sources` [N, H, W, 2] for a fixed
        validation set (comparable val_loss across epochs)."""
        s = self.cfg.source
        iters = num_iterations or self.cfg.max_iterations
        rmses = []
        first_wavefields = None  # decimated trajectory for TB images
        for start in range(0, len(val_maps), batch):
            maps = val_maps[start : start + batch]
            if sources is not None:
                src = np.asarray(sources[start : start + batch])
            else:
                locs = [self.random_circle_location() for _ in range(len(maps))]
                src = np.stack(
                    [
                        point_source_map(
                            self.height, self.width, loc, s.amplitude, s.phase,
                            s.omega, 0.0, s.smoothing,
                        )
                        for loc in locs
                    ]
                )
            # first batch also collects a decimated wavefield trajectory so
            # TB gets the reference's val/20-step/terminal image set
            # (hybridnet.py:416-424, 507-520)
            want_traj = (
                self._tb is not None and start == 0
                and iters % 20 == 0 and iters >= 20
            )
            out = rollout(
                self.params,
                self.op,
                jnp.asarray(src),
                jnp.asarray(maps),
                cfg=self.cfg,
                num_iterations=iters,
                collect=("rmse", "wavefields") if want_traj else ("rmse",),
                decimate=20 if want_traj else 1,
            )
            if want_traj:
                first_wavefields = np.asarray(out["wavefields"])[:, 0]
            final = np.asarray(out["rmse"])[-1]
            rmses.append(np.where(np.isnan(final), np.inf, final))
        finals = np.concatenate(rmses)
        val_loss = float(np.mean(finals))
        val_median = float(np.median(finals))
        self._log({"epoch": self.epoch, "val_loss": val_loss})
        if self._tb is not None:
            self._tb.add_scalar("val/val_loss", val_loss, self.global_step)

            # wavefield images (reference log_wavefield, hybridnet.py:507-520)
            def log_img(tag, wf):
                img = (np.clip(wf, -1, 1) + 1) / 2
                self._tb.add_image(f"{tag}_real", img[None, :, :, 0],
                                   self.global_step)
                self._tb.add_image(f"{tag}_imag", img[None, :, :, 1],
                                   self.global_step)

            if first_wavefields is not None:
                log_img("wavefield/val_20step", first_wavefields[0])
                log_img("wavefield/val_terminal", first_wavefields[-1])
            else:
                log_img("wavefield/val", np.asarray(out["wavefield"])[0])
        # median is robust to the early-training long-rollout divergence
        # that dominates the mean (a single diverging sample can push the
        # mean to 1e10 while 15/16 maps converge)
        return {"val_loss": val_loss, "val_median": val_median}

    def _log(self, record: dict):
        if self._log_file:
            self._log_file.write(json.dumps(record) + "\n")
            self._log_file.flush()

    # ------------------------------------------------------------------

    def _train_state(self):
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "epoch": self.epoch,
            "global_step": self.global_step,
        }

    def _scheduler_state(self) -> dict:
        s = self.scheduler
        return {"lr": s.lr, "best": s.best, "bad_epochs": s.bad_epochs}

    def save(self, directory: str):
        from .checkpoint import save_checkpoint

        save_checkpoint(directory, self.epoch, self._train_state())

    def save_topk(self, directory: str, val_loss: float, k: int = 3):
        """ModelCheckpoint(save_top_k=k on val_loss, save_last) semantics
        (reference train.py:90-97): keep the k best validation checkpoints
        plus the latest; prune the rest; persist LR-scheduler state."""
        from .checkpoint import update_topk

        update_topk(
            directory, self.epoch, val_loss, self._train_state(), k=k,
            extra=self._scheduler_state(),
        )

    def restore(self, directory: str, best: bool = False) -> bool:
        """Resume from the latest orbax checkpoint in `directory`
        (the reference's resume-from-last.ckpt story, README.md:31);
        `best=True` restores the lowest-val_loss checkpoint instead
        (Lightning's best-model restore for eval)."""
        from .checkpoint import (
            best_step,
            latest_step,
            manifest_extra,
            restore_checkpoint,
        )

        step = best_step(directory) if best else latest_step(directory)
        if step is None:
            return False
        template = {
            "params": self.params,
            "opt_state": self.opt_state,
            "epoch": 0,
            "global_step": 0,
        }
        state = restore_checkpoint(directory, step, template)
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.epoch = int(state["epoch"])
        self.global_step = int(state["global_step"])
        sched = manifest_extra(directory, step)
        if sched:
            self.scheduler.lr = float(sched["lr"])
            self.scheduler.best = float(sched["best"])
            self.scheduler.bad_epochs = int(sched["bad_epochs"])
        return True

    def fit(
        self,
        train_maps: np.ndarray,
        val_maps: Optional[np.ndarray] = None,
        num_epochs: int = 1,
        val_every: int = 2,
        val_iterations: Optional[int] = None,
        ckpt_dir: Optional[str] = None,
        top_k: int = 3,
    ):
        """Reference Trainer.fit analog: train epochs, validate every
        `val_every` epochs on a FIXED random-circle source set, and keep the
        `top_k` best checkpoints by val_loss plus the last one
        (ModelCheckpoint semantics, train.py:90-97)."""
        if ckpt_dir:
            self.restore(ckpt_dir)
        if self.device_buffer:
            if self._dev_buf is None:
                self.fill_buffer(train_maps)
        elif self.buffer is None or not np.any(self.buffer.k_sq):
            self.fill_buffer(train_maps)
        val_sources = (
            self.make_val_sources(len(val_maps)) if val_maps is not None else None
        )
        history = []
        for _ in range(num_epochs):
            stats = self.training_epoch(train_maps)
            if val_maps is not None and self.epoch % val_every == 0:
                stats.update(
                    self.validate(val_maps, val_iterations, sources=val_sources)
                )
                if ckpt_dir:
                    self.save_topk(ckpt_dir, stats["val_loss"], k=top_k)
            elif ckpt_dir:
                self.save_topk(ckpt_dir, float("inf"), k=top_k)
            history.append(stats)
        return history
