"""Unsupervised physics-residual training on 3D volumes.

Capability extension: the reference trains 2D-only (hybridnet.py:385-505).
Trainer3D carries the same scheme to volumes with the device-resident
buffer as the ONLY path (the host-side buffer exists in 2D for reference
interop; volumes make host round trips strictly worse, so 3D starts
TPU-native):

* replay buffer + sos dataset live in HBM; one jitted, buffer-donating
  mega-step fuses sample -> unrolled BPTT -> re-admission gate -> scatter
  write-back (same semantics as train/device_buffer.py, gate res^2 < 1,
  curriculum age = min(slope*epoch + 1, max_iterations));
* loss = loss_amplify * mean(residual^2) over unrolling_steps learned
  updates (reference training_step, hybridnet.py:333-352);
* Adam(b1, b2) + weight decay + value clip + ReduceLROnPlateau — the
  exact 2D optimizer (train/loop.make_optimizer);
* checkpoints are params-npz with a top-k manifest (val = median terminal
  residual RMSE on held-out volumes, mirroring the 2D protocol).

Source pool: index 0 is the fixed training point source; when
p_random_source > 0, restarted slots draw random interior point sources
(the 3D analog of the 2D random-circle curriculum that fixed
generalization in round 2, TRAINING.md).
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
from ..models import hybridnet3d
from ..ops.spectral3d import (
    helmholtz_residual3d,
    make_operator3d,
    point_source_map3d,
)
from ..solvers.iterative3d import (
    IN_CHANNELS_3D,
    SolverCarry3D,
    get_initials3d,
    n_steps3d,
    rollout3d,
)
from .checkpoint import save_params_npz
from .loop import PlateauScheduler, make_optimizer


def load_params3d_npz(path: str, cfg: Config):
    """Flat-npz loader against the HybridNet3D pytree (the 2D loader in
    train/checkpoint.py templates from the 2D architecture registry)."""
    cfg = _with_3d_channels(cfg)
    template = hybridnet3d.init_params(jax.random.PRNGKey(0), cfg.model)
    flat, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as f:
        leaves = [jnp.asarray(f[f"p{i}"]) for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _with_3d_channels(cfg: Config) -> Config:
    if cfg.model.in_channels == IN_CHANNELS_3D:
        return cfg
    model = cfg.model.__class__(
        **{**cfg.model.__dict__, "in_channels": IN_CHANNELS_3D}
    )
    return cfg.replace(model=model)


class Trainer3D:
    """Owns params/opt state and the HBM-resident replay buffer; runs
    epochs of fused device mega-steps (host contributes RNG integers)."""

    def __init__(
        self,
        cfg: Config,
        params=None,
        key=None,
        log_dir: Optional[str] = None,
        n_random_sources: int = 32,
    ):
        cfg = _with_3d_channels(cfg)
        self.cfg = cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        self.params = (
            params
            if params is not None
            else hybridnet3d.init_params(key, cfg.model)
        )
        g = cfg.geometry
        n = g.domain_size
        self.depth = self.height = self.width = n
        self.op = make_operator3d(n, n, n, g.pml_size, g.sigma_max, cfg.k0)
        self.src_pool = jnp.asarray(
            self._build_source_pool(n_random_sources)
        )
        self.optimizer = make_optimizer(cfg)
        self.opt_state = self.optimizer.init(self.params)
        self.capacity = cfg.training.buffer_size
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
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._log_file = open(
                os.path.join(log_dir, "train3d_log.jsonl"), "a"
            )
        self._buf = None
        self._sos_pool = None
        self._build_jitted_fns()

    # ------------------------------------------------------------------

    def _build_source_pool(self, n_random: int) -> np.ndarray:
        """[K, D, H, W, 2] candidate sources; index 0 is the fixed training
        source (3D analog of the 2D pool, train/loop.py)."""
        s = self.cfg.source
        n = self.depth
        pml = self.cfg.geometry.pml_size
        fixed_loc = (n - pml - 4, n // 2, n // 2)
        pool = [
            point_source_map3d(
                n, n, n, fixed_loc, s.amplitude, s.phase, s.omega
            )
        ]
        if self.cfg.training.p_random_source > 0:
            rng = np.random.default_rng(42)
            margin = min(pml + 4, (n - 2) // 2)  # tiny-domain safe
            lo, hi = margin, max(n - margin, margin + 1)
            for _ in range(n_random):
                loc = tuple(int(v) for v in rng.integers(lo, hi, size=3))
                pool.append(
                    point_source_map3d(
                        n, n, n, loc, s.amplitude, s.phase, s.omega
                    )
                )
        return np.stack(pool)

    def _sample_src_idx(self, m: int) -> np.ndarray:
        p = self.cfg.training.p_random_source
        k = self.src_pool.shape[0]
        if p <= 0 or k == 1:
            return np.zeros(m, np.int64)
        idx = np.zeros(m, np.int64)
        rand = self.rng.random(m) < p
        idx[rand] = self.rng.integers(1, k, size=int(rand.sum()))
        return idx

    def _build_jitted_fns(self):
        cfg = self.cfg
        optimizer = self.optimizer
        num_steps = cfg.training.unrolling_steps
        op = self.op

        def fresh_experiences(source, sos_maps):
            k_sq, wavefield = get_initials3d(sos_maps, cfg.source.omega)
            states = hybridnet3d.init_states(
                sos_maps.shape[0], sos_maps.shape[1:4], cfg.model
            )
            residual = helmholtz_residual3d(
                op, wavefield, k_sq, source, cfg.operator_mode
            )
            return {
                "wavefield": wavefield,
                "states": hybridnet3d.flatten_states(states),
                "k_sq": k_sq,
                "residual": residual,
            }

        @jax.jit
        def init_buffer(src_pool, src_idx, sos_maps, ages):
            src = src_pool[src_idx]
            exp = fresh_experiences(src, sos_maps)
            exp["source"] = src
            exp["iteration"] = ages.astype(jnp.int32)
            return exp

        def mega_step(params, opt_state, buf, src_pool, sos_pool, slot_idx,
                      fresh_idx, fresh_src_idx, pick, maxiter):
            batch_wf = buf["wavefield"][slot_idx]
            batch_states = buf["states"][slot_idx]
            batch_ksq = buf["k_sq"][slot_idx]
            batch_res = buf["residual"][slot_idx]
            batch_src = buf["source"][slot_idx]
            batch_age = buf["iteration"][slot_idx]

            def loss_fn(p):
                carry = SolverCarry3D(
                    batch_wf,
                    batch_res,
                    hybridnet3d.unflatten_states(
                        batch_states, batch_wf.shape[1:4], cfg.model
                    ),
                )
                _, ys = n_steps3d(
                    p, op, batch_src, batch_ksq, carry,
                    cfg=cfg, num_steps=num_steps,
                    remat=cfg.training.remat,
                )
                res = ys["residuals"]
                return cfg.training.loss_amplify * jnp.mean(res**2), ys

            (loss, ys), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            take = lambda a: jax.lax.dynamic_index_in_dim(
                a, pick, 0, keepdims=False
            )
            ev_wf = take(ys["wavefields"])
            ev_states = take(ys["states"])
            ev_res = take(ys["residuals"])
            res_sq_mean = jnp.mean(ev_res**2, axis=(1, 2, 3, 4))

            new_age = batch_age + pick + 1
            keep = (res_sq_mean < 1.0) & (new_age < maxiter)
            fresh = fresh_experiences(
                src_pool[fresh_src_idx], sos_pool[fresh_idx]
            )

            k5 = keep[:, None, None, None, None]
            k4 = keep[:, None, None, None]
            k3 = keep[:, None, None]
            buf = {
                "wavefield": buf["wavefield"].at[slot_idx].set(
                    jnp.where(k5, ev_wf, fresh["wavefield"])
                ),
                "states": buf["states"].at[slot_idx].set(
                    jnp.where(k3, ev_states, fresh["states"])
                ),
                "k_sq": buf["k_sq"].at[slot_idx].set(
                    jnp.where(k4, batch_ksq, fresh["k_sq"])
                ),
                "residual": buf["residual"].at[slot_idx].set(
                    jnp.where(k5, ev_res, fresh["residual"])
                ),
                "source": buf["source"].at[slot_idx].set(
                    jnp.where(k5, batch_src, src_pool[fresh_src_idx])
                ),
                "iteration": buf["iteration"].at[slot_idx].set(
                    jnp.where(keep, new_age, 0)
                ),
            }
            res = ys["residuals"]
            metrics = {
                "loss": loss,
                "rel_loss": jnp.mean(
                    jnp.sqrt(jnp.mean(res**2, axis=(2, 3, 4, 5)))
                ),
                "grad_norm": optax.global_norm(grads),
                "restarts": jnp.sum(~keep),
            }
            return params, opt_state, buf, metrics

        self._init_buffer = init_buffer
        self._mega_step = jax.jit(mega_step, donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------------

    def fill_buffer(self, sos_maps: np.ndarray) -> None:
        """Seed all slots; slot i gets starting age 10*i so curriculum ages
        are spread out (hybridnet.py:199-218)."""
        cap = self.capacity
        self._sos_pool = jnp.asarray(sos_maps, jnp.float32)
        maps = self._sos_pool[
            jnp.arange(cap, dtype=jnp.int32) % len(sos_maps)
        ]
        self._buf = self._init_buffer(
            self.src_pool,
            jnp.asarray(self._sample_src_idx(cap), jnp.int32),
            maps,
            jnp.arange(cap, dtype=jnp.int32) * 10,
        )

    def max_allowed_iterations(self) -> int:
        t = self.cfg.training
        return min(self.epoch * t.curriculum_slope + 1, self.cfg.max_iterations)

    def training_epoch(self, n_batches: Optional[int] = None) -> dict:
        t = self.cfg.training
        bs = min(t.train_batch_size, self.capacity)
        cap = self.capacity
        maxiter = self.max_allowed_iterations()
        num_batches = n_batches or max(len(self._sos_pool) // bs, 1)
        step_metrics = []
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
            self.params, self.opt_state, self._buf, metrics = self._mega_step(
                self.params, self.opt_state, self._buf, self.src_pool,
                self._sos_pool, slot_idx, fresh_idx, fresh_src_idx, pick,
                jnp.asarray(maxiter),
            )
            step_metrics.append(metrics)
            self.global_step += 1
        fetched = jax.device_get(step_metrics)
        losses = [float(m["loss"]) for m in fetched]
        epoch_loss = float(np.mean(losses))
        if not np.isfinite(epoch_loss):
            raise FloatingPointError(
                f"non-finite 3D training loss at epoch {self.epoch}"
            )
        lr = self.scheduler.step(epoch_loss)
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
        stats = {
            "epoch": self.epoch,
            "train_loss_mean": epoch_loss,
            "maxiter": maxiter,
            "new_sos": int(sum(int(m["restarts"]) for m in fetched)),
            "lr": lr,
            "epoch_time_s": time.time() - tic,
            "global_step": self.global_step,
        }
        if self._log_file is not None:
            self._log_file.write(json.dumps(stats) + "\n")
            self._log_file.flush()
        self.epoch += 1
        return stats

    # ------------------------------------------------------------------

    def validate(
        self,
        val_maps: np.ndarray,
        num_iterations: Optional[int] = None,
        batch_size: int = 4,
        random_sources: bool = True,
    ) -> dict:
        """Median/p90 terminal residual RMSE over held-out volumes (the 2D
        validation protocol, train/loop.py validate)."""
        iters = num_iterations or self.cfg.max_iterations
        rmses = []
        n_src = self.src_pool.shape[0]
        for start in range(0, len(val_maps), batch_size):
            sos = jnp.asarray(val_maps[start : start + batch_size])
            b = sos.shape[0]
            if random_sources and n_src > 1:
                idx = 1 + (np.arange(start, start + b) % (n_src - 1))
            else:
                idx = np.zeros(b, np.int64)
            src = self.src_pool[jnp.asarray(idx)]
            out = rollout3d(
                self.params, self.op, src, sos,
                cfg=self.cfg, num_iterations=iters, collect=("rmse", "best"),
            )
            rmses.extend(np.asarray(out["best_rmse"]).tolist())
        arr = np.asarray(rmses)
        return {
            "val_median": float(np.median(arr)),
            "val_p90": float(np.percentile(arr, 90)),
            "val_n": len(arr),
        }

    # ------------------------------------------------------------------

    def save(self, directory: str, tag: str = "last") -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"params3d_{tag}.npz")
        save_params_npz(path, self.params)
        return path

    def save_topk(self, directory: str, val_loss: float, k: int = 3) -> None:
        """Keep the k best-val param files + last (ModelCheckpoint
        semantics, reference train.py:90-97)."""
        os.makedirs(directory, exist_ok=True)
        mpath = os.path.join(directory, "manifest3d.json")
        manifest = (
            json.load(open(mpath)) if os.path.exists(mpath) else {"top": []}
        )
        self.save(directory, "last")
        top = manifest["top"]
        top.append({"epoch": self.epoch, "val": val_loss})
        top.sort(key=lambda e: e["val"])
        for drop in top[k:]:
            p = os.path.join(directory, f"params3d_ep{drop['epoch']}.npz")
            if os.path.exists(p):
                os.remove(p)
        manifest["top"] = top[:k]
        if any(e["epoch"] == self.epoch for e in manifest["top"]):
            self.save(directory, f"ep{self.epoch}")
        json.dump(manifest, open(mpath, "w"))

    def save_state(self, directory: str) -> str:
        """Full resume state — params + opt state + epoch/scheduler — the
        3D analog of the 2D Trainer's orbax resume (train/loop.py:
        Trainer.save/restore). 3D runs on the tunneled worker are the ones
        most likely to be interrupted (long dispatches crash it); without
        this they restarted from epoch 0 with a fresh Adam state."""
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, "state3d.npz")
        pf, _ = jax.tree_util.tree_flatten(self.params)
        of, _ = jax.tree_util.tree_flatten(self.opt_state)
        arrs = {f"p{i}": np.asarray(a) for i, a in enumerate(pf)}
        arrs.update({f"o{i}": np.asarray(a) for i, a in enumerate(of)})
        arrs["meta"] = np.asarray(
            [
                self.epoch,
                self.global_step,
                self.scheduler.lr,
                self.scheduler.best,
                self.scheduler.bad_epochs,
            ],
            np.float64,
        )
        tmp = path + ".tmp.npz"  # atomic: a crash mid-write keeps the old
        np.savez_compressed(tmp, **arrs)
        os.replace(tmp, path)
        return path

    def restore(self, directory: str) -> bool:
        """Resume from save_state; returns False when absent.

        Not an exact continuation: the replay buffer is rebuilt (slot ages
        re-seed) since persisting the full HBM buffer is not worth the
        checkpoint size. The host RNG IS decorrelated from the run's first
        epochs by re-seeding from the restored global_step, so a resumed
        run does not replay the seed-0 slot/source sampling sequence
        (ADVICE r3)."""
        path = os.path.join(directory, "state3d.npz")
        if not os.path.exists(path):
            return False
        pf, ptree = jax.tree_util.tree_flatten(self.params)
        of, otree = jax.tree_util.tree_flatten(self.opt_state)
        with np.load(path) as f:
            self.params = jax.tree_util.tree_unflatten(
                ptree, [jnp.asarray(f[f"p{i}"]) for i in range(len(pf))]
            )
            self.opt_state = jax.tree_util.tree_unflatten(
                otree,
                [
                    jnp.asarray(f[f"o{i}"]).astype(np.asarray(leaf).dtype)
                    for i, leaf in enumerate(of)
                ],
            )
            meta = f["meta"]
        self.epoch = int(meta[0])
        self.global_step = int(meta[1])
        self.scheduler.lr = float(meta[2])
        self.scheduler.best = float(meta[3])
        self.scheduler.bad_epochs = int(meta[4])
        self.rng = np.random.default_rng(self.global_step + 1)
        return True

    def restore_best(self, directory: str) -> bool:
        mpath = os.path.join(directory, "manifest3d.json")
        if not os.path.exists(mpath):
            return False
        top = json.load(open(mpath))["top"]
        if not top:
            return False
        path = os.path.join(directory, f"params3d_ep{top[0]['epoch']}.npz")
        if not os.path.exists(path):
            return False
        self.params = load_params3d_npz(path, self.cfg)
        return True

    # ------------------------------------------------------------------

    def fit(
        self,
        train_maps: np.ndarray,
        val_maps: Optional[np.ndarray] = None,
        epochs: Optional[int] = None,
        ckpt_dir: Optional[str] = None,
        val_every: int = 10,
        val_iterations: Optional[int] = None,
        top_k: int = 3,
        n_batches: Optional[int] = None,
    ) -> list[dict]:
        if self._buf is None:
            self.fill_buffer(train_maps)
        history = []
        for _ in range(epochs or self.cfg.training.max_epochs):
            stats = self.training_epoch(n_batches)
            if (
                val_maps is not None
                and val_every
                and self.epoch % val_every == 0
            ):
                v = self.validate(
                    val_maps,
                    val_iterations or self.max_allowed_iterations(),
                )
                stats.update(v)
                if ckpt_dir:
                    self.save_topk(ckpt_dir, v["val_median"], top_k)
                if self._log_file is not None:
                    self._log_file.write(json.dumps(v) + "\n")
                    self._log_file.flush()
            elif ckpt_dir:
                self.save(ckpt_dir, "last")
            history.append(stats)
        return history
