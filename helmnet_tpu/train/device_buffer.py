"""Device-resident replay training: buffer + dataset live in HBM.

The host loop of train/loop.py moves ~25 MB/step between host and device
(sample upload, evolved download, fresh-restart roundtrip) — fine on PCIe,
dominant over thin links. This module keeps the replay buffer AND the sos
dataset on device and fuses sample -> unrolled train step -> re-admission
gate -> scatter write-back into ONE jitted, buffer-donating call; the host
contributes only RNG integers and reads back scalar metrics.

Semantics are identical to the host-side path (same gate res^2<1, same
curriculum age logic, hybridnet.py:427-464); `test_device_buffer.py`
asserts equivalence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import Config
from ..models.registry import get_architecture
from ..ops.source import point_source_kernels, point_sources_on_device
from ..ops.spectral import SpectralPML, helmholtz_residual
from ..solvers.iterative import SolverCarry, get_initials, n_steps


def make_device_buffer_fns(cfg: Config, optimizer, sparse_sources=False):
    """Returns (init_buffer, mega_step) jitted functions.

    Buffer pytree: dict of [cap, ...] arrays + iteration [cap] int32.

    sparse_sources=True reinterprets the `src_pool` argument as [K, 2]
    int32 point-source locations; source maps are stamped on device from
    the separable Blackman kernels (TrainingConfig.sparse_source_pool —
    a dense pool is O(K*H*W) HBM, fatal at 1024^2).
    """
    arch = get_architecture(cfg.model.architecture)
    num_steps = cfg.training.unrolling_steps

    if sparse_sources:
        n = cfg.geometry.domain_size
        ky, kx = point_source_kernels(n, n, cfg.source.smoothing)
        ky, kx = jnp.asarray(ky), jnp.asarray(kx)

        def pool_sources(src_pool, idx):
            return point_sources_on_device(
                ky, kx, src_pool[idx], cfg.source.amplitude, cfg.source.phase,
            )
    else:

        def pool_sources(src_pool, idx):
            return src_pool[idx]

    def fresh_experiences(op: SpectralPML, source, sos_maps):
        k_sq, wavefield = get_initials(sos_maps, cfg.source.omega)
        states = arch.init_states(
            sos_maps.shape[0], sos_maps.shape[1:3], cfg.model
        )
        residual = helmholtz_residual(op, wavefield, k_sq, source, cfg.operator_mode)
        return {
            "wavefield": wavefield,
            "states": arch.flatten_states(states),
            "k_sq": k_sq,
            "residual": residual,
        }

    @jax.jit
    def init_buffer(op, src_pool, src_idx, sos_maps, ages):
        """Seed every slot from sos_maps [cap, H, W]; ages [cap] int32;
        slot i gets source map src_pool[src_idx[i]] ([K, H, W, 2] pool, or
        [K, 2] locations under sparse_sources — index 0 is the training
        source, higher indices are the optional random-circle curriculum
        sources)."""
        src = pool_sources(src_pool, src_idx)
        exp = fresh_experiences(op, src, sos_maps)
        exp["source"] = src
        exp["iteration"] = ages.astype(jnp.int32)
        return exp

    def mega_step(params, opt_state, buf, op, src_pool, sos_pool,
                  slot_idx, fresh_idx, fresh_src_idx, pick, maxiter):
        # ---- gather the batch from the device buffer ----
        batch_wf = buf["wavefield"][slot_idx]
        batch_states = buf["states"][slot_idx]
        batch_ksq = buf["k_sq"][slot_idx]
        batch_res = buf["residual"][slot_idx]
        batch_src = buf["source"][slot_idx]
        batch_age = buf["iteration"][slot_idx]

        # ---- unrolled BPTT train step ----
        def loss_fn(p):
            carry = SolverCarry(
                batch_wf,
                batch_res,
                arch.unflatten_states(
                    batch_states, batch_wf.shape[1:3], cfg.model
                ),
            )
            _, ys = n_steps(
                p, op, batch_src, batch_ksq, carry, cfg=cfg,
                num_steps=num_steps, remat=cfg.training.remat,
            )
            res = ys["residuals"]
            return cfg.training.loss_amplify * jnp.mean(res**2), ys

        (loss, ys), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        take = lambda a: jax.lax.dynamic_index_in_dim(a, pick, 0, keepdims=False)
        ev_wf = take(ys["wavefields"])
        ev_states = take(ys["states"])
        ev_res = take(ys["residuals"])
        res_sq_mean = jnp.mean(ev_res**2, axis=(1, 2, 3))

        # ---- re-admission gate + fresh restarts (on device) ----
        new_age = batch_age + pick + 1
        keep = (res_sq_mean < 1.0) & (new_age < maxiter)
        fresh_sos = sos_pool[fresh_idx]
        fresh_src = pool_sources(src_pool, fresh_src_idx)
        fresh = fresh_experiences(op, fresh_src, fresh_sos)

        k4 = keep[:, None, None, None]
        k3 = keep[:, None, None]
        buf = {
            "wavefield": buf["wavefield"].at[slot_idx].set(
                jnp.where(k4, ev_wf, fresh["wavefield"])
            ),
            "states": buf["states"].at[slot_idx].set(
                jnp.where(k3, ev_states, fresh["states"])
            ),
            "k_sq": buf["k_sq"].at[slot_idx].set(
                jnp.where(k3, batch_ksq, fresh["k_sq"])
            ),
            "residual": buf["residual"].at[slot_idx].set(
                jnp.where(k4, ev_res, fresh["residual"])
            ),
            "source": buf["source"].at[slot_idx].set(
                jnp.where(k4, batch_src, fresh_src)
            ),
            "iteration": buf["iteration"].at[slot_idx].set(
                jnp.where(keep, new_age, 0)
            ),
        }
        res = ys["residuals"]
        metrics = {
            "loss": loss,
            "rel_loss": jnp.mean(jnp.sqrt(jnp.mean(res**2, axis=(2, 3, 4)))),
            "grad_norm": optax.global_norm(grads),
            "restarts": jnp.sum(~keep),
        }
        return params, opt_state, buf, metrics

    mega_step = jax.jit(mega_step, donate_argnums=(0, 1, 2))
    return init_buffer, mega_step
