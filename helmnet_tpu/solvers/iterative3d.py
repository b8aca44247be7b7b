"""Learned iterative Helmholtz solver on 3D volumes — capability extension.

The reference (ucl-bug/helmnet) is strictly 2D (hybridnet.py:19-755 operates
on [B, C, H, W]); transcranial-ultrasound deployment is 3D, so the framework
carries the full learned-solver loop in 3D: HybridNet3D (models/hybridnet3d)
stepping against the 3D spectral PML operator (ops/spectral3d), with the
same TPU-native structure as solvers/iterative.py —

* the rollout is a `lax.scan` over an explicit carry (wavefield, residual,
  per-level hidden states);
* fields are NDHWC channel pairs [B, D, H, W, 2], sos maps [B, D, H, W];
* best-iterate tracking and host-level chunking (`chunk_iterations`)
  carry over unchanged — large-volume rollouts exceed the single-dispatch
  duration limit even sooner than 2D.

Network input channels: wavefield(2) + 1e3*residual(2) + sigma_x/y/z(3) = 7
(the 3D analog of the reference's 6-channel input, hybridnet.py:558-566).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..models import hybridnet3d
from ..ops.spectral3d import (
    SpectralPML3D,
    helmholtz_residual3d,
    make_operator3d,
    point_source_map3d,
)
from .iterative import RESIDUAL_SCALE

IN_CHANNELS_3D = 7


class SolverCarry3D(NamedTuple):
    wavefield: jax.Array  # [B, D, H, W, 2]
    residual: jax.Array  # [B, D, H, W, 2]
    states: Tuple[jax.Array, ...]


def get_initials3d(sos_maps: jax.Array, omega: float):
    """k_sq = (omega/c)^2 and a zero wavefield (3D analog of
    hybridnet.py:522-538)."""
    k_sq = (omega / sos_maps) ** 2
    b, d, h, w = sos_maps.shape
    return k_sq, jnp.zeros((b, d, h, w, 2), sos_maps.dtype)


def network_input3d(wavefield, residual, sigmas_dhwc):
    b = wavefield.shape[0]
    sig = jnp.broadcast_to(sigmas_dhwc[None], (b,) + sigmas_dhwc.shape)
    return jnp.concatenate([wavefield, RESIDUAL_SCALE * residual, sig], axis=-1)


def single_step3d(params, op, source, k_sq, carry, *, cfg: Config):
    """One learned update: wf' = wf + f(...)/1e3; r' = L wf' + k^2 wf' - s."""
    sigmas_dhwc = jnp.transpose(op.sigmas, (1, 2, 3, 0))  # [D, H, W, 3]
    net_in = network_input3d(carry.wavefield, carry.residual, sigmas_dhwc)
    delta, new_states = hybridnet3d.apply(
        params, net_in, carry.states, cfg=cfg.model
    )
    wavefield = delta / RESIDUAL_SCALE + carry.wavefield
    residual = helmholtz_residual3d(
        op, wavefield, k_sq, source, cfg.operator_mode
    )
    return SolverCarry3D(wavefield, residual, new_states)


def residual_rmse3d(residual: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.mean(residual**2, axis=(1, 2, 3, 4)))


def n_steps3d(
    params,
    op: SpectralPML3D,
    source: jax.Array,
    k_sq: jax.Array,
    carry: SolverCarry3D,
    *,
    cfg: Config,
    num_steps: int,
    remat: bool = False,
):
    """Differentiable unrolled steps from an arbitrary solver state — the
    volume counterpart of solvers/iterative.n_steps (reference n_steps,
    hybridnet.py:586-623). Returns (final_carry, ys) with ys stacking
    per-step wavefields/residuals/flat states [T, B, ...].

    remat=True rematerializes each step in the backward pass
    (jax.checkpoint): the BPTT tape keeps only the per-step carries
    instead of every conv activation of the 3D UNet — measured
    necessary on one chip (unroll-10 at 48^3 batch 8 wants 70 GB of
    HBM un-rematerialized, ~2 GB with remat) at ~1/3 extra FLOPs."""
    def step(p, c):
        return single_step3d(p, op, source, k_sq, c, cfg=cfg)

    if remat:
        step = jax.checkpoint(step)

    def body(c, _):
        c = step(params, c)
        ys = {
            "wavefields": c.wavefield,
            "residuals": c.residual,
            "states": hybridnet3d.flatten_states(c.states),
        }
        return c, ys

    return jax.lax.scan(body, carry, None, length=num_steps)


@functools.partial(jax.jit, static_argnames=("cfg", "num_iterations", "collect"))
def rollout3d(
    params,
    op: SpectralPML3D,
    source: jax.Array,
    sos_maps: jax.Array,
    *,
    cfg: Config,
    num_iterations: int,
    collect: tuple = ("rmse",),
    init=None,
):
    """Inference rollout on volumes. collect ⊆ {'rmse', 'best'}; `init` is an
    optional (wavefield, states) warm start for host-level chunking."""
    k_sq, wavefield = get_initials3d(sos_maps, cfg.source.omega)
    states = hybridnet3d.init_states(
        sos_maps.shape[0], sos_maps.shape[1:4], cfg.model, sos_maps.dtype
    )
    if init is not None:
        wavefield, states = init
    residual = helmholtz_residual3d(
        op, wavefield, k_sq, source, cfg.operator_mode
    )
    carry = SolverCarry3D(wavefield, residual, states)
    track_best = "best" in collect

    def body(c, _):
        carry, best_wf, best_rmse = c
        carry = single_step3d(params, op, source, k_sq, carry, cfg=cfg)
        rmse = residual_rmse3d(carry.residual)
        if track_best:
            better = rmse < best_rmse  # False for NaN: divergence-safe
            best_wf = jnp.where(
                better[:, None, None, None, None], carry.wavefield, best_wf
            )
            best_rmse = jnp.where(better, rmse, best_rmse)
        ys = {"rmse": rmse} if "rmse" in collect else {}
        return (carry, best_wf, best_rmse), ys

    best0 = (wavefield, jnp.full((sos_maps.shape[0],), jnp.inf, sos_maps.dtype))
    (carry, best_wf, best_rmse), ys = jax.lax.scan(
        body, (carry, *best0), None, length=num_iterations
    )
    out = {
        "wavefield": carry.wavefield,
        "residual": carry.residual,
        "states": carry.states,
    }
    if track_best:
        out["best_wavefield"] = best_wf
        out["best_rmse"] = best_rmse
    out.update(ys)
    return out


class IterativeSolver3D:
    """Volume-domain counterpart of IterativeSolver (same conventions)."""

    def __init__(self, config: Optional[Config] = None, params=None, key=None):
        cfg = config or Config()
        if cfg.model.in_channels != IN_CHANNELS_3D:
            cfg = cfg.replace(
                model=cfg.model.__class__(
                    **{**cfg.model.__dict__, "in_channels": IN_CHANNELS_3D}
                )
            )
        self.cfg = cfg
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            params = hybridnet3d.init_params(key, cfg.model)
        self.params = params
        self._op_cache: dict = {}
        self.set_domain_size(cfg.geometry.domain_size)

    def operator(self, depth: int, height: int, width: int) -> SpectralPML3D:
        key = (depth, height, width)
        if key not in self._op_cache:
            g = self.cfg.geometry
            self._op_cache[key] = make_operator3d(
                depth, height, width, g.pml_size, g.sigma_max, self.cfg.k0
            )
        return self._op_cache[key]

    def set_domain_size(self, domain_size, source_location=None,
                        source_map=None):
        if isinstance(domain_size, int):
            d = h = w = domain_size
        else:
            d, h, w = domain_size
        stride = 2 ** self.cfg.model.depth
        if d % stride or h % stride or w % stride:
            raise ValueError(
                f"domain {d}x{h}x{w} must be divisible by 2^depth = {stride}"
            )
        self.depth, self.height, self.width = d, h, w
        self.op = self.operator(d, h, w)
        if source_map is not None:
            self.set_source_maps(source_map)
        else:
            s = self.cfg.source
            loc = tuple(source_location) if source_location is not None else (
                d // 2, h // 2, w // 2
            )
            self.source = jnp.asarray(
                point_source_map3d(d, h, w, loc, s.amplitude, s.phase, s.omega)
            )[None]
        return self

    def set_source_maps(self, source_map):
        sm = jnp.asarray(source_map, jnp.float32)
        if sm.ndim == 4:
            sm = sm[None]
        self.source = sm
        return self

    def get_initials(self, sos_maps):
        return get_initials3d(jnp.asarray(sos_maps), self.cfg.source.omega)

    def get_residual(self, wavefield, k_sq):
        return helmholtz_residual3d(
            self.op, wavefield, k_sq, self.source, self.cfg.operator_mode
        )

    def forward(
        self,
        sos_maps,
        num_iterations: Optional[int] = None,
        *,
        best_iterate: bool = True,
        chunk_iterations: Optional[int] = None,
    ):
        """Run the learned solver on [B, D, H, W] (or [D, H, W]) sos volumes.

        `chunk_iterations` bounds single-dispatch duration (host-level warm
        restarts, same rationale as IterativeSolver.forward)."""
        sos = jnp.asarray(sos_maps, jnp.float32)
        if sos.ndim == 3:
            sos = sos[None]
        iters = num_iterations or self.cfg.max_iterations
        source = self.source
        if source.shape[0] == 1 and sos.shape[0] > 1:
            source = jnp.broadcast_to(source, (sos.shape[0],) + source.shape[1:])
        collect = ("rmse", "best") if best_iterate else ("rmse",)
        chunk = chunk_iterations or iters
        if iters % chunk:
            raise ValueError("need chunk_iterations | num_iterations")
        out = None
        for _ in range(iters // chunk):
            init = None if out is None else (out["wavefield"], out["states"])
            part = rollout3d(
                self.params, self.op, source, sos,
                cfg=self.cfg, num_iterations=chunk, collect=collect, init=init,
            )
            if out is None:
                out = part
                continue
            out["rmse"] = jnp.concatenate([out["rmse"], part["rmse"]], axis=0)
            if "best_rmse" in part:
                better = part["best_rmse"] < out["best_rmse"]
                out["best_wavefield"] = jnp.where(
                    better[:, None, None, None, None],
                    part["best_wavefield"], out["best_wavefield"],
                )
                out["best_rmse"] = jnp.minimum(
                    part["best_rmse"], out["best_rmse"]
                )
            for key in ("wavefield", "residual", "states"):
                out[key] = part[key]
        if best_iterate:
            out["final_wavefield"] = out["wavefield"]
            out["wavefield"] = out["best_wavefield"]
        return out
