"""Learned iterative Helmholtz solver — the heart of the framework.

TPU-native re-design of the reference IterativeSolver (hybridnet.py:19-755):

* the rollout is a `lax.scan` over an explicit carry
  (wavefield, residual, hidden states) — the reference's Python loop with
  module-attribute state mutation cannot be jitted;
* all shapes are static per domain size; one compiled executable per
  (batch, H, W, iterations, collect) signature, cached;
* the physics operator is the MXU matmul spectral PML operator (ops/spectral).

Wavefields/residuals/sources are NHWC channel pairs [B, H, W, 2];
sos maps are [B, H, W].
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..models import hybridnet
from ..models.registry import get_architecture
from ..ops.source import point_source_map
from ..ops.spectral import SpectralPML, helmholtz_residual, make_operator

RESIDUAL_SCALE = 1e3  # reference feeds 1e3*residual and applies d/1e3 updates


class SolverCarry(NamedTuple):
    wavefield: jax.Array  # [B, H, W, 2]
    residual: jax.Array  # [B, H, W, 2]
    states: Tuple[jax.Array, ...]


def get_initials(sos_maps: jax.Array, omega: float) -> tuple[jax.Array, jax.Array]:
    """k_sq = (omega/c)^2 and a zero wavefield (hybridnet.py:522-538)."""
    k_sq = (omega / sos_maps) ** 2
    b, h, w = sos_maps.shape
    wavefield = jnp.zeros((b, h, w, 2), sos_maps.dtype)
    return k_sq, wavefield


def network_input(
    wavefield: jax.Array, residual: jax.Array, sigmas_hwc: jax.Array
) -> jax.Array:
    """[wavefield(2), 1e3*residual(2), sigma_x, sigma_y] channels
    (hybridnet.py:558-566)."""
    b = wavefield.shape[0]
    sig = jnp.broadcast_to(sigmas_hwc[None], (b,) + sigmas_hwc.shape)
    return jnp.concatenate([wavefield, RESIDUAL_SCALE * residual, sig], axis=-1)


def single_step(
    params,
    op: SpectralPML,
    source: jax.Array,
    k_sq: jax.Array,
    carry: SolverCarry,
    *,
    cfg: Config,
) -> SolverCarry:
    """One learned update: wf' = wf + f(...)/1e3; r' = L wf' + k^2 wf' - s."""
    arch = get_architecture(cfg.model.architecture)
    sigmas_hwc = jnp.transpose(op.sigmas, (1, 2, 0))  # [H, W, 2]
    net_in = network_input(carry.wavefield, carry.residual, sigmas_hwc)
    d, new_states = arch.apply(params, net_in, carry.states, cfg=cfg.model)
    wavefield = d / RESIDUAL_SCALE + carry.wavefield
    residual = helmholtz_residual(op, wavefield, k_sq, source, cfg.operator_mode)
    return SolverCarry(wavefield, residual, new_states)


def residual_rmse(residual: jax.Array) -> jax.Array:
    """Per-sample RMSE over (H, W, 2) (hybridnet.py:295-297)."""
    return jnp.sqrt(jnp.mean(residual**2, axis=(1, 2, 3)))


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_iterations", "collect", "decimate")
)
def rollout(
    params,
    op: SpectralPML,
    source: jax.Array,
    sos_maps: jax.Array,
    *,
    cfg: Config,
    num_iterations: int,
    collect: tuple = ("rmse",),
    decimate: int = 1,
    init=None,
):
    """Full inference rollout (reference forward, hybridnet.py:654-697).

    collect ⊆ {'rmse', 'wavefields', 'residuals', 'states'}; per-iteration
    outputs are optionally decimated by `decimate` to bound memory (the
    reference materializes all 1000 wavefields — SURVEY.md 3.3).
    `init`: optional (wavefield, states) warm start — continues a previous
    rollout's carry (host-level chunking of very long rollouts).
    Returns dict with 'wavefield', 'residual', 'states' (finals) plus stacked
    per-iteration arrays for each requested key.
    """
    if num_iterations % decimate != 0:
        raise ValueError("num_iterations must be divisible by decimate")
    k_sq, wavefield = get_initials(sos_maps, cfg.source.omega)
    states = get_architecture(cfg.model.architecture).init_states(
        sos_maps.shape[0], sos_maps.shape[1:3], cfg.model, sos_maps.dtype
    )
    if init is not None:  # warm start (host-chunked long rollouts)
        wavefield, states = init
    residual = helmholtz_residual(op, wavefield, k_sq, source, cfg.operator_mode)
    carry = SolverCarry(wavefield, residual, states)
    track_best = "best" in collect

    def inner_body(c, _):
        carry, best_wf, best_rmse = c
        carry = single_step(params, op, source, k_sq, carry, cfg=cfg)
        ys = {}
        rmse = residual_rmse(carry.residual)
        if "rmse" in collect:
            ys["rmse"] = rmse
        if track_best:
            better = rmse < best_rmse
            best_wf = jnp.where(
                better[:, None, None, None], carry.wavefield, best_wf
            )
            # NOT jnp.minimum: once a diverging trajectory hits NaN it
            # would poison the best-so-far; `better` is False for NaN
            best_rmse = jnp.where(better, rmse, best_rmse)
        return (carry, best_wf, best_rmse), ys

    def outer_body(c, _):
        # `decimate` steps; heavy arrays are only sampled once per chunk
        c, inner_ys = jax.lax.scan(inner_body, c, None, length=decimate)
        carry = c[0]
        ys = dict(inner_ys)
        if "wavefields" in collect:
            ys["wavefields"] = carry.wavefield
        if "residuals" in collect:
            ys["residuals"] = carry.residual
        if "states" in collect:
            ys["states"] = get_architecture(
                cfg.model.architecture
            ).flatten_states(carry.states)
        return c, ys

    best0 = (wavefield, jnp.full((sos_maps.shape[0],), jnp.inf, sos_maps.dtype))
    (carry, best_wf, best_rmse), ys = jax.lax.scan(
        outer_body, (carry, *best0), None, length=num_iterations // decimate
    )
    out = {
        "wavefield": carry.wavefield,
        "residual": carry.residual,
        "states": carry.states,
    }
    if track_best:
        # best-so-far iterate (long out-of-distribution rollouts can
        # oscillate after converging; the minimum-residual iterate is the
        # robust answer and the GMRES warm start)
        out["best_wavefield"] = best_wf
        out["best_rmse"] = best_rmse
    if "rmse" in ys:
        # [chunks, decimate, B] -> [iterations, B]
        r = ys.pop("rmse")
        out["rmse"] = r.reshape(num_iterations, *r.shape[2:])
    out.update(ys)
    return out


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_steps", "remat")
)
def n_steps(
    params,
    op: SpectralPML,
    source: jax.Array,
    k_sq: jax.Array,
    carry: SolverCarry,
    *,
    cfg: Config,
    num_steps: int,
    remat: bool = False,
):
    """Differentiable unrolled steps from an arbitrary solver state
    (reference n_steps, hybridnet.py:586-623). Returns (final_carry, ys) with
    ys stacking per-step wavefields/residuals/flat states [T, B, ...].

    remat=True rematerializes each step in the backward pass
    (jax.checkpoint): the BPTT tape keeps only per-step carries instead
    of every conv activation — the lever that makes >=1024^2 training
    fit one chip (see TrainingConfig.remat and the 3D counterpart)."""

    arch = get_architecture(cfg.model.architecture)

    def step(p, c):
        return single_step(p, op, source, k_sq, c, cfg=cfg)

    if remat:
        step = jax.checkpoint(step)

    def body(carry, _):
        carry = step(params, carry)
        ys = {
            "wavefields": carry.wavefield,
            "residuals": carry.residual,
            "states": arch.flatten_states(carry.states),
        }
        return carry, ys

    return jax.lax.scan(body, carry, None, length=num_steps)


class IterativeSolver:
    """Convenience wrapper owning config, operator, source and params.

    Mirrors the reference module API (set_domain_size, get_residual, forward)
    on top of the pure functions above.
    """

    def __init__(self, config: Config, params=None, key=None):
        self.cfg = config
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            arch = get_architecture(config.model.architecture)
            params = arch.init_params(key, config.model)
        self.params = params
        self._op_cache: dict = {}
        self.set_domain_size(config.geometry.domain_size)

    # -- geometry / source management ------------------------------------

    def operator(self, height: int, width: int) -> SpectralPML:
        key = (height, width)
        if key not in self._op_cache:
            g = self.cfg.geometry
            # skip the dense [N, N] matmul tables when the configured mode
            # resolves to fft at this size — at 8192^2 they are ~1 GB of
            # HBM the rollout never reads (and they overflow remote-compile
            # requests if an operator is ever closed over).
            from ..ops.spectral import resolve_mode

            dense = resolve_mode(self.cfg.operator_mode, height, width) != "fft"
            self._op_cache[key] = make_operator(
                height, width, g.pml_size, g.sigma_max, self.cfg.k0,
                dense=dense,
            )
        return self._op_cache[key]

    def set_domain_size(
        self,
        domain_size,
        source_location: Optional[Sequence[int]] = None,
        source_map: Optional[jax.Array] = None,
    ):
        """Re-target the solver to a new grid (hybridnet.py:92-108). The same
        weights run at any size; compilation is cached per shape."""
        if isinstance(domain_size, int):
            height = width = domain_size
        else:
            height, width = domain_size
        stride = 2 ** self.cfg.model.depth
        if height % stride or width % stride:
            raise ValueError(
                f"domain size {height}x{width} must be divisible by "
                f"2^depth = {stride} (UNet down/up path)"
            )
        self.height, self.width = height, width
        self.cfg = self.cfg.replace(
            geometry=self.cfg.geometry.__class__(
                domain_size=height,
                pml_size=self.cfg.geometry.pml_size,
                sigma_max=self.cfg.geometry.sigma_max,
            )
        )
        self.op = self.operator(height, width)
        if source_map is not None:
            self.set_source_maps(source_map)
        else:
            loc = tuple(source_location or self.cfg.source.location)
            self.set_sources([loc])
        return self

    def set_sources(self, locations: Sequence[Sequence[int]]):
        s = self.cfg.source
        maps = np.stack(
            [
                point_source_map(
                    self.height, self.width, tuple(loc), s.amplitude, s.phase,
                    s.omega, 0.0, s.smoothing,
                )
                for loc in locations
            ]
        )
        self.source = jnp.asarray(maps)
        return self

    def set_source_maps(self, source_map):
        """Accepts [H,W,2], [B,H,W,2], or torch-layout [B,2,H,W]."""
        sm = jnp.asarray(source_map, jnp.float32)
        if sm.ndim == 3:
            sm = sm[None]
        if sm.shape[-1] != 2 and sm.shape[1] == 2:
            sm = jnp.transpose(sm, (0, 2, 3, 1))
        self.source = sm
        return self

    # -- physics ----------------------------------------------------------

    def get_initials(self, sos_maps):
        return get_initials(jnp.asarray(sos_maps), self.cfg.source.omega)

    def get_residual(self, wavefield, k_sq):
        return helmholtz_residual(
            self.op, wavefield, k_sq, self.source, self.cfg.operator_mode
        )

    # -- inference --------------------------------------------------------

    def forward(
        self,
        sos_maps,
        num_iterations: Optional[int] = None,
        collect: tuple = ("rmse",),
        decimate: int = 1,
        *,
        normalize_source: bool = True,
        best_iterate: bool = True,
        chunk_iterations: Optional[int] = None,
        restart_on_divergence: bool = False,
        restart_factor: float = 10.0,
    ):
        """Run the learned solver. sos_maps: [B, H, W] (or [H, W]).

        `chunk_iterations` splits the rollout into host-level chunks of at
        most that many iterations (warm-started via rollout's `init`),
        bounding the duration of a single device execution — required for
        multi-thousand-iteration large-grid rollouts on runtimes that
        limit one dispatch (the tunneled TPU worker crashes past ~30 s).

        `restart_on_divergence` (needs chunking): the GMRES-restart analog
        for the learned rollout — far-OOD problems can send the recurrent
        hidden state into a diverging regime; when a sample ends a chunk
        with rmse > restart_factor x its best-so-far, the next chunk
        restarts that sample from its best-iterate wavefield with FRESH
        hidden states. Residual-monotone containment for the OOD regimes
        of PERF_NOTES.md (1024^2, extended/rescaled sources).

        Robustness wrappers for out-of-distribution problems (both default
        ON; the raw trajectory is available via `rollout`):

        * `normalize_source` — the network is trained on amplitude-10 point
          sources (experiments/base.json); arbitrary user source maps are
          rescaled per-sample so max |s| matches the training amplitude, the
          linear problem is solved at that scale, and every returned field /
          residual / rmse is scaled back to the user's source. Extended or
          re-scaled sources (e.g. the 512^2 skull arc transducer) stay in
          the network's input distribution this way.
        * `best_iterate` — long OOD rollouts can oscillate after reaching
          their best residual; `out['wavefield']` is the minimum-residual
          iterate (the robust answer and the GMRES warm start), with the
          raw final under `out['final_wavefield']`.
        """
        sos = jnp.asarray(sos_maps, jnp.float32)
        if sos.ndim == 2:
            sos = sos[None]
        iters = num_iterations or self.cfg.max_iterations
        source = self.source
        if source.shape[0] == 1 and sos.shape[0] > 1:
            source = jnp.broadcast_to(source, (sos.shape[0],) + source.shape[1:])
        scale = None
        if normalize_source:
            amp = jnp.max(
                jnp.sqrt(source[..., 0] ** 2 + source[..., 1] ** 2), axis=(1, 2)
            )  # [B] peak complex amplitude per sample
            scale = jnp.where(amp > 0, self.cfg.source.amplitude / amp, 1.0)
            source = source * scale[:, None, None, None]
        eff_collect = tuple(collect)
        if best_iterate and "best" not in eff_collect:
            eff_collect = eff_collect + ("best",)
        chunk = chunk_iterations or iters
        if chunk % decimate or iters % chunk:
            raise ValueError(
                "need decimate | chunk_iterations | num_iterations")
        if chunk_iterations and chunk < iters and "states" in eff_collect:
            # rollout's collected states trace shares the 'states' key
            # with the final carry the warm start needs
            raise ValueError(
                "collect='states' is unsupported with chunk_iterations")
        if restart_on_divergence and chunk >= iters:
            raise ValueError(
                "restart_on_divergence needs chunk_iterations < "
                "num_iterations (restarts happen at chunk boundaries)")
        if restart_on_divergence and "best" not in eff_collect:
            eff_collect = eff_collect + ("best",)
        out = None
        for _ in range(iters // chunk):
            init = None
            if out is not None:
                wf, states = out["wavefield"], out["states"]
                if restart_on_divergence:
                    end_rmse = residual_rmse(out["residual"])
                    bad = end_rmse > restart_factor * out["best_rmse"]
                    if bool(np.any(np.asarray(bad))):
                        wf = jnp.where(bad[:, None, None, None],
                                       out["best_wavefield"], wf)
                        states = tuple(
                            jnp.where(bad[:, None, None, None],
                                      jnp.zeros_like(s), s)
                            for s in states
                        )
                init = (wf, states)
            part = rollout(
                self.params,
                self.op,
                source,
                sos,
                cfg=self.cfg,
                num_iterations=chunk,
                collect=eff_collect,
                decimate=decimate,
                init=init,
            )
            if out is None:
                out = part
                continue
            for key in ("rmse", "wavefields", "residuals"):
                if key in part:
                    out[key] = jnp.concatenate([out[key], part[key]], axis=0)
            if "best_rmse" in part:  # merge best-iterate across chunks
                better = part["best_rmse"] < out["best_rmse"]
                out["best_wavefield"] = jnp.where(
                    better[:, None, None, None],
                    part["best_wavefield"], out["best_wavefield"],
                )
                out["best_rmse"] = jnp.minimum(part["best_rmse"],
                                               out["best_rmse"])
            for key in ("wavefield", "residual", "states"):
                out[key] = part[key]
        if scale is not None:
            # undo the linear rescale on every solution-linear output
            inv = 1.0 / scale
            for key, bcast in (
                ("wavefield", inv[:, None, None, None]),
                ("residual", inv[:, None, None, None]),
                ("best_wavefield", inv[:, None, None, None]),
                ("wavefields", inv[None, :, None, None, None]),
                ("residuals", inv[None, :, None, None, None]),
                ("rmse", inv[None, :]),
                ("best_rmse", inv),
            ):
                if key in out:
                    out[key] = out[key] * bcast
        if best_iterate:
            out["final_wavefield"] = out["wavefield"]
            out["wavefield"] = out["best_wavefield"]
        return out

    @classmethod
    def from_reference_checkpoint(cls, path: str, config: Optional[Config] = None):
        from ..train.checkpoint import load_reference_checkpoint

        params, ckpt_cfg = load_reference_checkpoint(path)
        return cls(config or ckpt_cfg, params=params)

    @classmethod
    def from_orbax_checkpoint(
        cls,
        directory: str,
        step: Optional[int] = None,
        config: Optional[Config] = None,
        best: bool = True,
    ):
        """Solver from a framework training run (orbax checkpoint dir).

        step=None picks the manifest's best-val_loss step (the reference's
        restore-best ModelCheckpoint semantics, train.py:90-97), falling
        back to the latest. Makes from-scratch-trained weights first-class
        in every eval/figure path alongside reference-format imports."""
        from ..models import hybridnet
        from ..train.checkpoint import (best_step, latest_step,
                                        restore_checkpoint)
        from ..train.loop import make_optimizer

        cfg = config or Config()
        if step is None:
            step = best_step(directory) if best else None
            if step is None:  # explicit None check: step 0 is valid
                step = latest_step(directory)
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {directory}")
        template = hybridnet.init_params(jax.random.PRNGKey(0), cfg.model)
        state = restore_checkpoint(
            directory, step,
            {"params": template,
             "opt_state": make_optimizer(cfg).init(template),
             "epoch": 0, "global_step": 0},
            sharded=True,  # restore onto the template leaves' shardings
        )
        return cls(cfg, params=state["params"])


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_iterations", "collect", "decimate")
)
def rollout_variable_source(
    params,
    op: SpectralPML,
    sources: jax.Array,
    switch_iterations: jax.Array,
    sos_maps: jax.Array,
    *,
    cfg: Config,
    num_iterations: int,
    collect: tuple = ("rmse",),
    decimate: int = 1,
):
    """Rollout with the source map changing over iterations (reference
    forward_variable_src, hybridnet.py:699-754).

    sources: [K, B, H, W, 2] stacked source maps; switch_iterations: [K]
    ascending iteration indices at which each source becomes active
    (switch_iterations[0] should be 0). At a switch, the residual is
    recomputed against the new source before stepping, matching the
    reference semantics.
    """
    if num_iterations % decimate != 0:
        raise ValueError("num_iterations must be divisible by decimate")
    k_sq, wavefield = get_initials(sos_maps, cfg.source.omega)
    states = get_architecture(cfg.model.architecture).init_states(
        sos_maps.shape[0], sos_maps.shape[1:3], cfg.model, sos_maps.dtype
    )

    def source_at(it):
        idx = jnp.sum(switch_iterations <= it) - 1
        return jax.lax.dynamic_index_in_dim(sources, idx, 0, keepdims=False)

    residual = helmholtz_residual(
        op, wavefield, k_sq, source_at(0), cfg.operator_mode
    )
    carry = SolverCarry(wavefield, residual, states)

    def inner_body(carry, it):
        src = source_at(it)
        # recompute residual on source switches (hybridnet.py:729-733)
        switched = jnp.any(switch_iterations == it) & (it > 0)
        residual = jnp.where(
            switched,
            helmholtz_residual(op, carry.wavefield, k_sq, src, cfg.operator_mode),
            carry.residual,
        )
        carry = single_step(
            params, op, src, k_sq,
            SolverCarry(carry.wavefield, residual, carry.states), cfg=cfg,
        )
        ys = {}
        if "rmse" in collect:
            ys["rmse"] = residual_rmse(carry.residual)
        return carry, ys

    def outer_body(carry_chunk, chunk):
        its = chunk * decimate + jnp.arange(decimate)
        carry, inner_ys = jax.lax.scan(inner_body, carry_chunk, its)
        ys = dict(inner_ys)
        if "wavefields" in collect:
            ys["wavefields"] = carry.wavefield
        if "residuals" in collect:
            ys["residuals"] = carry.residual
        if "states" in collect:
            ys["states"] = get_architecture(
                cfg.model.architecture
            ).flatten_states(carry.states)
        return carry, ys

    carry, ys = jax.lax.scan(
        outer_body, carry, jnp.arange(num_iterations // decimate)
    )
    out = {"wavefield": carry.wavefield, "residual": carry.residual}
    if "rmse" in ys:
        r = ys.pop("rmse")
        out["rmse"] = r.reshape(num_iterations, *r.shape[2:])
    out.update(ys)
    return out
