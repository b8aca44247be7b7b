"""Pseudospectral time-domain CW solver — independent ground truth.

Plays the role of k-Wave's `kspaceFirstOrder2DG` in the reference pipeline
(matlab/kwave_solver.m): solve the second-order wave equation

    d2p/dt2 = c(x)^2 (Lap p + s(x) cos(w t))

to steady state with a leapfrog + spectral-Laplacian scheme and extract the
complex phasor P(x) by Fourier projection over the last `record_periods`
periods (kwave_solver.m:40-64 records the last 3 periods and takes
amp/phase). Boundaries use an exponential sponge layer — deliberately a
DIFFERENT absorbing-boundary discretization from the Helmholtz PML, so
agreement between the two is a genuine independent cross-check (fields are
compared source-normalized over the interior, the reference's own
convention, support_functions.py:23-48).

Entirely on-device: two lax.scans (transient, then recording with running
cos/sin projections) — no time-series storage.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spectral import wavenumbers


class TimeDomainResult(NamedTuple):
    phasor: jax.Array  # [H, W, 2] channel-pair steady-state complex field
    num_steps: jax.Array
    dt: jax.Array


def _sponge_sigma(h: int, w: int, width: int, strength: float) -> np.ndarray:
    """Absorption rate map sigma(x) [1/time]: strength * quadratic ramp in
    the border band (Cerjan sponge). The per-step damping factor is
    exp(-sigma * dt), so results are dt-invariant."""
    def ramp(n):
        r = np.zeros(n)
        j = np.arange(width)
        edge = ((width - j) / width) ** 2
        r[:width] = edge
        r[-width:] = edge[::-1]
        return r
    ry = ramp(h)[:, None]
    rx = ramp(w)[None, :]
    return (strength * (ry + rx)).astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=("omega", "cfl", "roundtrips", "record_periods",
                     "sponge_width", "sponge_strength"),
)
def solve_cw(
    sos: jax.Array,
    source_amplitude_map: jax.Array,
    *,
    omega: float = 1.0,
    cfl: float = 0.1,
    roundtrips: int = 10,
    record_periods: int = 3,
    sponge_width: int = 16,
    sponge_strength: float = 1.0,
) -> TimeDomainResult:
    """Run the CW simulation on one [H, W] sos map.

    source_amplitude_map: real [H, W] spatial amplitude (the |map| the
    source module builds). cfl/roundtrips follow the reference knobs
    (kwave_solver.m:26-38: dt = cfl*dx/c_max, t_end = roundtrips * diagonal
    / c_min).
    """
    h, w = sos.shape
    sos = jnp.asarray(sos, jnp.float32)
    src = jnp.asarray(source_amplitude_map, jnp.float32)

    dx = 1.0
    c_max = jnp.max(sos)
    c_min = jnp.min(sos)
    dt = cfl * dx / c_max
    diag = jnp.sqrt(jnp.asarray(float(h * h + w * w)))
    t_end = roundtrips * diag / c_min
    n_total = jnp.ceil(t_end / dt).astype(jnp.int32)
    period = 2.0 * jnp.pi / omega
    n_record = jnp.ceil(record_periods * period / dt).astype(jnp.int32)
    n_transient = jnp.maximum(n_total - n_record, 0)

    kx = jnp.asarray(wavenumbers(w), jnp.float32)
    ky = jnp.asarray(wavenumbers(h), jnp.float32)
    ksq = ky[:, None] ** 2 + kx[None, :] ** 2
    # k-space dispersion correction (k-Wave's kappa): the leapfrog scheme is
    # exact for c == c_ref at any dt with -k^2 sinc^2(c_ref |k| dt / 2)
    kappa = jnp.sinc(c_max * jnp.sqrt(ksq) * dt / (2.0 * jnp.pi))
    neg_ksq = -(ksq * kappa**2)
    damp = jnp.exp(
        -jnp.asarray(_sponge_sigma(h, w, sponge_width, sponge_strength)) * dt
    )
    c2 = sos**2

    def laplacian(p):
        pf = jnp.fft.fft2(jax.lax.complex(p, jnp.zeros_like(p)))
        return jnp.fft.ifft2(neg_ksq * pf).real

    def step(carry, n):
        # leapfrog + Cerjan sponge: damp both time levels after the update
        p, p_prev = carry
        t = n.astype(jnp.float32) * dt
        accel = c2 * (laplacian(p) + src * jnp.cos(omega * t))
        p_next = 2.0 * p - p_prev + dt * dt * accel
        return (damp * p_next, damp * p), damp * p_next

    # fixed upper bounds keep shapes static; steps beyond n are masked no-ops
    # by scanning exactly the computed counts via fori_loop
    p = jnp.zeros((h, w), jnp.float32)
    p_prev = jnp.zeros((h, w), jnp.float32)

    def transient_body(n, carry):
        return step(carry, n)[0]

    p, p_prev = jax.lax.fori_loop(0, n_transient, transient_body, (p, p_prev))

    # recording phase: accumulate projections onto cos/sin
    def record_body(n, carry):
        (p, p_prev), acc_c, acc_s = carry
        new_state, p_new = step((p, p_prev), n)
        t = n.astype(jnp.float32) * dt
        acc_c = acc_c + p_new * jnp.cos(omega * t)
        acc_s = acc_s + p_new * jnp.sin(omega * t)
        return new_state, acc_c, acc_s

    zeros = jnp.zeros((h, w), jnp.float32)
    (p, p_prev), acc_c, acc_s = jax.lax.fori_loop(
        n_transient, n_transient + n_record, record_body,
        ((p, p_prev), zeros, zeros),
    )
    # p(t) = Re{P e^{-i w t}} = Pr cos + Pi sin  ->  projections give P/2 * n
    scale = 2.0 / jnp.maximum(n_record.astype(jnp.float32), 1.0)
    phasor = jnp.stack([acc_c * scale, acc_s * scale], axis=-1)
    return TimeDomainResult(
        phasor=phasor, num_steps=n_transient + n_record, dt=dt
    )


def _sponge_sigma3d(d: int, h: int, w: int, width: int,
                    strength: float) -> np.ndarray:
    """3D Cerjan sponge rate map (quadratic border ramp per axis)."""
    def ramp(n):
        r = np.zeros(n)
        j = np.arange(width)
        edge = ((width - j) / width) ** 2
        r[:width] = edge
        r[-width:] = edge[::-1]
        return r
    rz = ramp(d)[:, None, None]
    ry = ramp(h)[None, :, None]
    rx = ramp(w)[None, None, :]
    return (strength * (rz + ry + rx)).astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=("omega", "cfl", "roundtrips", "record_periods",
                     "sponge_width", "sponge_strength"),
)
def solve_cw3d(
    sos: jax.Array,
    source_amplitude_map: jax.Array,
    *,
    omega: float = 1.0,
    cfl: float = 0.1,
    roundtrips: int = 10,
    record_periods: int = 3,
    sponge_width: int = 12,
    sponge_strength: float = 1.0,
) -> TimeDomainResult:
    """3D CW pseudospectral time-domain solve on one [D, H, W] sos map.

    The 3D independent ground truth the round-3 verdict called for: the
    reference validates its Helmholtz solutions against k-Wave's
    time-domain scheme (matlab/kwave_solver.m:19-64, driven from
    support_functions.py:375-418) — a DIFFERENT discretization (leapfrog
    in time, sponge boundaries vs direct solve with spectral PML). The
    repo's 3D stack was previously anchored only to 3D CSLP-GMRES, which
    discretizes the SAME spectral operator; this closes the
    methodological gap. Same scheme as solve_cw with fftn / 3D sponge.
    """
    d, h, w = sos.shape
    sos = jnp.asarray(sos, jnp.float32)
    src = jnp.asarray(source_amplitude_map, jnp.float32)

    dx = 1.0
    c_max = jnp.max(sos)
    c_min = jnp.min(sos)
    dt = cfl * dx / c_max
    diag = jnp.sqrt(jnp.asarray(float(d * d + h * h + w * w)))
    t_end = roundtrips * diag / c_min
    n_total = jnp.ceil(t_end / dt).astype(jnp.int32)
    period = 2.0 * jnp.pi / omega
    n_record = jnp.ceil(record_periods * period / dt).astype(jnp.int32)
    n_transient = jnp.maximum(n_total - n_record, 0)

    kz = jnp.asarray(wavenumbers(d), jnp.float32)
    ky = jnp.asarray(wavenumbers(h), jnp.float32)
    kx = jnp.asarray(wavenumbers(w), jnp.float32)
    ksq = (kz[:, None, None] ** 2 + ky[None, :, None] ** 2
           + kx[None, None, :] ** 2)
    kappa = jnp.sinc(c_max * jnp.sqrt(ksq) * dt / (2.0 * jnp.pi))
    neg_ksq = -(ksq * kappa**2)
    damp = jnp.exp(
        -jnp.asarray(_sponge_sigma3d(d, h, w, sponge_width,
                                     sponge_strength)) * dt
    )
    c2 = sos**2

    def laplacian(p):
        pf = jnp.fft.fftn(jax.lax.complex(p, jnp.zeros_like(p)))
        return jnp.fft.ifftn(neg_ksq * pf).real

    def step(carry, n):
        p, p_prev = carry
        t = n.astype(jnp.float32) * dt
        accel = c2 * (laplacian(p) + src * jnp.cos(omega * t))
        p_next = 2.0 * p - p_prev + dt * dt * accel
        return (damp * p_next, damp * p), damp * p_next

    p = jnp.zeros((d, h, w), jnp.float32)
    p_prev = jnp.zeros((d, h, w), jnp.float32)

    def transient_body(n, carry):
        return step(carry, n)[0]

    p, p_prev = jax.lax.fori_loop(0, n_transient, transient_body,
                                  (p, p_prev))

    def record_body(n, carry):
        (p, p_prev), acc_c, acc_s = carry
        new_state, p_new = step((p, p_prev), n)
        t = n.astype(jnp.float32) * dt
        acc_c = acc_c + p_new * jnp.cos(omega * t)
        acc_s = acc_s + p_new * jnp.sin(omega * t)
        return new_state, acc_c, acc_s

    zeros = jnp.zeros((d, h, w), jnp.float32)
    (p, p_prev), acc_c, acc_s = jax.lax.fori_loop(
        n_transient, n_transient + n_record, record_body,
        ((p, p_prev), zeros, zeros),
    )
    scale = 2.0 / jnp.maximum(n_record.astype(jnp.float32), 1.0)
    phasor = jnp.stack([acc_c * scale, acc_s * scale], axis=-1)
    return TimeDomainResult(
        phasor=phasor, num_steps=n_transient + n_record, dt=dt
    )


@functools.partial(jax.jit, static_argnames=("count", "record"))
def _cw3d_chunk(p, p_prev, acc_c, acc_s, n0, dt, omega_t, neg_ksq, damp,
                c2, src, *, count: int, record: bool):
    """`count` leapfrog steps in ONE dispatch, starting at step index n0.
    All field-sized operands are ARGUMENTS (never closed over) so nothing
    is baked into the executable as a constant. Identical step math to
    solve_cw3d so chunked == monolithic."""
    def body(n, carry):
        p, p_prev, ac, as_ = carry
        t = n.astype(jnp.float32) * dt
        pf = jnp.fft.fftn(jax.lax.complex(p, jnp.zeros_like(p)))
        lap = jnp.fft.ifftn(neg_ksq * pf).real
        accel = c2 * (lap + src * jnp.cos(omega_t * t))
        p_next = 2.0 * p - p_prev + dt * dt * accel
        p_next, p_d = damp * p_next, damp * p
        if record:
            ac = ac + p_next * jnp.cos(omega_t * t)
            as_ = as_ + p_next * jnp.sin(omega_t * t)
        return p_next, p_d, ac, as_

    return jax.lax.fori_loop(n0, n0 + count, body,
                             (p, p_prev, acc_c, acc_s))


def solve_cw3d_chunked(
    sos: jax.Array,
    source_amplitude_map: jax.Array,
    *,
    omega: float = 1.0,
    cfl: float = 0.1,
    roundtrips: int = 10,
    record_periods: int = 3,
    sponge_width: int = 12,
    sponge_strength: float = 1.0,
    chunk_steps: int = 2000,
    verbose: bool = False,
) -> TimeDomainResult:
    """solve_cw3d driven from the HOST in `chunk_steps`-step dispatches.

    A larger-than-test 3D rollout (e.g. 128^3 x tens of thousands of
    leapfrog steps) in one jitted dispatch exceeds the tunneled worker's
    ~30 s single-dispatch limit and crashes it (CLAUDE.md); this carries
    (p, p_prev, acc_c, acc_s) across host-level calls, analogous to
    forward(chunk_iterations=...) and the host-driven GMRES cycles.
    Numerically identical step sequence to solve_cw3d (same body, same
    order); the last partial chunk uses a second executable.
    """
    import time as _time

    sos = jnp.asarray(sos, jnp.float32)
    src = jnp.asarray(source_amplitude_map, jnp.float32)
    d, h, w = sos.shape

    # plan on host (two scalar fetches), mirroring solve_cw3d's traced math
    c_min, c_max = (float(x) for x in
                    jax.device_get((jnp.min(sos), jnp.max(sos))))
    dx = 1.0
    dt = cfl * dx / c_max
    diag = float(np.sqrt(d * d + h * h + w * w))
    n_total = int(np.ceil(roundtrips * diag / c_min / dt))
    period = 2.0 * np.pi / omega
    n_record = int(np.ceil(record_periods * period / dt))
    n_transient = max(n_total - n_record, 0)

    kz = jnp.asarray(wavenumbers(d), jnp.float32)
    ky = jnp.asarray(wavenumbers(h), jnp.float32)
    kx = jnp.asarray(wavenumbers(w), jnp.float32)
    ksq = (kz[:, None, None] ** 2 + ky[None, :, None] ** 2
           + kx[None, None, :] ** 2)
    kappa = jnp.sinc(c_max * jnp.sqrt(ksq) * dt / (2.0 * jnp.pi))
    neg_ksq = -(ksq * kappa**2)
    damp = jnp.exp(
        -jnp.asarray(_sponge_sigma3d(d, h, w, sponge_width,
                                     sponge_strength)) * dt)
    c2 = sos**2
    dt_dev = jnp.float32(dt)
    om_dev = jnp.float32(omega)

    zeros = jnp.zeros((d, h, w), jnp.float32)
    p, p_prev, acc_c, acc_s = zeros, zeros, zeros, zeros
    t0 = _time.time()

    def run_span(start, stop, record):
        nonlocal p, p_prev, acc_c, acc_s
        n = start
        while n < stop:
            cnt = min(chunk_steps, stop - n)
            p, p_prev, acc_c, acc_s = _cw3d_chunk(
                p, p_prev, acc_c, acc_s, jnp.int32(n), dt_dev, om_dev,
                neg_ksq, damp, c2, src, count=cnt, record=record)
            n += cnt
            if verbose:
                # tiny fetch forces completion without pulling the field
                _ = float(jax.device_get(p[0, 0, 0]))
                print(f"  cw3d[{n}/{n_transient + n_record}] "
                      f"{_time.time() - t0:.1f}s", flush=True)

    run_span(0, n_transient, record=False)
    run_span(n_transient, n_transient + n_record, record=True)

    scale = 2.0 / max(float(n_record), 1.0)
    phasor = jnp.stack([acc_c * scale, acc_s * scale], axis=-1)
    return TimeDomainResult(
        phasor=phasor,
        num_steps=jnp.int32(n_transient + n_record),
        dt=jnp.float32(dt),
    )
