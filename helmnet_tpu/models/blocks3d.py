"""3D convolution building blocks — functional, NDHWC, params-as-pytrees.

Capability extension: the reference (ucl-bug/helmnet) is strictly 2D
(architectures.py:47-132 are all nn.Conv2d). Transcranial-ultrasound
deployment is 3D, so the framework carries a 3D UNet family built on the
same TPU-first conventions as models/blocks.py (NHWC -> NDHWC, params as
pytrees, `lax.conv_general_dilated` so GSPMD can shard spatial dims and the
MXU sees plain convolutions).

Deliberate 3D design deviations from the 2D blocks (documented, not ports):

* down/up kernels are k=4, s=2, p=1 instead of the 2D k=8, p=3 — kernel
  taps grow cubically (8^3 = 512 vs 4^3 = 64) and the 2D choice would make
  resampling dominate the step cost 8x over the 2D network;
* the transposed conv has a sub-pixel lowering with EIGHT phase convs
  (2^3, one per output-parity octant) at input resolution — identical math
  to the input-dilated form, 8x fewer MXU FLOPs (the dilated input is 7/8
  structural zeros that XLA cannot elide).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .activations import get_activation
from .blocks import resolve_precision

_DN3 = ("NDHWC", "DHWIO", "NDHWC")


def conv3d(params, x, *, stride: int = 1, padding: int = 0,
           precision: str = "highest"):
    """3D convolution, NDHWC x DHWIO -> NDHWC, torch Conv3d semantics."""
    y = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(stride,) * 3,
        padding=((padding, padding),) * 3,
        dimension_numbers=_DN3,
        precision=resolve_precision(precision),
    )
    return y + params["b"]


def conv_transpose3d(params, x, *, stride: int = 2, padding: int = 1,
                     precision: str = "highest"):
    """Torch ConvTranspose3d(k, stride, padding) semantics via input
    dilation. Kernel stored pre-flipped DHWIO (as in the 2D module)."""
    k = params["w"].shape[0]
    p = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(1, 1, 1),
        padding=((p, p),) * 3,
        lhs_dilation=(stride,) * 3,
        dimension_numbers=_DN3,
        precision=resolve_precision(precision),
    )
    return y + params["b"]


def conv_transpose3d_subpixel(params, x, *, stride: int = 2,
                              padding: int = 1,
                              precision: str = "highest"):
    """Same math as `conv_transpose3d` (even k, s=2), 8x fewer MXU FLOPs.

    Direct 3D generalization of blocks.conv_transpose2d_subpixel: each
    output-parity octant (a, b, c) = (z%2, y%2, x%2) touches one parity
    class of kernel taps per axis, so the op decomposes into eight
    independent (k/2)^3-tap convs at INPUT resolution, interleaved after.
    """
    w = params["w"]  # pre-flipped DHWIO
    k = w.shape[0]
    if stride != 2 or k % 2:
        raise ValueError("subpixel path supports stride 2, even k only")
    p = k - 1 - padding
    prec = resolve_precision(precision)
    half = k // 2

    # 1D tap algebra per axis (see blocks.conv_transpose2d_subpixel):
    # output parity a selects taps j ≡ (p+a) (mod 2); left pad (p-a)//2.
    def axis(a):
        return (p + a) % 2, (p - a) // 2

    octants = []
    for a in (0, 1):
        fa, la = axis(a)
        for b in (0, 1):
            fb, lb = axis(b)
            for c in (0, 1):
                fc, lc = axis(c)
                sub = w[fa::2, fb::2, fc::2]
                y = jax.lax.conv_general_dilated(
                    x, sub,
                    window_strides=(1, 1, 1),
                    padding=(
                        (la, half - 1 - la),
                        (lb, half - 1 - lb),
                        (lc, half - 1 - lc),
                    ),
                    dimension_numbers=_DN3,
                    precision=prec,
                )
                octants.append(y)
    bsz, d, h, wdt, o = octants[0].shape
    z = jnp.stack(octants, 0).reshape(2, 2, 2, bsz, d, h, wdt, o)
    # out[:, 2m+a, 2n+b, 2q+c] = z[a, b, c, :, m, n, q]
    out = jnp.transpose(z, (3, 4, 0, 5, 1, 6, 2, 7)).reshape(
        bsz, 2 * d, 2 * h, 2 * wdt, o
    )
    return out + params["b"]


# ---------------------------------------------------------------------------
# Initializers (same policy as 2D: xavier-normal gain .02 on conv weights)
# ---------------------------------------------------------------------------


def init_conv3d(key, k: int, cin: int, cout: int, gain: float = 0.02):
    wk, bk = jax.random.split(key)
    fan_in = cin * k**3
    fan_out = cout * k**3
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    w = std * jax.random.normal(wk, (k, k, k, cin, cout), jnp.float32)
    bound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_conv_transpose3d(key, k: int, cin: int, cout: int):
    wk, bk = jax.random.split(key)
    fan_in = cout * k**3  # torch fan-in convention for transposed conv
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(wk, (k, k, k, cin, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


# ---------------------------------------------------------------------------
# DoubleConv3D: conv3x3x3 -> activation -> conv3x3x3 (no act after 2nd)
# ---------------------------------------------------------------------------


def init_double_conv3d(key, cin: int, cout: int, activation: str, cmid=None):
    cmid = cout if cmid is None else cmid
    k1, k2, ka = jax.random.split(key, 3)
    act_init, _ = get_activation(activation)
    return {
        "c1": init_conv3d(k1, 3, cin, cmid),
        "act": act_init(ka),
        "c2": init_conv3d(k2, 3, cmid, cout),
    }


def double_conv3d(params, x, activation: str, precision: str = "highest"):
    _, act = get_activation(activation)
    h = conv3d(params["c1"], x, padding=1, precision=precision)
    h = act(params["act"], h)
    return conv3d(params["c2"], h, padding=1, precision=precision)
