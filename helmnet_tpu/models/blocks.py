"""Convolution building blocks — functional, NHWC, params-as-pytrees.

Torch-semantics-equivalent primitives (conv2d with symmetric padding,
strided down-conv k=8/p=3/s=2, transposed conv k=8/p=3/s=2) expressed the
XLA way with `lax.conv_general_dilated` so GSPMD can shard spatial dims and
the MXU sees plain convolutions. Reference blocks: architectures.py:47-132.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .activations import get_activation

_DN = ("NHWC", "HWIO", "NHWC")

# Precision policy: 'highest' (6-pass f32, bit-parity with the reference),
# 'high' (3-pass), 'default' (1-pass bf16 inputs — fastest). The learned
# iteration is self-correcting: network precision only affects convergence
# speed, never the reported residual (the operator stays HIGHEST).
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def resolve_precision(name: str):
    return _PRECISIONS[name]


def conv2d(params, x, *, stride: int = 1, padding: int = 0,
           precision: str = "highest"):
    """2D convolution, NHWC x HWIO -> NHWC, torch Conv2d semantics."""
    y = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DN,
        precision=resolve_precision(precision),
    )
    return y + params["b"]


def conv_transpose2d(params, x, *, stride: int = 2, padding: int = 3,
                     precision: str = "highest"):
    """Torch ConvTranspose2d(k, stride, padding, output_padding=0) semantics.

    Implemented as an input-dilated convolution: pad = k - 1 - padding, with
    the kernel stored pre-flipped in HWIO (see `torch_convtranspose_to_hwio`).
    """
    k = params["w"].shape[0]
    p = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(1, 1),
        padding=((p, p), (p, p)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN,
        precision=resolve_precision(precision),
    )
    return y + params["b"]


def conv_transpose2d_subpixel(params, x, *, stride: int = 2, padding: int = 3,
                              precision: str = "highest"):
    """Same math as `conv_transpose2d` (k=8, s=2, p=3), 4x fewer MXU passes.

    The input-dilated formulation contracts over a K = k*k*Cin window at
    OUTPUT resolution where 3 of 4 input values are structural zeros. Each
    output phase (a, b) = (row%2, col%2) only touches one parity class of
    kernel taps, so the op decomposes into four independent k/2-tap convs at
    INPUT resolution (sub-pixel convolution), interleaved afterwards:
    K-tiles x M drops from 4k²Cin/128 x M_out to 4 x k²Cin/128 x M_out/4.
    Exactly equal results (same contractions, same order-free sum).
    """
    w = params["w"]  # pre-flipped HWIO, see torch_convtranspose_to_hwio
    k = w.shape[0]
    if stride != 2 or k % 2:
        raise ValueError("subpixel path supports stride 2, even k only")
    p = k - 1 - padding  # dilated-conv pad (4 for k=8, p=3)
    prec = resolve_precision(precision)
    # 1D tap algebra: y[2m+a] = sum_j xd[2m + a - p + j]*wf[j]; the dilated
    # input is nonzero only at even indices, so j ≡ (p + a) mod 2 and with
    # j = 2s + (p+a)%2 the contribution is x[m + s - (p-a)//2]*wf[j]:
    # a k/2-tap conv with left pad (p-a)//2, right pad k/2-1 - (p-a)//2.
    phases = []
    for a in (0, 1):
        la = (p - a) // 2
        for_a = (p + a) % 2
        row = []
        for b in (0, 1):
            lb = (p - b) // 2
            sub = w[for_a::2, (p + b) % 2 :: 2]
            y = jax.lax.conv_general_dilated(
                x, sub,
                window_strides=(1, 1),
                padding=((la, k // 2 - 1 - la), (lb, k // 2 - 1 - lb)),
                dimension_numbers=_DN,
                precision=prec,
            )
            row.append(y)
        phases.append(row)
    # interleave phases: out[:, 2m+a, 2n+b] = phases[a][b][:, m, n]
    z = jnp.stack([jnp.stack(r, axis=0) for r in phases], axis=0)  # [2,2,B,H,W,O]
    b_, h, wdt, o = phases[0][0].shape
    out = jnp.transpose(z, (2, 3, 0, 4, 1, 5)).reshape(b_, 2 * h, 2 * wdt, o)
    return out + params["b"]


# ---------------------------------------------------------------------------
# Torch weight-layout converters (for the pretrained-checkpoint importer)
# ---------------------------------------------------------------------------


def torch_conv_to_hwio(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def torch_convtranspose_to_hwio(w: np.ndarray) -> np.ndarray:
    """(I, O, kh, kw) -> spatially flipped (kh, kw, I, O) for dilated conv."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


# ---------------------------------------------------------------------------
# Initializers (match reference training setup: xavier-normal gain .02 on
# conv weights — hybridnet.py:70-75 — torch-default elsewhere)
# ---------------------------------------------------------------------------


def init_conv(key, k: int, cin: int, cout: int, gain: float = 0.02):
    wk, bk = jax.random.split(key)
    fan_in = cin * k * k
    fan_out = cout * k * k
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    w = std * jax.random.normal(wk, (k, k, cin, cout), jnp.float32)
    bound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_conv_transpose(key, k: int, cin: int, cout: int):
    # torch ConvTranspose2d default (kaiming-uniform a=sqrt(5))
    wk, bk = jax.random.split(key)
    fan_in = cout * k * k  # torch fan-in convention for transposed conv
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(wk, (k, k, cin, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


# ---------------------------------------------------------------------------
# DoubleConv: conv3x3 -> activation -> conv3x3 (NO activation after 2nd conv)
# ---------------------------------------------------------------------------


def init_double_conv(key, cin: int, cout: int, activation: str, cmid=None):
    cmid = cout if cmid is None else cmid
    k1, k2, ka = jax.random.split(key, 3)
    act_init, _ = get_activation(activation)
    return {
        "c1": init_conv(k1, 3, cin, cmid),
        "act": act_init(ka),
        "c2": init_conv(k2, 3, cmid, cout),
    }


def double_conv(params, x, activation: str, precision: str = "highest"):
    _, act = get_activation(activation)
    h = conv2d(params["c1"], x, padding=1, precision=precision)
    h = act(params["act"], h)
    return conv2d(params["c2"], h, padding=1, precision=precision)


def res_double_conv(params, x, activation: str, precision: str = "highest"):
    """DoubleConv with residual skip (reference ResDoubleConv)."""
    return double_conv(params, x, activation, precision) + x
