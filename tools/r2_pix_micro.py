"""Isolate where the pixel-packed DoubleConv kernel spends its time.

Scans L applications of one enc0-shaped DoubleConv (96^2 x 32, cin=10)
and times, via the difference method: XLA | pix kernel | pix kernel with
the patch assembly stubbed out (same shapes, no rolls/masks/concats —
matmul-only) | pix with assembly but no edge block. The deltas attribute
the kernel time to MXU vs VPU assembly work.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
L = 50


def main():
    import jax
    import jax.numpy as jnp

    from helmnet_tpu.models.blocks import double_conv, init_double_conv
    from helmnet_tpu.ops import pallas_pixconv as ppx

    p = init_double_conv(jax.random.PRNGKey(0), 10, 8, "prelu")
    x0 = jax.random.normal(jax.random.PRNGKey(1), (32, 96, 96, 10))

    def scan_of(fn):
        def run(n):
            @jax.jit
            def go(x):
                def body(c, _):
                    y = fn(c)
                    return c * 0.999 + 1e-9 * jnp.mean(y), None
                c, _ = jax.lax.scan(body, x, None, length=n)
                return c
            return go
        return run

    def per_iter(fn):
        run = scan_of(fn)
        def best(g):
            np.asarray(g(x0).ravel()[:4])
            ts = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(g(x0).ravel()[:4])
                ts.append(time.time() - t0)
            return min(ts)
        t1 = best(run(L))
        t4 = best(run(4 * L))
        return (t4 - t1) / (3 * L) * 1e3  # ms

    out = {}
    out["xla_ms"] = per_iter(lambda x: double_conv(p, x, "prelu", "default"))
    print("xla_ms:", out["xla_ms"], flush=True)
    out["pix_ms"] = per_iter(lambda x: ppx.fused_double_conv_pix(p, x))
    print("pix_ms:", out["pix_ms"], flush=True)

    real_assemble = ppx._assemble

    def stub_assemble(xv, gr, wpr, S, n_rows):
        # same output shape, no rolls/masks: 3 aliases + a static slice
        return jnp.concatenate([xv, xv, xv, xv[:, :128]], axis=1)

    ppx._assemble = stub_assemble
    ppx.fused_double_conv_pix.clear_cache()
    try:
        out["pix_noassembly_ms"] = per_iter(
            lambda x: ppx.fused_double_conv_pix(p, x))
        print("pix_noassembly_ms:", out["pix_noassembly_ms"], flush=True)
    finally:
        ppx._assemble = real_assemble
        ppx.fused_double_conv_pix.clear_cache()

    def noedge_assemble(xv, gr, wpr, S, n_rows):
        # rolls + row masks but no edge block construction
        import jax.numpy as jnp
        from jax.experimental.pallas import tpu as pltpu
        rows, lanes = xv.shape
        img = gr // wpr
        blocks = []
        for dy in (-1, 0, 1):
            A = pltpu.roll(xv, (-dy * wpr) % rows, 0) if dy else xv
            rowok = (img + dy >= 0) & (img + dy < n_rows)
            blocks.append(jnp.where(rowok, A, 0.0))
        return jnp.concatenate(blocks + [xv[:, :128]], axis=1)

    ppx._assemble = noedge_assemble
    ppx.fused_double_conv_pix.clear_cache()
    try:
        out["pix_noedge_ms"] = per_iter(
            lambda x: ppx.fused_double_conv_pix(p, x))
        print("pix_noedge_ms:", out["pix_noedge_ms"], flush=True)
    finally:
        ppx._assemble = real_assemble
        ppx.fused_double_conv_pix.clear_cache()

    print(json.dumps(out, indent=2))
    with open(os.path.join(ROOT, "R2_PIX_MICRO.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
