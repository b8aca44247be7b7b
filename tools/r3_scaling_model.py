"""Analytic comm/compute weak-scaling model for the distributed paths.

BASELINE.md's criterion is ">=80% nnz/s weak-scaling efficiency on 2
hosts". This environment has exactly ONE real chip (CLAUDE.md), so the
criterion cannot be measured; the round-2 attempt (SCALING.json, 22% at
8 virtual CPU devices sharing 4 cores) measured host-core contention,
not interconnect scaling, and was honestly flagged as meaningless.

This tool replaces that non-measurement with the standard analytic
model (the scaling-book recipe: per-device compute time from measured
single-chip numbers, comm time from message volume / link bandwidth,
efficiency = t_compute / (t_compute + t_comm_exposed)), evaluated for
every distributed path the framework ships:

  1. halo-exchange stencil residual (distributed/halo.py): 2 ppermute
     messages per axis per apply, radius*edge*2ch*4B each.
  2. slab-FFT spectral Laplacian (distributed/dfft.py): one all-to-all
     transpose each way per apply.
  3. DP training step (train/loop.py + core/meshes.py): one gradient
     all-reduce (psum) of the 140k-param pytree per step.

Assumptions (stated, conservative):
  * TPU v5e ICI: 4.5e10 B/s one-way per link, ~1 us message latency
    (public "How to Scale Your Model" numbers). DCN (2-host): 2.5e10
    B/s per host, ~10 us.
  * No compute/comm overlap (worst case — XLA overlaps ppermute with
    interior compute when it can, so real efficiency is HIGHER).
  * Per-device compute times from the measured on-chip opx_* table
    (R2_TPU_EXTRAS.json, tools/r3_op_crossover.py) at 1024^2 per
    device; the training step from the measured 4.6 s/epoch run.

Writes SCALING_MODEL.json. Verdict lands in PERF_NOTES.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(__file__), "..")

ICI_BW = 4.5e10        # B/s one-way per link, v5e
ICI_LAT = 1e-6         # s per message
DCN_BW = 2.5e10        # B/s per host
DCN_LAT = 10e-6


def halo_model(n_local=1024, radius=4, t_compute_ms=None, devices=(2, 4, 8)):
    """Halo-exchange stencil residual, n_local^2 per device."""
    extras = json.load(open(os.path.join(ROOT, "R2_TPU_EXTRAS.json")))
    if t_compute_ms is None:
        # measured single-chip residual apply at the per-device size;
        # stencil apply is cheaper than spectral, so this overstates
        # compute — but comm is so small the conclusion is insensitive.
        t_compute_ms = extras["opx_1024"]["fft"]["ms_per_apply"]
    t_c = t_compute_ms * 1e-3
    rows = {}
    for d in devices:
        # 1D ring decomposition along y: 2 messages (up/down) per apply,
        # each radius * n_local * 2ch * 4B; sent concurrently on
        # separate links (conservative: serialize them).
        msg = radius * n_local * 2 * 4
        t_comm = 2 * (msg / ICI_BW + ICI_LAT)
        eff = t_c / (t_c + t_comm)
        rows[d] = {
            "bytes_per_apply": 2 * msg,
            "t_compute_ms": round(t_compute_ms, 3),
            "t_comm_us": round(t_comm * 1e6, 2),
            "efficiency": round(eff, 5),
        }
    return rows


def dfft_model(n_local=1024, devices=(2, 4, 8)):
    """Slab-FFT Laplacian: all-to-all transpose each way per apply.

    Each device holds an n_local x N slab (N = n_local * d globally is
    weak scaling in one axis; keep per-device volume fixed): transpose
    moves (d-1)/d of the local complex64 slab, twice per apply."""
    extras = json.load(open(os.path.join(ROOT, "R2_TPU_EXTRAS.json")))
    t_c = extras["opx_1024"]["fft"]["ms_per_apply"] * 1e-3
    rows = {}
    for d in devices:
        local_bytes = n_local * n_local * 8  # complex64 slab
        moved = local_bytes * (d - 1) / d
        # all-to-all on a ring: bisection-limited; each device sends
        # `moved` bytes total across (d-1) peers, link-serial worst case
        t_comm = 2 * (moved / ICI_BW + (d - 1) * ICI_LAT)
        eff = t_c / (t_c + t_comm)
        rows[d] = {
            "bytes_per_apply": int(2 * moved),
            "t_compute_ms": round(t_c * 1e3, 3),
            "t_comm_us": round(t_comm * 1e6, 1),
            "efficiency": round(eff, 4),
        }
    return rows


def slab3d_model(n_global=512, devices=(2, 4, 8)):
    """3D z-slab per-axis-matmul residual (distributed/slab3d.py), weak
    scaling at a 512^3 global volume (one chip holds 256^3; 512^3 is the
    first size that NEEDS the decomposition).

    Compute: effective matmul rate from the measured on-chip 256^3 apply
    (helm3d_residual_256cubed_matmul, 8.62 ms for 3*8*256^4 flops =
    ~12 TF/s effective at these skinny-GEMM shapes). Per device at
    512^3 / d: all three axis GEMMs split evenly.

    Comm per apply:
      transpose: 2 all_to_alls moving (d-1)/d of the LOCAL complex64
        shard each way;
      scatter: one psum_scatter moving (d-1)/d of the FULL field.
    """
    extras = json.load(open(os.path.join(ROOT, "R2_TPU_EXTRAS.json")))
    ms256 = extras["helm3d_residual_256cubed_matmul"]["ms_per_apply"]
    rate = 3 * 8 * 256**4 / (ms256 * 1e-3)  # effective flop/s
    full_bytes = n_global**3 * 8  # complex64 field
    flops = 3 * 8 * n_global**4
    nc = 4  # overlap_chunks default in make_sharded_residual3d
    rows = {}
    for d in devices:
        t_c = flops / d / rate
        local = full_bytes / d
        t_tr = 2 * (local * (d - 1) / d / ICI_BW + (d - 1) * ICI_LAT)
        t_sc = full_bytes * (d - 1) / d / ICI_BW + (d - 1) * ICI_LAT
        # 'overlap' (method='overlap', r4): the transpose is split into
        # nc independent W-chunks, each chunk's all_to_all pipelined
        # against the previous chunk's z-GEMM and against the local
        # y/x matmuls. Overlap window = compute that can run while
        # chunks are in flight: the 2/3 of compute that is y/x-local
        # plus (nc-1)/nc of the z GEMMs. Exposed comm >= one chunk's
        # transfer (the pipeline fill) and >= whatever the window
        # cannot hide.
        window = t_c * (2.0 / 3.0) + (t_c / 3.0) * (nc - 1) / nc
        t_ov = max(t_tr / nc, t_tr - window)
        rows[d] = {
            "t_compute_ms": round(t_c * 1e3, 2),
            "transpose": {
                "bytes_per_apply": int(2 * local * (d - 1) / d),
                "t_comm_ms": round(t_tr * 1e3, 2),
                "efficiency": round(t_c / (t_c + t_tr), 4),
            },
            "overlap": {
                "bytes_per_apply": int(2 * local * (d - 1) / d),
                "chunks": nc,
                "t_comm_exposed_ms": round(t_ov * 1e3, 2),
                "efficiency": round(t_c / (t_c + t_ov), 4),
            },
            "scatter": {
                "bytes_per_apply": int(full_bytes * (d - 1) / d),
                "t_comm_ms": round(t_sc * 1e3, 2),
                "efficiency": round(t_c / (t_c + t_sc), 4),
            },
        }
    return rows


def dp_train_model(params=140320, step_ms=None, hosts=2):
    """DP gradient all-reduce per train step; 2-host DCN case."""
    if step_ms is None:
        # measured 4.6 s / epoch over 45 steps (TRAINING.md r2b config)
        step_ms = 4600 / 45
    t_c = step_ms * 1e-3
    grad_bytes = params * 4
    # ring all-reduce: 2*(h-1)/h * volume over the slowest link (DCN)
    t_comm = 2 * (hosts - 1) / hosts * grad_bytes / DCN_BW + 2 * DCN_LAT
    eff = t_c / (t_c + t_comm)
    return {
        "grad_bytes": grad_bytes,
        "t_compute_ms": round(step_ms, 1),
        "t_comm_us": round(t_comm * 1e6, 1),
        "efficiency": round(eff, 6),
        "hosts": hosts,
    }


def main():
    out = {
        "methodology": (
            "Analytic comm/compute model (no multi-chip hardware in this "
            "environment; see module docstring for assumptions). "
            "efficiency = t_compute / (t_compute + t_comm), zero overlap "
            "assumed (lower bound)."
        ),
        "halo_stencil_1024sq_per_device": halo_model(),
        "slab_fft_1024sq_per_device": dfft_model(),
        "slab3d_512cubed_global": slab3d_model(),
        "dp_training_2host": dp_train_model(),
    }
    path = os.path.join(ROOT, "SCALING_MODEL.json")
    json.dump(out, open(path, "w"), indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
