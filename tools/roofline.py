"""HBM roofline analysis of the bench train step (VERDICT r4 task #1).

Three parts:

1. ``bandwidth`` — measure the chip's achievable HBM bandwidth with jitted
   copy / scale / triad kernels over large bf16/f32 arrays (the roofline
   denominator; peak-spec numbers flatter the floor).
2. ``analytic`` — enumerate the z-folded train step's *minimal* HBM traffic:
   for every materialized tensor between MXU ops (conv outputs, pool, concat,
   saved activations, gradient chain, BN stats), the bytes any schedule must
   move, assuming perfect producer/consumer fusion of all elementwise work
   into those boundaries. Divided by the measured bandwidth this is the
   elementwise/memory *floor* of the step; convs are charged at their
   per-shape measured MXU ceilings (tools/conv_ab.py tables) instead.
3. ``measured`` — capture an xplane of 10 train steps and print per-op
   bytes/time/achieved-GB/s from hlo_stats, so the analytic table can be
   cross-checked against what the current schedule actually moves.

Usage (real chip):
  python tools/roofline.py bandwidth
  python tools/roofline.py analytic [--bw GB_S]
  python tools/roofline.py measured
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# 1. measured achievable HBM bandwidth
# ---------------------------------------------------------------------------

def measure_bandwidth():
    import jax
    import jax.numpy as jnp

    results = {}
    n = 256 * 1024 * 1024  # 256M elements
    for name, dtype, make, fn, bytes_per_elem in [
        # copy: read + write
        ("copy_bf16", jnp.bfloat16, 1, lambda a: a + jnp.bfloat16(0), 4),
        ("copy_f32", jnp.float32, 1, lambda a: a + jnp.float32(0), 8),
        # triad a*x+y: 2 reads + 1 write
        ("triad_bf16", jnp.bfloat16, 2,
         lambda a, b: a * jnp.bfloat16(1.5) + b, 6),
        # reduce: read only
        ("reduce_f32_of_bf16", jnp.bfloat16, 1,
         lambda a: jnp.sum(a.astype(jnp.float32)), 2),
    ]:
        args = [jnp.zeros((n,), dtype) for _ in range(make)]
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        gbs = n * bytes_per_elem / dt / 1e9
        results[name] = round(gbs, 1)
        print(f"  {name:22s} {gbs:8.1f} GB/s  ({n * bytes_per_elem / 1e9:.2f} GB in {dt * 1e3:.2f} ms)")
    return results


# ---------------------------------------------------------------------------
# 2. analytic minimal-traffic table for the z-folded bench step
# ---------------------------------------------------------------------------

MB = 1e6


def analytic_table(bw_gbs: float = 600.0, conv_ms: float = 36.0):
    """Bench model: 3D ResUNet fm (32,64,128), conv_layers (2,2,2), 128^3
    patch, batch 1, bf16 AMP, z-folded (rows=b*z) layout. Counts MINIMAL
    bytes per materialized tensor: each tensor is written once by its
    producer and read once per consumer; ALL elementwise work (BN affine,
    ELU, residual adds, masks) is assumed fused into those boundaries — a
    lower bound no schedule beats. bf16 = 2 B/elem; BN batch-stat
    reductions read their input once (already counted as the consumer
    read); dL/dy chain mirrors forward. Saved-for-backward activations are
    read once more in bwd."""
    vox0 = 128 ** 3            # L0 spatial elems (folded rows x y x x)
    vox1 = 64 ** 3
    vox2 = 32 ** 3
    B = 2                      # bf16 bytes

    def t(vox, c):
        return vox * c * B

    # forward materialized tensors: (name, bytes, fwd_consumers, saved_for_bwd)
    # consumers: convs/pools reading it in fwd; saved: re-read in bwd
    tensors = [
        # L0 encoder
        ("x_in (u8->bf16)", vox0 * 1 * 1, 1, 1),       # uint8 read once
        ("e0a out", t(vox0, 32), 1, 1),
        ("e0b out (+res)", t(vox0, 32), 2, 1),          # pool + skip-concat
        ("pool0 out", t(vox1, 32), 1, 1),
        # L1 encoder
        ("e1a out", t(vox1, 64), 1, 1),
        ("e1b out (+res)", t(vox1, 64), 2, 1),
        ("pool1 out", t(vox2, 64), 1, 1),
        # bottleneck
        ("b0 out", t(vox2, 128), 1, 1),
        ("b1 out (+res)", t(vox2, 128), 1, 1),
        # decoder L1
        ("up1 out", t(vox1, 64), 1, 1),                 # ConvT output
        ("cat1 out", t(vox1, 128), 1, 1),               # concat materializes
        ("d1a out", t(vox1, 64), 1, 1),
        ("d1b out (+res)", t(vox1, 64), 1, 1),
        # decoder L0
        ("up0 out", t(vox0, 32), 1, 1),
        ("cat0 out", t(vox0, 64), 1, 1),
        ("d0a out", t(vox0, 32), 1, 1),
        ("d0b out (+res)", t(vox0, 32), 1, 1),
        ("head out (logits)", t(vox0, 1), 1, 1),
    ]
    rows = []
    total = 0
    for name, nbytes, consumers, saved in tensors:
        fwd = nbytes * (1 + consumers)          # producer write + fwd reads
        bwd_grad = nbytes * 2                   # dY write + read (chain)
        bwd_saved = nbytes * saved              # saved activation re-read
        tot = fwd + bwd_grad + bwd_saved
        total += tot
        rows.append((name, nbytes, fwd, bwd_grad + bwd_saved, tot))
    # optimizer: adamw on ~1.4M params f32: read p,m,v,g + write p,m,v
    n_params = 1.4e6
    opt = n_params * 4 * 7
    total += opt
    rows.append(("adamw (f32 p/m/v/g)", n_params * 4, opt, 0, opt))

    print(f"{'tensor':28s} {'size':>9s} {'fwd B':>9s} {'bwd B':>9s} {'total B':>9s}")
    for name, nbytes, fwd, bwd, tot in rows:
        print(f"{name:28s} {nbytes/MB:7.1f}MB {fwd/MB:7.1f}MB {bwd/MB:7.1f}MB {tot/MB:7.1f}MB")
    floor_ms = total / (bw_gbs * 1e9) * 1e3
    step_floor = conv_ms + floor_ms
    print(f"\nminimal non-conv HBM traffic: {total/1e9:.2f} GB")
    print(f"@ measured {bw_gbs:.0f} GB/s -> elementwise floor {floor_ms:.1f} ms")
    print(f"+ convs at measured MXU ceilings ({conv_ms:.0f} ms) "
          f"-> step floor {step_floor:.1f} ms = {1000/step_floor:.1f} it/s")

    # Lane-granularity-adjusted floor — RETRACTED by round-5 chip
    # measurement (kept for the record): the optimized HLO shows XLA
    # assigns {0,3,2,1} layouts that put the FOLDED ROW axis (bd=128) in
    # the 128-lane dimension with C=32 in sublanes, and the BN-backward
    # reduction measures 660 GiB/s — no 4x lane padding exists. The real
    # gap between the naive floor and the measured step is SCHEDULE
    # TRAFFIC (35.4 GB/patch measured vs 6.3 GB minimal: cat2d concats,
    # their backward splits, separate BN/ELU/residual passes); see
    # BASELINE.md "HBM roofline — MEASURED".
    lane_c = 32
    waste = 128 / lane_c
    structured_share = 0.55
    adj = total * (structured_share * waste + (1 - structured_share))
    adj_ms = adj / (bw_gbs * 1e9) * 1e3
    print(f"lane-adjusted (structured passes at C={lane_c} use "
          f"{lane_c}/128 lanes): effective traffic {adj/1e9:.2f} GB -> "
          f"floor {adj_ms:.1f} ms -> step {conv_ms + adj_ms:.1f} ms = "
          f"{1000/(conv_ms + adj_ms):.1f} it/s")
    return total, floor_ms


# ---------------------------------------------------------------------------
# 3. measured per-op bytes/time from an xplane trace
# ---------------------------------------------------------------------------

def measured():
    import jax

    from tools.profile_step import attribute, build_bench_wf

    cache = "/root/repo/.jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from biapy_tpu.engine.train_engine import (make_train_step,
                                               resolve_mixed_precision)
    from biapy_tpu.parallel import shard_batch

    wf = build_bench_wf((128, 128, 128))
    step = make_train_step(wf.loss, wf.train_metrics, mesh=wf.mesh,
                           mixed_precision=resolve_mixed_precision("auto"))
    rng = np.random.default_rng(1)
    batch = {"x": rng.random((1, 128, 128, 128, 1), np.float32),
             "y": (rng.random((1, 128, 128, 128, 1), np.float32) > 0.5)
             .astype(np.float32)}
    sb = shard_batch(batch, wf.mesh, wf.spatial_dim)
    key = jax.random.PRNGKey(0)
    state = wf.state
    for _ in range(3):
        state, m = step(state, sb, key)
    float(m["loss"])
    logdir = "/tmp/xplane_roofline"
    os.system(f"rm -rf {logdir}")
    t0 = time.time()
    jax.profiler.start_trace(logdir)
    for _ in range(10):
        state, m = step(state, sb, key)
    float(m["loss"])
    jax.profiler.stop_trace()
    print(f"10 steps in {time.time()-t0:.2f}s")

    import json

    raw = attribute(logdir)
    obj = json.loads(raw)
    cols = [c["label"] for c in obj["cols"]]
    print("columns:", cols)
    rows = [[c["v"] if c else None for c in r["c"]] for r in obj["rows"]]
    i_cat = next(i for i, c in enumerate(cols) if "category" in c.lower())
    i_time = next(i for i, c in enumerate(cols)
                  if "total time" in c.lower() and "%" not in c)
    i_name = next(i for i, c in enumerate(cols) if c.lower() in
                  ("hlo op name", "op name", "hlo_op_name"))
    # bytes/bandwidth columns vary by xprof version — take what exists
    i_bw = next((i for i, c in enumerate(cols)
                 if "bandwidth" in c.lower() or "bytes" in c.lower()), None)
    agg = {}
    for r in rows:
        cat = r[i_cat] or "?"
        tt = float(r[i_time] or 0.0)
        bw = float(r[i_bw] or 0.0) if i_bw is not None else 0.0
        nm = (r[i_name] or "?")[:80]
        k = (cat, nm)
        a = agg.setdefault(k, [0.0, 0.0])
        a[0] += tt
        a[1] = max(a[1], bw)
    print(f"\n{'ms':>9s} {'bw' if i_bw is not None else '':>9s}  op")
    for (cat, nm), (tt, bw) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:45]:
        print(f"{tt/1e6:9.2f} {bw:9.1f}  [{cat}] {nm}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "analytic"
    if mode == "bandwidth":
        measure_bandwidth()
    elif mode == "measured":
        measured()
    else:
        bw = 600.0
        conv_ms = 36.0
        if "--bw" in sys.argv:
            bw = float(sys.argv[sys.argv.index("--bw") + 1])
        if "--conv-ms" in sys.argv:
            conv_ms = float(sys.argv[sys.argv.index("--conv-ms") + 1])
        analytic_table(bw, conv_ms)
