"""Benchmark: 3D sliding-window inference throughput (voxels/sec/chip).

The reference's flagship scale path is chunked/sliding-window inference over
large EM volumes (SURVEY.md §5.7). This benchmark runs the TPU-native
by-chunks path: the volume is processed as z-slabs (tiles with halo); each
slab travels host->HBM as uint8, runs one jitted program (normalize on
device, scan the patch grid, 3D ResUNet forward in bfloat16 on the MXU,
spline-blend scatter-add stitch — biapy_tpu/ops/stitch.py), and returns
bfloat16 (the analog of the reference's TEST.REDUCE_MEMORY fp16 storage).
JAX's async dispatch pipelines slab k+1's H2D against slab k's compute and
slab k-1's D2H, so the wall clock approaches max(compute, transfer) instead
of their sum — the reference's per-patch host<->GPU round-trips have no such
overlap.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against BASELINE_A100_VOXELS_PER_SEC, an estimated
A100 reference-BiaPy figure for the same model/patch config (the reference
publishes no throughput tables; see BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_A100_VOXELS_PER_SEC = 2.0e6


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from biapy_tpu.models.unet_family import UNetFamily
    from biapy_tpu.ops.stitch import sliding_window_inference

    vol_shape = (256, 512, 512)  # ~67M voxels; stand-in for 1024^3 (same kernel shapes)
    patch = (128, 128, 128)
    padding = (10, 10, 10)  # the reference's own measured by-chunks config (config.py:1974)
    batch = 4
    halo = 10
    n_slabs = 4
    slab_z = vol_shape[0] // n_slabs  # 64

    model = UNetFamily(
        variant="resunet", ndim=3, feature_maps=(32, 64, 128), drop_values=(0.0,) * 3,
        conv_layers=(2, 2, 2), yx_down=(2, 2, 2), z_down=(2, 2, 2), isotropy=(True,),
        normalization="bn", output_channels=(1,), activation="elu",
    )
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    x0 = jnp.zeros((1,) + patch + (1,), jnp.float32)
    variables = jax.jit(lambda: model.init(rngs, x0, train=False))()
    variables_bf16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), variables)

    def apply_fn(v, x):
        # normalize on device: raw uint8 voxels -> [0,1] bf16 (4x fewer
        # host->HBM bytes than transferring float32)
        x = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        return jax.nn.sigmoid(model.apply(v, x, train=False).astype(jnp.float32))

    slab_shape = (slab_z + 2 * halo,) + vol_shape[1:]

    @jax.jit
    def run_slab(slab):
        out = sliding_window_inference(
            apply_fn, variables_bf16, slab, patch, (0.0, 0.0, 0.0), padding,
            out_channels=1, batch_size=batch, out_dtype=jnp.float32,
        )
        return out[halo : halo + slab_z].astype(jnp.bfloat16)

    rng = np.random.default_rng(0)
    vol_np = rng.integers(0, 256, vol_shape + (1,), dtype=np.uint8)

    def slab_view(k):
        z0 = max(0, k * slab_z - halo)
        z1 = min(vol_shape[0], (k + 1) * slab_z + halo)
        s = vol_np[z0:z1]
        pad_lo = halo - (k * slab_z - z0)
        pad_hi = halo - (z1 - (k + 1) * slab_z)
        if pad_lo or pad_hi:
            s = np.pad(s, ((pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)), mode="reflect")
        return s

    # warmup/compile
    jax.block_until_ready(run_slab(jnp.asarray(slab_view(0))))

    t0 = time.time()
    outs = []
    inflight = []
    for k in range(n_slabs):
        dev_slab = jax.device_put(slab_view(k))      # async H2D
        inflight.append(run_slab(dev_slab))          # async compute
    for r in inflight:
        outs.append(np.asarray(r))                   # D2H drains the pipeline
    pred = np.concatenate(outs, axis=0)
    dt = time.time() - t0
    assert pred.shape == vol_shape + (1,)
    voxels = float(np.prod(vol_shape))
    vps = voxels / dt

    print(json.dumps({
        "metric": "3d_sliding_window_inference_throughput",
        "value": round(vps, 1),
        "unit": "voxels/sec/chip",
        "vs_baseline": round(vps / BASELINE_A100_VOXELS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
