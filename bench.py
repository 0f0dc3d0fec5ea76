"""Benchmark: 3D sliding-window inference throughput (voxels/sec/chip).

The reference's flagship scale path is chunked/sliding-window inference over
large EM volumes (SURVEY.md §5.7). This benchmark runs the TPU-native
inference path: the volume is transferred to HBM once and a single jitted
program scans the patch grid — dynamic-slice, 3D ResUNet forward (bfloat16
on the MXU), spline-blend scatter-add stitch — with one result transfer
back (biapy_tpu/ops/stitch.py). This replaces the reference's per-patch
host<->device round-trips.

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

    model = UNetFamily(
        variant="resunet", ndim=3, feature_maps=(32, 64, 128), drop_values=(0.0,) * 3,
        conv_layers=(2, 2, 2), yx_down=(2, 2, 2), z_down=(2, 2, 2), isotropy=(True,),
        normalization="bn", output_channels=(1,), activation="elu",
    )
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    x0 = jnp.zeros((1,) + patch + (1,), jnp.float32)
    variables = jax.jit(lambda: model.init(rngs, x0, train=False))()
    # bfloat16 weights: MXU-native compute, fp32 accumulation in the stitch.
    variables_bf16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), variables)

    def apply_fn(v, x):
        # normalize on device: raw uint8 EM voxels -> [0,1] bf16 (the
        # reference normalizes per-patch on host; doing it here lets the
        # volume travel host->HBM as uint8, 4x fewer bytes).
        x = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        return jax.nn.sigmoid(model.apply(v, x, train=False).astype(jnp.float32))

    @jax.jit
    def run(vol):
        out = sliding_window_inference(
            apply_fn, variables_bf16, vol, patch, (0.0, 0.0, 0.0), padding,
            out_channels=1, batch_size=batch, out_dtype=jnp.float32,
        )
        return out.astype(jnp.bfloat16)  # halve the D2H bytes

    rng = np.random.default_rng(0)
    vol_np = rng.integers(0, 256, vol_shape + (1,), dtype=np.uint8)

    # warmup/compile
    out = run(jnp.asarray(vol_np))
    jax.block_until_ready(out)

    t0 = time.time()
    vol = jnp.asarray(vol_np)  # H2D (uint8)
    out = np.asarray(run(vol))  # device sweep + D2H (bf16)
    dt = time.time() - t0
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
