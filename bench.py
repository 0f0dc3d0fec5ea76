"""Benchmark: 3D sliding-window inference throughput (voxels/sec/chip).

The reference's flagship scale path is chunked/sliding-window inference over
large EM volumes (SURVEY.md §5.7). This benchmark measures the PRODUCT path:
a real semantic-seg workflow (3D ResUNet, patch 128³, the reference's own
measured by-chunks padding config, config.py:1974) built from the YAML config
tree, whose ``predict_block_on_device`` runs each z-slab as one jitted
program — the slab travels host->HBM once, a lax.scan walks the patch grid,
the model runs in bfloat16 on the MXU (TEST.REDUCE_MEMORY), and spline-blended
patches scatter-add into the output (biapy_tpu/ops/stitch.py). Slabs are
dispatched asynchronously so slab k+1's H2D overlaps slab k's compute (the
reference round-trips every patch host<->GPU with no such overlap).

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

    from biapy_tpu._biapy import BiaPy

    vol_shape = (256, 512, 512)  # ~67M voxels; stand-in for 1024^3 (same kernel shapes)
    patch = (128, 128, 128)
    padding = (10, 10, 10)  # the reference's measured by-chunks config (config.py:1974)
    n_slabs = 4
    slab_z = vol_shape[0] // n_slabs
    halo = padding[0]

    cfg = {
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "3D"},
        "DATA": {"PATCH_SIZE": list(patch) + [1],
                 "TEST": {"PADDING": list(padding), "OVERLAP": [0.0, 0.0, 0.0]}},
        "MODEL": {"ARCHITECTURE": "resunet", "FEATURE_MAPS": [32, 64, 128],
                  "DROPOUT_VALUES": [0.0, 0.0, 0.0], "Z_DOWN": [2, 2, 2],
                  "YX_DOWN": [2, 2, 2], "CONV_LAYERS": [2, 2, 2],
                  "NORMALIZATION": "bn", "ACTIVATION": "elu"},
        "TRAIN": {"ENABLE": False, "BATCH_SIZE": 5},  # 25 patches per slab -> 5 full batches, no padding waste
        "TEST": {"ENABLE": True, "REDUCE_MEMORY": True},  # bf16 on the MXU
    }
    job = BiaPy(cfg, result_dir="", name="bench", silent=True)
    job._build_workflow()
    wf = job.workflow
    wf.prepare_model()

    rng = np.random.default_rng(0)
    vol_np = rng.random(vol_shape + (1,), dtype=np.float32)

    def slab_view(k):
        z0 = max(0, k * slab_z - halo)
        z1 = min(vol_shape[0], (k + 1) * slab_z + halo)
        s = vol_np[z0:z1]
        pad_lo = halo - (k * slab_z - z0)
        pad_hi = halo - (z1 - (k + 1) * slab_z)
        if pad_lo or pad_hi:
            s = np.pad(s, ((pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)), mode="reflect")
        return s

    devices = jax.local_devices()

    # warmup/compile (persistent cache makes later runs fast)
    wf.predict_block_on_device(slab_view(0), device=devices[0], sync=True)

    t0 = time.time()
    inflight = []
    outs = []
    for k in range(n_slabs):
        r = wf.predict_block_on_device(slab_view(k), device=devices[k % len(devices)],
                                       sync=False)
        inflight.append(r)
    for r in inflight:
        outs.append(np.asarray(r)[halo:halo + slab_z])  # D2H drains the pipeline
    pred = np.concatenate(outs, axis=0)
    dt = time.time() - t0
    assert pred.shape == vol_shape + (1,), pred.shape
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
