"""A/B harness for train-step variants on the real chip.

Usage: python tools/train_ab.py [batch_sizes...]
Measures steady-state patches/sec of the bench train step at each batch size.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from tools.profile_step import build_bench_wf
    from biapy_tpu.engine.train_engine import (make_train_step,
                                               resolve_mixed_precision)
    from biapy_tpu.parallel import shard_batch

    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    wf = build_bench_wf((128, 128, 128))
    step = make_train_step(wf.loss, wf.train_metrics, mesh=wf.mesh,
                           mixed_precision=resolve_mixed_precision("auto"))
    rng = np.random.default_rng(1)
    for b in sizes:
        try:
            batch = {"x": rng.random((b, 128, 128, 128, 1), np.float32),
                     "y": (rng.random((b, 128, 128, 128, 1), np.float32) > 0.5)
                     .astype(np.float32)}
            sb = shard_batch(batch, wf.mesh, wf.spatial_dim)
            key = jax.random.PRNGKey(0)
            # fresh copy: the step donates its input state, so reusing
            # wf.state across batch sizes would hit deleted buffers
            state = jax.tree.map(lambda a: a + 0 if hasattr(a, "dtype") else a,
                                 wf.state)
            for _ in range(3):
                state, m = step(state, sb, key)
            float(m["loss"])
            n = max(6, int(12 / b))
            t0 = time.time()
            for _ in range(n):
                state, m = step(state, sb, key)
            float(m["loss"])
            dt = time.time() - t0
            print(f"batch={b}: {n} steps in {dt:.3f}s -> {n/dt:.2f} it/s "
                  f"= {n*b/dt:.2f} patches/s")
        except Exception as e:
            print(f"batch={b}: FAILED {type(e).__name__}: {str(e)[:200]}")
        finally:
            state = None


if __name__ == "__main__":
    main()
