"""A/B ConvTranspose formulations at bench shapes (folded layout)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def dot_d2s(x, k):
    # current: per-voxel matmul + 7D transpose interleave (k already flipped)
    cin, co = k.shape[-2], k.shape[-1]
    wmat = k.reshape((-1, cin, co)).transpose(1, 0, 2).reshape(cin, -1)
    y = x @ wmat
    bd, h, w = x.shape[:3]
    y = y.reshape(bd, h, w, 2, 2, 2, co)
    y = y.transpose(0, 3, 1, 4, 2, 5, 6)
    return y.reshape(bd * 2, h * 2, w * 2, co)


def tap2d(x, k):
    # per-z-tap 2D non-overlapping transposed conv (as dot + 5D transpose),
    # then z-interleave by stack+reshape
    cin, co = k.shape[-2], k.shape[-1]
    bd, h, w = x.shape[:3]
    outs = []
    for a in range(2):
        wmat = k[a].reshape((-1, cin, co)).transpose(1, 0, 2).reshape(cin, -1)
        y = x @ wmat  # (bd, h, w, 4co)
        y = y.reshape(bd, h, w, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
        outs.append(y.reshape(bd, 2 * h, 2 * w, co))
    y = jnp.stack(outs, axis=1)  # (bd, 2, 2h, 2w, co)
    return y.reshape(bd * 2, 2 * h, 2 * w, co)


def convt2d(x, k):
    # per-z-tap lax.conv_transpose, z-interleave by stack+reshape
    bd, h, w = x.shape[:3]
    co = k.shape[-1]
    outs = []
    for a in range(2):
        y = jax.lax.conv_transpose(
            x, k[a], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        outs.append(y)
    y = jnp.stack(outs, axis=1)
    return y.reshape(bd * 2, 2 * h, 2 * w, co)


def bench(fn, x, k, tag, n=30):
    f = jax.jit(jax.grad(lambda kk, xx: jnp.sum(fn(xx, kk) ** 2), argnums=(0, 1)))
    r = f(k, x); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(k, x)
    float(r[0][0, 0, 0, 0, 0])
    dt = (time.time() - t0) / n
    fwd = jax.jit(fn)
    r2 = fwd(x, k); jax.block_until_ready(r2)
    t0 = time.time()
    for _ in range(n):
        r2 = fwd(x, k)
    float(r2[0, 0, 0, 0])
    dtf = (time.time() - t0) / n
    print(f"  {tag}: fwd {dtf*1e3:6.2f} ms   fwd+bwd {dt*1e3:6.2f} ms")


def main():
    rng = np.random.default_rng(0)
    for d, h, cin, co in [(64, 64, 64, 64), (32, 32, 128, 128)]:
        x = jnp.asarray(rng.standard_normal((d, h, h, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((2, 2, 2, cin, co)) * 0.1, jnp.bfloat16)
        print(f"shape ({d},{h},{h},{cin}) -> co={co}:")
        for tag, fn in [("dot_d2s", dot_d2s), ("tap2d  ", tap2d), ("convt2d", convt2d)]:
            try:
                bench(fn, x, k, tag)
            except Exception as e:
                print(f"  {tag}: FAILED {str(e)[:100]}")


if __name__ == "__main__":
    main()
