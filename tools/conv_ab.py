"""A/B the 3x3x3 folded conv strategies (as2d sum vs cat2d) fwd and fwd+bwd
at the bench model's layer shapes, on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def conv2d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def as2d(x4, w):
    bd = x4.shape[0]
    kz = w.shape[0]
    hz = kz // 2
    xp = jnp.pad(x4, ((hz, hz), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(kz):
        o = conv2d(jax.lax.slice_in_dim(xp, dz, dz + bd, axis=0), w[dz])
        out = o if out is None else out + o
    return out


def cat2d(x4, w):
    bd = x4.shape[0]
    kz = w.shape[0]
    hz = kz // 2
    xp = jnp.pad(x4, ((hz, hz), (0, 0), (0, 0), (0, 0)))
    xc = jnp.concatenate([jax.lax.slice_in_dim(xp, dz, dz + bd, axis=0)
                          for dz in range(kz)], axis=-1)
    wk = jnp.concatenate([w[dz] for dz in range(kz)], axis=2)
    return conv2d(xc, wk)


def bench(fn, x, w, tag, n=30, grad=False):
    if grad:
        f = jax.jit(jax.grad(lambda ww, xx: jnp.sum(fn(xx, ww) ** 2), argnums=(0, 1)))
        r = f(w, x); jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(n):
            r = f(w, x)
        float(r[0][0, 0, 0, 0, 0])
    else:
        f = jax.jit(fn)
        r = f(x, w); jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(n):
            r = f(x, w)
        float(r[0, 0, 0, 0])
    dt = (time.time() - t0) / n
    kz, _, _, cin, cout = w.shape
    flops = 2 * kz ** 3 * cin * cout * x.shape[0] * x.shape[1] * x.shape[2]
    mult = 3 if grad else 1
    print(f"  {tag}{'+bwd' if grad else '    '}: {dt*1e3:7.2f} ms "
          f"({flops*mult/dt/1e12:6.1f} TF/s)")
    return dt


def main():
    rng = np.random.default_rng(0)
    shapes = [
        (128, 128, 128, 32, 32),   # enc0 / dec0 refine
        (128, 128, 128, 96, 32),   # dec0 concat conv
        (128, 128, 128, 1, 32),    # stem
        (64, 64, 64, 64, 64),      # enc1
        (64, 64, 64, 192, 64),     # dec1 concat conv
        (128, 128, 128, 32, 32, 5),  # larger_io 5x5x5
    ]
    for s in shapes:
        d, h, w_, cin, cout = s[:5]
        kz = s[5] if len(s) > 5 else 3
        x = jnp.asarray(rng.standard_normal((d, h, w_, cin)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((kz, kz, kz, cin, cout)) * 0.05, jnp.bfloat16)
        print(f"shape d={d} yx={h} {cin}->{cout} k={kz}:")
        for tag, fn in [("as2d ", as2d), ("cat2d", cat2d)]:
            try:
                bench(fn, x, wt, tag)
                bench(fn, x, wt, tag, grad=True)
            except Exception as e:
                print(f"  {tag}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()


def splitcat(x4, w):
    # split input channels into halves, cat2d each, add — exact
    cin = x4.shape[-1]
    c1 = cin // 2
    return cat2d(x4[..., :c1], w[:, :, :, :c1]) + cat2d(x4[..., c1:], w[:, :, :, c1:])
