"""Microbench: 5D (current) vs fully-folded-4D residual conv block.

Validates the hypothesis that keeping activations in z-folded (b*d, h, w, c)
layout end-to-end removes the layout-copy churn seen in the train profile.
Unit under test: ResConvBlock-like [conv3x3x3-BN-ELU-conv-BN-ELU + add]
at C=32, 128^3, batch 1, bf16 params/activations, fwd+bwd.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

D = H = W = 128
C = 32


def conv2d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv3d_5d(x, w):
    # current as2d: 5D pad + per-tap reshape to 4D and back
    b, d, h, wd, c = x.shape
    kz, co = w.shape[0], w.shape[-1]
    hz = kz // 2
    xp = jnp.pad(x, ((0, 0), (hz, hz), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(kz):
        x2 = xp[:, dz:dz + d].reshape(b * d, h, wd, c)
        o = conv2d(x2, w[dz])
        out = o if out is None else out + o
    return out.reshape(b, d, h, wd, co)


def conv3d_folded(x4, w, d):
    # folded: x4 is (b*d, h, w, c); z-shift = row pad/slice on dim 0 (b=1)
    kz = w.shape[0]
    hz = kz // 2
    xp = jnp.pad(x4, ((hz, hz), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(kz):
        o = conv2d(xp[dz:dz + x4.shape[0]], w[dz])
        out = o if out is None else out + o
    return out


def bn_elu(x, scale, bias, axes):
    mu = x.mean(axis=axes, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=axes, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return jnp.where(y > 0, y, jnp.expm1(y).astype(y.dtype))


def block_5d(params, x):
    h = conv3d_5d(x, params["w1"])
    h = bn_elu(h, params["s1"], params["b1"], (0, 1, 2, 3))
    h = conv3d_5d(h, params["w2"])
    h = bn_elu(h, params["s2"], params["b2"], (0, 1, 2, 3))
    return jnp.sum((h + x) ** 2)


def block_folded(params, x4):
    h = conv3d_folded(x4, params["w1"], D)
    h = bn_elu(h, params["s1"], params["b1"], (0, 1, 2))
    h = conv3d_folded(h, params["w2"], D)
    h = bn_elu(h, params["s2"], params["b2"], (0, 1, 2))
    return jnp.sum((h + x4) ** 2)


def bench(fn, params, x, tag, n=20):
    g = jax.jit(jax.grad(fn))
    r = g(params, x)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = g(params, x)
    float(r["w1"][0, 0, 0, 0, 0])
    dt = (time.time() - t0) / n
    print(f"{tag}: {dt*1e3:.2f} ms/iter")
    return dt


def main():
    rng = np.random.default_rng(0)
    params = {
        "w1": jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.05, jnp.bfloat16),
        "w2": jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.05, jnp.bfloat16),
        "s1": jnp.ones((C,), jnp.bfloat16), "b1": jnp.zeros((C,), jnp.bfloat16),
        "s2": jnp.ones((C,), jnp.bfloat16), "b2": jnp.zeros((C,), jnp.bfloat16),
    }
    x = jnp.asarray(rng.standard_normal((1, D, H, W, C)), jnp.bfloat16)
    x4 = x.reshape(D, H, W, C)
    t5 = bench(block_5d, params, x, "5D (current)")
    t4 = bench(block_folded, params, x4, "folded 4D  ")
    print(f"speedup: {t5/t4:.2f}x")


if __name__ == "__main__":
    main()
