"""Pallas TPU kernel: 3x3x3 conv3d, stride 1, SAME padding, channels-last.

Why: XLA's native 3D convolution reaches only ~8-40% of MXU peak at the
channel counts U-Nets use at high resolution (measured on v5e: 11 TFLOP/s at
C=32, 22 at C=64, 57 at C=128 vs 143 TFLOP/s matmul peak). The hot path of
every 3D model in this framework is exactly these convs (SURVEY.md §6 north
star: sliding-window 3D inference).

Design (implicit im2col, MXU-shaped, VMEM-lane-exact):

- **Fused channel lanes.** Blocks with a trailing C=32 axis would pad to 128
  lanes (4x VMEM waste); instead both input and output travel as
  (N, D, H, W*C) with W and C fused, so every block is lane-dense.
- **Grid over (N, D).** One output z-plane per step. The three input
  z-planes a step needs are three BlockSpec views of the same zero-padded
  input with D-index maps (z, z+1, z+2) — unit-size D blocks make the
  one-plane shift expressible, and Mosaic pipelines the fetches.
- **Quad-packed output columns.** With CO < 128 the dot's N dimension would
  idle (128-CO) lanes. We compute Q = 128//CO consecutive output x-positions
  per matmul row instead: N = Q*CO = 128 full lanes, and K enumerates a
  2Q-wide sliding x-window times C (the weight block is zero where
  |dx' - xs| > 1). MXU utilization = 3/(2Q): 37.5% at CO=32, 75% at CO=64,
  plain path (Q=1, K=C) at CO>=128 — versus XLA's ~8%/15%/40%.
- fp32 accumulation, bf16 (or input-dtype) output.

Backward: jax.custom_vjp — dx reuses the same kernel (flipped, IO-swapped
weights are again a 3x3x3 SAME conv); dw falls back to XLA.

Status (round 4): superseded as the training plan. The z-folded 4D mode +
measured cat2d/as2d chooser (ops/conv3d.py) reaches ~78 TFLOP/s average on
the full train step through XLA alone, and every Pallas custom call tried
IN the train graph (ops/pallas/shuffle.py: zcat/pool/zd2s) lost net time by
breaking XLA's producer/consumer fusion around it — writing the dw kernel
would face the same economics. This kernel stays opt-in
(BIAPY_TPU_PALLAS_CONV) for standalone inference experiments, where its
34 TFLOP/s at C=64 still beats the native-3D emitter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_VMEM_BUDGET = 13 * 1024 * 1024


def _quad(co: int) -> int:
    return max(1, LANES // co)


def _geom(w: int, c: int, co: int):
    """Static geometry: quad size, output quads, padded input width."""
    q = _quad(co)
    if q == 1:
        wq = w
        n_quads = w + 2
        # lane alignment of the fused (Wpad*C) axis
        while (n_quads * c) % LANES:
            n_quads += 1
        return q, wq, n_quads
    wq = -(-w // q)
    n_quads = wq + 1
    while (q * n_quads * c) % LANES:
        n_quads += 1
    return q, wq, n_quads


def pack_weights(w: jnp.ndarray, q: int) -> jnp.ndarray:
    """(3,3,3,C,CO) -> (9, 2Q*C, Q*CO): per (dz,dy) group, K enumerates the
    2Q-wide x-window (dx', ci), N enumerates (xs, co); entry is
    w[dz,dy,dx'-xs,ci,co] when 0 <= dx'-xs <= 2, else 0."""
    c, co = w.shape[3], w.shape[4]
    if q == 1:
        # plain: K = 3*C window (dx, ci), N = CO
        return w.reshape(9, 3 * c, co)
    # per output-column xs, the 3-tap block sits at K rows [xs*c, (xs+3)*c):
    # build by zero-padding + one concat (fusable — a scatter chain here
    # would serialize in front of every kernel launch)
    w9 = w.reshape(9, 3 * c, co)
    cols = [jnp.pad(w9, ((0, 0), (xs * c, (2 * q - 3 - xs) * c), (0, 0)))
            for xs in range(q)]
    return jnp.concatenate(cols, axis=2)


def _row_chunk(h: int, m_per_row: int, k: int, itemsize: int) -> int:
    """Rows per inner chunk: keep the im2col tile near 1MB."""
    r = max(8, (1 << 19) // max(1, m_per_row * k * itemsize))
    while h % r:
        r -= 1
    return max(1, r)


def _kernel(x0, x1, x2, wp, out, *, h: int, w: int, c: int, co: int, q: int,
            wq: int, n_quads: int, rch: int, out_dtype):
    planes = (x0, x1, x2)
    qc = q * c

    # The 2Q-wide (or 3-wide for q=1) x-window is realized as 2 (3) separate
    # lane-aligned slices of the fused row, each a K=q*c dot against the
    # matching K-half of the packed weights — Mosaic-friendly (no concat of
    # offset layouts), mathematically identical.
    n_sub = 2 if q > 1 else 3
    step = qc if q > 1 else c

    r0 = pl.program_id(2) * rch
    acc = jnp.zeros((rch * wq, q * co if q > 1 else co), jnp.float32)
    for dz in range(3):
        # one aligned ref read per z-plane; the dy shift happens at the
        # value level (sublane starts must be provably 8-aligned)
        slab = planes[dz][0, 0, pl.ds(r0, rch + 8), :]
        for dy in range(3):
            rows = slab[dy:dy + rch]
            g = dz * 3 + dy
            for s in range(n_sub):
                xg = rows[:, s * step:(s + wq) * step].reshape(rch * wq, step)
                acc = acc + jnp.dot(xg, wp[g, s * step:(s + 1) * step],
                                    preferred_element_type=jnp.float32)
    # un-fuse (wq, q) -> W inside VMEM so the HBM output keeps the standard
    # (N, D, H, W, C) layout — a fused HBM layout would force every
    # downstream consumer through an HBM relayout copy. Per-xs lane slices
    # stay in VMEM and are cheap next to the dots.
    if q > 1:
        # roll each xs block to lane offset 0 before the stack — Mosaic
        # cannot concat vectors whose layouts carry different lane offsets
        nl = q * co
        pieces = [pltpu.roll(acc, (nl - xs * co) % nl, axis=1)[:, :co].reshape(rch, wq, co)
                  for xs in range(q)]
        y = jnp.stack(pieces, axis=2).reshape(rch, wq * q, co)
    else:
        y = acc.reshape(rch, wq, co)
    out[0, 0] = y[:, :w, :].astype(out_dtype)


def _vmem_estimate(h, w, c, co, q, wq, n_quads, itemsize):
    plane = (h + 8) * n_quads * q * c * itemsize if q > 1 else (h + 8) * n_quads * c * itemsize
    k_dim = (2 * q * c) if q > 1 else 3 * c
    rch = _row_chunk(h, wq, k_dim, itemsize)
    xg = rch * wq * k_dim * itemsize
    n_dim = q * co if q > 1 else co
    acc = rch * wq * n_dim * 4
    outb = h * w * co * itemsize
    wpb = 9 * k_dim * n_dim * itemsize
    return 2 * 3 * plane + 3 * xg + 2 * acc + 2 * outb + wpb


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def supported(shape, wshape, itemsize: int = 2) -> bool:
    """Whether the Pallas fast path applies to this conv."""
    import os

    # Default OFF: the kernel beats XLA's conv in isolation (22 vs 14.5
    # TFLOP/s at C=32 on v5e), but on the current axon platform each custom
    # call carries ~30-40ms of graph-boundary overhead (operand pad copies +
    # lost fusion) that erases the win inside real models. Set
    # BIAPY_TPU_PALLAS_CONV=1 (or a channel list like "c32,c64") to enable.
    mode = os.environ.get("BIAPY_TPU_PALLAS_CONV", "0")
    if mode == "0":
        return False
    if not _on_tpu():
        return False  # Mosaic kernels only lower on TPU backends
    if tuple(wshape[:3]) != (3, 3, 3):
        return False
    if mode not in ("", "1") and f"c{shape[-1]}" not in mode.split(","):
        return False  # e.g. BIAPY_TPU_PALLAS_CONV=c32,c96 restricts by Cin
    n, d, h, w, c = shape
    co = wshape[-1]
    q = _quad(co)
    # q == 1 (CO >= 128): XLA's conv already reaches ~40% MXU there and beats
    # this kernel's relayout overhead — measured 57 vs 51 TFLOP/s on v5e.
    if q == 1 or c < 8 or w % q or h < 8:
        return False
    # the lane-sliced K-subdots need 128-aligned offsets
    if (q * c) % LANES:
        return False
    q, wq, n_quads = _geom(w, c, co)
    return _vmem_estimate(h, w, c, co, q, wq, n_quads, itemsize) < _VMEM_BUDGET


@partial(jax.jit, static_argnames=("out_dtype",))
def _conv3d_pallas(x: jnp.ndarray, w: jnp.ndarray, out_dtype=jnp.bfloat16):
    n, d, h, wdt, c = x.shape
    co = w.shape[-1]
    q, wq, n_quads = _geom(wdt, c, co)
    wp = pack_weights(w, q)
    qw = q if q > 1 else 1
    # zero-pad: +1 z/y halo each side; x: left halo 1, right up to the quad grid
    wpad_elems = (n_quads * q if q > 1 else n_quads)
    # H gets 7 rows of bottom padding so the kernel's aligned (rch+8)-row
    # slab reads stay in bounds on the last chunk.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (1, wpad_elems - wdt - 1), (0, 0)))
    xp = xp.reshape(n, d + 2, h + 8, wpad_elems * c)

    k_dim = 2 * q * c if q > 1 else 3 * c
    rch = _row_chunk(h, wq, k_dim, x.dtype.itemsize)
    # input plane blocks ignore the h grid index -> fetched once per (n, z)
    in_plane = lambda s: pl.BlockSpec(
        (1, 1, h + 8, wpad_elems * c), lambda ni, z, hi, _s=s: (ni, z + _s, 0, 0),
        memory_space=pltpu.VMEM)
    kern = partial(_kernel, h=h, w=wdt, c=c, co=co, q=q, wq=wq,
                   n_quads=n_quads, rch=rch, out_dtype=out_dtype)
    return pl.pallas_call(
        kern,
        grid=(n, d, h // rch),
        in_specs=[in_plane(0), in_plane(1), in_plane(2),
                  pl.BlockSpec(wp.shape, lambda ni, z, hi: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, rch, wdt, co),
                               lambda ni, z, hi: (ni, z, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d, h, wdt, co), out_dtype),
    )(xp, xp, xp, wp)


def _conv3d_xla(x, w):
    # NOTE: no preferred_element_type — forcing f32 output materializes huge
    # f32 intermediates between bf16 convs (measured 3x slowdown in
    # composition); the TPU conv accumulates in f32 internally regardless.
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@jax.custom_vjp
def conv3d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 SAME stride-1 conv, channels-last: Pallas kernel when supported,
    XLA fallback otherwise. Differentiable (XLA dw, Pallas dx)."""
    if supported(x.shape, w.shape, x.dtype.itemsize):
        return _conv3d_pallas(x, w, out_dtype=x.dtype)
    return _conv3d_xla(x, w)


def _fwd(x, w):
    return conv3d(x, w), (x, w)


def _bwd(res, gy):
    x, w = res
    # dx: full correlation with spatially-flipped, IO-swapped weights — also
    # a 3x3x3 SAME conv, so it reuses the fast path.
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = conv3d(gy.astype(x.dtype), w_flip.astype(x.dtype))
    # dw through the z-decomposed batched-2D conv's transpose, NOT the native
    # 3D conv's: XLA's 2D weight-grad emitter tiles the MXU the same way its
    # 2D forward does (the whole reason ops/conv3d.py decomposes), while the
    # native-3D weight grad was measured to erase the Pallas forward's win
    # end-to-end (BASELINE.md A/B: 4.8 vs 9.9 it/s).
    from biapy_tpu.ops.conv3d import conv3d_as2d

    _, vjp = jax.vjp(lambda w_: conv3d_as2d(x, w_), w)
    (dw,) = vjp(gy.astype(x.dtype))
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d.defvjp(_fwd, _bwd)
