"""Pallas shuffle kernels for the z-folded 3D layout.

The folded train step's non-conv time is dominated by HBM-bound shuffle
passes that XLA emits as separate low-bandwidth ops (r4 xplane profile,
128^3 bench step):

- cat2d's z-window build + its backward split/overlap-add (~9 ms/step as
  XLA slice/concatenate/split),
- max-pool forward/backward (the 6D window-reshape broadcast/eq runs at
  ~90-300 GB/s, ~8 ms/step),
- the transposed-conv z interleave (~4 ms/step as XLA concatenate).

Each pattern here is one VMEM-local pass: read a block, shuffle in
registers, write a block — the HBM traffic is the algorithmic minimum.
All kernels run on the folded (rows, y, x, c) layout (models/blocks.py
fold3d) and carry custom VJPs whose backwards are the mirror kernels.

Reference analog: these replace torch/cudnn implicit ops (im2col inside
cudnn, MaxPool3d, ConvTranspose3d scatter) — reference
biapy/models/blocks.py:25,510.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    import jax as _jax

    return _jax.default_backend() in ("cpu",)


def shuffle_enabled() -> bool:
    """Default OFF: measured on the v5e train step, the custom calls break
    XLA's producer/consumer fusion around them and the step slows 11.6 ->
    6.2 it/s even where a kernel wins standalone (zd2s 4.1 ms vs XLA 7.8).
    Kept opt-in for future block-level fusion work."""
    env = os.environ.get("BIAPY_TPU_PALLAS_SHUFFLE", "").lower()
    return env in ("1", "on", "true")


def _pad_sub(n: int) -> int:
    """Sublane padding (second-to-last block dim): 16 covers bf16/f32."""
    return -(-n // 16) * 16


def _pad_lane(n: int) -> int:
    """Lane padding (last block dim): Mosaic pads to 128 lanes, so a c=1
    block occupies 128x its nominal bytes — sizing MUST use padded dims."""
    return -(-n // 128) * 128


def _pick_hb(h: int, unit_bytes: int, budget: int = 6 * 1024 * 1024) -> int:
    """Largest divisor hb of h with hb * unit_bytes <= budget."""
    hb = max(1, min(h, budget // max(1, unit_bytes)))
    while hb > 1 and h % hb:
        hb -= 1
    return hb


# ---------------------------------------------------------------------------
# zcat: build the z-window channel concatenation for cat2d convs.
# out[r, :, :, t*c:(t+1)*c] = x[r + t - hz]   (zero outside [0, rows))
# ---------------------------------------------------------------------------


def _zcat_kernel(kz, rows, *refs):
    ins = refs[:kz]
    out = refs[kz]
    r = pl.program_id(0)
    hz = kz // 2
    c = ins[0].shape[-1]
    for t in range(kz):
        src_row = r + t - hz  # row of the un-padded input this tap reads

        @pl.when(jnp.logical_and(src_row >= 0, src_row < rows))
        def _(t=t):
            out[0, :, :, t * c:(t + 1) * c] = ins[t][0]

        @pl.when(jnp.logical_or(src_row < 0, src_row >= rows))
        def _(t=t):
            out[0, :, :, t * c:(t + 1) * c] = jnp.zeros_like(ins[t][0])


def _zcat_call(x, kz: int):
    rows, h, w, c = x.shape
    hz = kz // 2
    # x2 for the pallas pipeline double-buffering of every block
    unit = 2 * x.dtype.itemsize * _pad_sub(w) * (
        kz * _pad_lane(c) + _pad_lane(kz * c))
    hb = _pick_hb(h, unit)
    grid = (rows, h // hb)

    def in_spec(t):
        # clamp the row index into range; the kernel masks the real bounds
        return pl.BlockSpec(
            (1, hb, w, c),
            lambda r, j, t=t: (jnp.clip(r + t - hz, 0, rows - 1), j, 0, 0),
            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_zcat_kernel, kz, rows),
        grid=grid,
        in_specs=[in_spec(t) for t in range(kz)],
        out_specs=pl.BlockSpec((1, hb, w, kz * c),
                               lambda r, j: (r, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, h, w, kz * c), x.dtype),
        interpret=_interpret(),
    )(*([x] * kz))


def _zcat_bwd_kernel(kz, rows, *refs):
    ins = refs[:kz]  # kz views of the cotangent, row-shifted
    out = refs[kz]
    r = pl.program_id(0)
    hz = kz // 2
    c = out.shape[-1]
    acc = None
    for t in range(kz):
        # fwd: xc[q, t] = x[q + t - hz]  =>  dx[r] += dxc[r - t + hz, t]
        src = r - t + hz
        contrib = jnp.where(
            jnp.logical_and(src >= 0, src < rows),
            ins[t][0, :, :, t * c:(t + 1) * c].astype(jnp.float32), 0.0)
        acc = contrib if acc is None else acc + contrib
    out[0] = acc.astype(out.dtype)


def _zcat_bwd_call(g, kz: int, c: int):
    rows, h, w, _ = g.shape
    hz = kz // 2
    unit = 2 * g.dtype.itemsize * _pad_sub(w) * (
        kz * _pad_lane(kz * c) + _pad_lane(c))
    hb = _pick_hb(h, unit)
    grid = (rows, h // hb)

    def in_spec(t):
        return pl.BlockSpec(
            (1, hb, w, kz * c),
            lambda r, j, t=t: (jnp.clip(r - t + hz, 0, rows - 1), j, 0, 0),
            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_zcat_bwd_kernel, kz, rows),
        grid=grid,
        in_specs=[in_spec(t) for t in range(kz)],
        out_specs=pl.BlockSpec((1, hb, w, c),
                               lambda r, j: (r, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, h, w, c), g.dtype),
        interpret=_interpret(),
    )(*([g] * kz))


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def zcat(x, kz: int):
    """(rows, h, w, c) -> (rows, h, w, kz*c) z-window concatenation."""
    return _zcat_call(x, kz)


def _zcat_fwd(x, kz):
    return _zcat_call(x, kz), x.shape[-1]


def _zcat_bwd(kz, c, g):
    return (_zcat_bwd_call(g, kz, c),)


zcat.defvjp(_zcat_fwd, _zcat_bwd)


# ---------------------------------------------------------------------------
# Folded max pooling, window (wz, wy, wx), strides == window.
# ---------------------------------------------------------------------------


def _pool_fwd_kernel(win, x_ref, y_ref):
    wz, wy, wx = win
    _, hb2, w2, c = x_ref.shape  # block (wz, hb*wy, w*wx, c)
    hb, w = hb2 // wy, w2 // wx
    x = x_ref[...]
    x = x.reshape(wz, hb, wy, w, wx, c)
    y_ref[0] = x.max(axis=(0, 2, 4))


def _pool_bwd_kernel(win, x_ref, y_ref, g_ref, dx_ref):
    # eq-mask backward without any 6D views: upsample y/g by per-element
    # repeats (supported by Mosaic), then one where() per z offset
    wz, wy, wx = win
    y = y_ref[0]  # (hb, wo, c)
    g = g_ref[0]
    yu = y if wy == 1 else jnp.repeat(y, wy, axis=0)
    gu = g if wy == 1 else jnp.repeat(g, wy, axis=0)
    if wx > 1:
        yu = jnp.repeat(yu, wx, axis=1)
        gu = jnp.repeat(gu, wx, axis=1)
    zero = jnp.zeros((), g_ref.dtype)
    for a in range(wz):
        dx_ref[a] = jnp.where(x_ref[a] == yu, gu, zero)


def _pool_specs(rows, h, w, c, win, itemsize):
    wz, wy, wx = win
    ho, wo = h // wy, w // wx
    # worst case (bwd): x + y + g + dx blocks, double-buffered
    unit = 2 * itemsize * (2 * wz * wy * _pad_sub(w) * _pad_lane(c)
                           + 2 * _pad_sub(wo) * _pad_lane(c))
    hb = _pick_hb(ho, unit)
    grid = (rows // wz, ho // hb)
    x_spec = pl.BlockSpec((wz, hb * wy, w, c), lambda r, j: (r, j, 0, 0),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, hb, wo, c), lambda r, j: (r, j, 0, 0),
                          memory_space=pltpu.VMEM)
    return grid, x_spec, y_spec, (rows // wz, ho, wo, c), hb


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def pool_max_folded(x, win: Tuple[int, int, int]):
    """Max pool on folded rows: (rows, h, w, c) -> (rows/wz, h/wy, w/wx, c)."""
    rows, h, w, c = x.shape
    grid, x_spec, y_spec, out_shape, _ = _pool_specs(rows, h, w, c, win,
                                                     x.dtype.itemsize)
    return pl.pallas_call(
        partial(_pool_fwd_kernel, win),
        grid=grid,
        in_specs=[x_spec],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        interpret=_interpret(),
    )(x)


def _pool_max_fwd(x, win):
    y = pool_max_folded(x, win)
    return y, (x, y)


def _pool_max_bwd(win, res, g):
    x, y = res
    rows, h, w, c = x.shape
    grid, x_spec, y_spec, _, _ = _pool_specs(rows, h, w, c, win,
                                             x.dtype.itemsize)
    dx = pl.pallas_call(
        partial(_pool_bwd_kernel, win),
        grid=grid,
        in_specs=[x_spec, y_spec, y_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, g.dtype),
        interpret=_interpret(),
    )(x, y, g)
    return (dx,)


pool_max_folded.defvjp(_pool_max_fwd, _pool_max_bwd)


# ---------------------------------------------------------------------------
# z depth-to-space: (rows, h, w, sz*c) -> (rows*sz, h, w, c)
# out[r*sz + a] = in[r, :, :, a*c:(a+1)*c]
# ---------------------------------------------------------------------------


def _zd2s_kernel(sz, x_ref, y_ref):
    _, hb, w, szc = x_ref.shape
    c = szc // sz
    x = x_ref[0]  # (hb, w, sz*c)
    for a in range(sz):
        y_ref[a] = x[:, :, a * c:(a + 1) * c]


def _zs2d_kernel(sz, g_ref, dx_ref):
    _, hb, w, c = g_ref.shape[0], g_ref.shape[1], g_ref.shape[2], g_ref.shape[3]
    parts = [g_ref[a] for a in range(sz)]
    dx_ref[0] = jnp.concatenate(parts, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def zd2s(x, sz: int):
    rows, h, w, szc = x.shape
    c = szc // sz
    unit = 2 * x.dtype.itemsize * _pad_sub(w) * (
        _pad_lane(szc) + sz * _pad_lane(c))
    hb = _pick_hb(h, unit)
    grid = (rows, h // hb)
    return pl.pallas_call(
        partial(_zd2s_kernel, sz),
        grid=grid,
        in_specs=[pl.BlockSpec((1, hb, w, szc), lambda r, j: (r, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((sz, hb, w, c), lambda r, j: (r, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows * sz, h, w, c), x.dtype),
        interpret=_interpret(),
    )(x)


def _zd2s_fwd(x, sz):
    return zd2s(x, sz), x.shape


def _zd2s_bwd(sz, shape, g):
    rows, h, w, szc = shape
    c = szc // sz
    unit = 2 * g.dtype.itemsize * _pad_sub(w) * (
        _pad_lane(szc) + sz * _pad_lane(c))
    hb = _pick_hb(h, unit)
    grid = (rows, h // hb)
    dx = pl.pallas_call(
        partial(_zs2d_kernel, sz),
        grid=grid,
        in_specs=[pl.BlockSpec((sz, hb, w, c), lambda r, j: (r, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hb, w, szc), lambda r, j: (r, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, g.dtype),
        interpret=_interpret(),
    )(g)
    return (dx,)


zd2s.defvjp(_zd2s_fwd, _zd2s_bwd)
