"""3D convolution strategy dispatch for TPU.

XLA's native 3D convolution on TPU underperforms at U-Net channel widths
(measured on v5e, bf16, 3x3x3 SAME stride-1): 13 TFLOP/s at C=32, 21 at
C=64, ~24 at C=128 — while the SAME convolution decomposed over the z taps
into three batched 2D convolutions (z folded into the batch axis) reaches
22/24/28-42 TFLOP/s on the same shapes, because XLA's 2D conv emitter tiles
the MXU far better. The decomposition is exact (same dot products, same
f32 accumulation inside each conv; the three partial sums add in f32).

Strategies, picked per shape at trace time (all static):

- ``cat2d``  — concatenate the three z-shifted planes into channels and run
  ONE 2D conv with a (3, 3, 3*Cin, Cout) kernel. Best when Cin is tiny
  (e.g. the 1-channel stem: 7.7ms vs 17.8ms XLA at 128^3 b5) since it
  triples the contraction depth.
- ``as2d``   — three 2D convs on z-shifted views, summed. Best at Cin >= 8.
- ``pallas`` — the hand-written MXU kernel (ops/pallas/conv3d.py), opt-in
  via BIAPY_TPU_PALLAS_CONV (wins at C=64: 34 TFLOP/s, but each custom call
  pays graph-boundary overhead on some platforms).
- ``xla``    — lax.conv_general_dilated fallback (always used off-TPU so CPU
  tests keep bit-identical reference numerics, and for strided/dilated/
  grouped convs).

Training: the decomposition autodiffs through plain jax ops, and its
backward (z-shifted batched 2D conv-transposes) keeps the same MXU-friendly
tiling — measured on the full bench train step (3D ResUNet fm 32/64/128,
128^3 bf16, fwd+loss+bwd+adamw, chain-forced timing on v5e): as2d 9.9 it/s
vs native-XLA conv3d 3.8 it/s (2.6x) vs the Pallas forward kernel 4.8 it/s
(its backward falls to the generic transpose — keep Pallas opt-in and
inference-oriented).

Reference analog: the reference's conv hot path is torch/cudnn
(biapy/models/blocks.py ConvBlock:25); this module is the TPU-first
replacement for that library dispatch.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_SPATIAL = {2: "HW", 3: "DHW"}


def conv_nd_xla(x, w, strides, padding, dil=None, groups=1):
    nd = x.ndim - 2
    sp = _SPATIAL[nd]
    dn = ("N" + sp + "C", sp + "IO", "N" + sp + "C")
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, rhs_dilation=dil,
        feature_group_count=groups, dimension_numbers=dn)


def _conv2d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv3d_as2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(kz, ky, kx) SAME stride-1 conv as kz z-shifted batched 2D convs."""
    b, d, h, wd, c = x.shape
    kz, co = w.shape[0], w.shape[-1]
    hz = kz // 2
    xp = jnp.pad(x, ((0, 0), (hz, hz), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(kz):
        x2 = xp[:, dz:dz + d].reshape(b * d, h, wd, c)
        o = _conv2d(x2, w[dz])
        out = o if out is None else out + o
    return out.reshape(b, d, h, wd, co)


def conv3d_cat2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(kz, ky, kx) SAME stride-1 conv as ONE 2D conv over z-concatenated
    channels — best for tiny Cin (triples+ the contraction depth)."""
    b, d, h, wd, c = x.shape
    kz, co = w.shape[0], w.shape[-1]
    hz = kz // 2
    xp = jnp.pad(x, ((0, 0), (hz, hz), (0, 0), (0, 0), (0, 0)))
    xc = jnp.concatenate([xp[:, dz:dz + d] for dz in range(kz)], axis=-1)
    wk = jnp.concatenate([w[dz] for dz in range(kz)], axis=2)  # (ky, kx, kz*Cin, Cout)
    o = _conv2d(xc.reshape(b * d, h, wd, kz * c), wk)
    return o.reshape(b, d, h, wd, co)


def conv3d_z1_as2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(1, ky, kx) stride-1 SAME 3D conv == a batched 2D conv over z."""
    b, d, h, wd, c = x.shape
    co = w.shape[-1]
    o = _conv2d(x.reshape(b * d, h, wd, c), w[0])
    return o.reshape(b, d, h, wd, co)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def fold3d_enabled() -> bool:
    """Whether the UNet family folds 3D activations to (b*z, y, x, c) for
    the WHOLE network (models/blocks.py fold3d). Default on for TPU: the
    per-conv 5D<->4D round trips of the as2d decomposition leave XLA
    flipping layouts at every block boundary (~21 ms/step of pure copies in
    the r3 train profile); keeping one folded layout end-to-end removes
    them. Off on CPU so tests keep native-conv numerics, overridable via
    BIAPY_TPU_FOLD3D=1/0."""
    env = os.environ.get("BIAPY_TPU_FOLD3D", "").lower()
    if env in ("0", "off", "false"):
        return False
    if env in ("1", "on", "true"):
        return True
    return _on_tpu()


def _conv2d_general(x, w, strides, dil, groups):
    return jax.lax.conv_general_dilated(
        x, w, strides, "SAME", rhs_dilation=dil,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _seam_mask(bd: int, d: int, off: int, dtype):
    """0/1 row mask zeroing folded rows whose z+off crosses an image
    boundary (b > 1: the row pad/slice bleeds the neighbouring image's
    plane where a 5D SAME conv would see zero padding)."""
    import numpy as np

    z = np.arange(bd) % d
    m = ((z + off) >= 0) & ((z + off) < d)
    return jnp.asarray(m.astype(np.float32), dtype).reshape(bd, 1, 1, 1)


def conv3d_folded(x4, w, strides, padding, dil, groups, d: int):
    """3D conv on a z-folded (b*d, h, w, c) activation; returns None when
    the shape combination is unsupported (caller unfolds to 5D).

    The z taps become row-shifted batched 2D convs — the same exact
    decomposition as conv3d_as2d, but with NO 5D reshapes: the pad/slice
    runs on the folded row axis, so consecutive convs, norms and
    elementwise ops all share one 4D layout.
    """
    kz = w.shape[0]
    st = tuple(strides) if strides is not None else (1, 1, 1)
    dl = tuple(dil) if dil is not None else (1, 1, 1)
    if padding != "SAME" or st[0] != 1 or dl[0] != 1:
        return None
    if kz != 1 and kz % 2 == 0:
        return None
    bd = x4.shape[0]
    b = bd // d
    if kz == 1:
        return _conv2d_general(x4, w[0], st[1:], dl[1:], groups)
    hz = kz // 2
    if groups == 1 and _prefer_cat(x4.shape[-1], w.shape[-1]):
        wk = jnp.concatenate([w[dz] for dz in range(kz)], axis=2)
        xc = None
        if (b == 1 and x4.shape[-1] >= 8 and _on_tpu()
                and os.environ.get("BIAPY_TPU_PALLAS_ZCAT", "") == "1"):
            # opt-in only: measured 7.6 ms vs XLA's 1.4 ms for the same
            # chain at (128,128,128,32) — the (1,hb,w,c) row-block grid
            # pays per-program overhead XLA's fused pad+slice+concat
            # doesn't. Kept for re-evaluation with larger blocks.
            from biapy_tpu.ops.pallas.shuffle import shuffle_enabled, zcat

            if shuffle_enabled():
                xc = zcat(x4, kz)
        if xc is None:
            xp = jnp.pad(x4, ((hz, hz), (0, 0), (0, 0), (0, 0)))
            taps = []
            for dz in range(kz):
                x2 = jax.lax.slice_in_dim(xp, dz, dz + bd, axis=0)
                off = dz - hz
                if b > 1 and off != 0:
                    x2 = x2 * _seam_mask(bd, d, off, x2.dtype)
                taps.append(x2)
            xc = jnp.concatenate(taps, axis=-1)
        return _conv2d_general(xc, wk, st[1:], dl[1:], groups)
    xp = jnp.pad(x4, ((hz, hz), (0, 0), (0, 0), (0, 0)))
    taps = []
    for dz in range(kz):
        x2 = jax.lax.slice_in_dim(xp, dz, dz + bd, axis=0)
        off = dz - hz
        if b > 1 and off != 0:
            x2 = x2 * _seam_mask(bd, d, off, x2.dtype)
        taps.append(x2)
    out = None
    for dz in range(kz):
        o = _conv2d_general(taps[dz], w[dz], st[1:], dl[1:], groups)
        out = o if out is None else out + o
    return out


def _prefer_cat(cin: int, cout: int) -> bool:
    """Strategy choice for the z-decomposed conv, measured on v5e bf16
    (tools/conv_ab.py, fwd+bwd per conv, min of 2 runs):

    | shape                | as2d    | cat2d  |
    | 32->32  @128^3 k3    | 29.2 ms |  8.1 ms|
    | 96->32  @128^3 k3    | 16.1 ms | 22.7 ms|
    |  1->32  @128^3 k3    | 15.2 ms |  1.7 ms|
    | 64->64  @64^3  k3    | 14.7 ms |  3.9 ms|
    | 192->64 @64^3  k3    | 14.3 ms |  9.0 ms|
    | 32->32  @128^3 k5    | 24.5 ms | 22.5 ms|

    cat2d (one conv over z-concatenated channels, kz*Cin contraction depth)
    wins everywhere except wide->narrow convs with small Cout, where the
    sum-of-taps as2d keeps the deeper-contraction advantage without 3x
    input materialization."""
    return not (cin > 2 * cout and cout < 64)


def conv3d_dispatch(x, w, strides, padding, dil, groups):
    """Pick the fastest exact strategy for a 3D conv; None = caller falls
    back to XLA. Decomposition only engages on TPU so CPU tests keep the
    native-conv numerics bit-for-bit."""
    if os.environ.get("BIAPY_TPU_CONV3D", "") == "xla":
        return None
    if strides != (1, 1, 1) or groups != 1 or padding != "SAME":
        return None
    if dil is not None and tuple(dil) != (1, 1, 1):
        return None
    if not _on_tpu():
        return None
    ks = tuple(w.shape[:3])
    if ks[0] > 1 and ks[0] % 2 == 1:
        if ks == (3, 3, 3):
            from biapy_tpu.ops.pallas.conv3d import supported

            if supported(x.shape, w.shape, x.dtype.itemsize):
                from biapy_tpu.ops.pallas.conv3d import conv3d as pallas_conv3d

                return pallas_conv3d(x, w)
        if groups == 1 and _prefer_cat(x.shape[-1], w.shape[-1]):
            return conv3d_cat2d(x, w)
        return conv3d_as2d(x, w)
    if ks[0] == 1 and ks[1] == ks[2]:
        # covers (1, k, k) anisotropic convs and (1, 1, 1) projection
        # shortcuts — keeping these in the same z-folded 2D space as the
        # decomposed 3x3x3 convs avoids layout flips around residual adds
        return conv3d_z1_as2d(x, w)
    return None
