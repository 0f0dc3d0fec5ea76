"""Shared Flax building blocks for the model zoo.

Reference analog: biapy/models/blocks.py (ConvBlock:25, UpBlock:510,
AttentionBlock:1014, SqExBlock:1119, ResConvBlock:1194, ResUpBlock:1462,
ConvNeXtBlock_V1/V2:268/423, GRN:366).

TPU-first design notes:
* channels-last layouts (NHWC / NDHWC) throughout — native for XLA:TPU convs,
* one rank-generic implementation covers 2D and 3D (flax convs are N-D),
* anisotropic 3D levels use (1, k, k) kernels / (z_down, yx, yx) pooling,
  matching the reference's isotropy/z_down semantics,
* he-normal conv init (the reference applies Kaiming init, models/blocks.py
  init_weights).
"""

from __future__ import annotations

from functools import partial
import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# The reference applies xavier_uniform to every conv/linear
# (models/blocks.py init_weights); matching it keeps residual stacks
# (EDSR/RCAN) numerically tame at initialization.
KERNEL_INIT = nn.initializers.xavier_uniform()


# ---------------------------------------------------------------------------
# Folded-3D context: inside `fold3d(d)`, 3D activations travel as
# (b*d, y, x, c) — z-shifts become row pad/slice on dim 0 — so the whole
# network shares ONE 4D layout instead of bouncing 5D<->4D around every
# conv (the as2d decomposition's per-conv reshapes left XLA flipping
# layouts at each block boundary: ~21 ms/step of copies in the r3 bench
# train profile). The context is trace-time static (a Python int depth);
# parameter shapes/names are untouched, so checkpoints are identical.
# ---------------------------------------------------------------------------

_FOLD_STACK: list = []


def fold_batch() -> Optional[int]:
    """Static true batch size when inside a fold3d context, else None.
    The context stores b (invariant through the network) rather than the
    z-depth: pooling/upsampling change depth per level, so each op derives
    its current depth as rows // b."""
    return _FOLD_STACK[-1] if _FOLD_STACK else None


def fold_depth(x=None) -> Optional[int]:
    """Current static z-depth of a folded activation (rows // batch), or
    None outside a fold3d context. With no tensor, just reports whether a
    fold context is active (returns the batch size)."""
    b = fold_batch()
    if b is None:
        return None
    if x is None:
        return b
    return x.shape[0] // b


class fold3d:
    def __init__(self, batch: int):
        self.b = int(batch)

    def __enter__(self):
        _FOLD_STACK.append(self.b)
        return self

    def __exit__(self, *exc):
        _FOLD_STACK.pop()
        return False


def data_ndim(x) -> int:
    """Spatial rank of an activation, fold-aware: a folded (b*d, y, x, c)
    tensor is 3D data."""
    if fold_batch() is not None and x.ndim == 4:
        return 3
    return x.ndim - 2


def unfold5d(x, d: int):
    return x.reshape((x.shape[0] // d, d) + x.shape[1:])


def refold4d(x):
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


class Conv(nn.Module):
    """Drop-in nn.Conv replacement that routes 3D convolutions through the
    fastest exact TPU strategy (biapy_tpu/ops/conv3d.py: z-decomposed 2D
    convs ~1.7x XLA's native conv3d at U-Net channel widths; Pallas MXU
    kernel opt-in) and everything else through lax.conv_general_dilated.
    Parameter names and shapes match
    nn.Conv ("kernel": kernel_size + (Cin, Cout), "bias": (Cout,)), and the
    class name keeps flax auto-naming ("Conv_0", ...) identical, so
    checkpoints are interchangeable with plain nn.Conv models."""

    features: int
    kernel_size: Sequence[int]
    strides: Optional[Sequence[int]] = None
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_dilation: Optional[Sequence[int]] = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = tuple(self.kernel_size)
        nd = len(ks)
        in_f = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel", self.kernel_init, ks + (in_f, self.features))
        st = self.strides
        strides = ((st,) * nd if isinstance(st, int)
                   else tuple(st) if st is not None else (1,) * nd)
        kd = self.kernel_dilation
        dil = ((kd,) * nd if isinstance(kd, int)
               else tuple(kd) if kd is not None else (1,) * nd)

        y = None
        fb = fold_batch()
        if fb is not None and x.ndim == 4 and nd == 3:
            from biapy_tpu.ops.conv3d import conv3d_folded

            d = x.shape[0] // fb
            y = conv3d_folded(x, kernel.astype(x.dtype), strides,
                              self.padding, dil, self.feature_group_count, d)
            if y is None:  # unsupported combo: unfold, run 5D, refold
                y5 = self._conv5d(unfold5d(x, d), kernel, strides, dil)
                y = refold4d(y5)
        elif x.ndim == 5:
            from biapy_tpu.ops.conv3d import conv3d_dispatch

            # fastest exact strategy for the shape (z-decomposed 2D convs /
            # Pallas MXU kernel / None -> XLA); see ops/conv3d.py
            y = conv3d_dispatch(x, kernel.astype(x.dtype), strides,
                                self.padding, dil, self.feature_group_count)
        if y is None:
            sp = "DHW"[3 - nd:]
            dn = ("N" + sp + "C", sp + "IO", "N" + sp + "C")
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), strides, self.padding,
                rhs_dilation=dil, feature_group_count=self.feature_group_count,
                dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y

    def _conv5d(self, x, kernel, strides, dil):
        from biapy_tpu.ops.conv3d import conv3d_dispatch

        y = conv3d_dispatch(x, kernel.astype(x.dtype), strides,
                            self.padding, dil, self.feature_group_count)
        if y is None:
            dn = ("NDHWC", "DHWIO", "NDHWC")
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), strides, self.padding,
                rhs_dilation=dil, feature_group_count=self.feature_group_count,
                dimension_numbers=dn)
        return y


class ConvTranspose(nn.Module):
    """Drop-in nn.ConvTranspose replacement. When kernel_size == strides
    (every upsampling site in the zoo) the transposed conv is computed as a
    per-voxel matmul + depth-to-space interleave instead of XLA's transposed
    convolution: each output voxel receives exactly one kernel tap, so
    y[b, s*d+i, ..., co] = sum_c x[b, d, ..., c] * W[flip(i), ..., c, co] —
    bit-exact vs nn.ConvTranspose (verified). On TPU the dot has a full
    contraction (C) and full lanes (prod(scale)*Cout), avoiding the conv3d
    emitter's internal relayout (3.2x-padded {2,4,3,1,0} temps, see
    ops/conv3d.py). Parameter names/shapes and the flax auto-name
    ("ConvTranspose_0", ...) match nn.ConvTranspose, so checkpoints are
    interchangeable."""

    features: int
    kernel_size: Sequence[int]
    strides: Optional[Sequence[int]] = None
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = tuple(self.kernel_size)
        nd = len(ks)
        st = self.strides
        strides = ((st,) * nd if isinstance(st, int)
                   else tuple(st) if st is not None else (1,) * nd)
        kernel = self.param("kernel", self.kernel_init, ks + (x.shape[-1], self.features))
        fb = fold_batch()
        if (fb is not None and x.ndim == 4 and nd == 3
                and ks == strides and self.padding == "SAME"):
            # folded fast path: one 2D transposed conv per z tap, z-taps
            # interleaved along the folded row axis (row r = b*d + z maps
            # to rows r*sz..r*sz+sz-1 — image blocks stay contiguous; no
            # cross-row taps, so no seam handling). Measured on v5e
            # (tools/convt_ab.py, 64ch@64^3): fwd+bwd 9.2 ms vs 6651 ms
            # for the per-voxel-matmul + 7D-transpose interleave — XLA's
            # 2D transposed-conv emitter handles the yx depth-to-space far
            # better than the explicit transpose copy.
            sz, sy, sx = ks
            co = self.features
            bd, h, w = x.shape[0], x.shape[1], x.shape[2]
            kx = kernel.astype(x.dtype)
            # z phase a takes kernel plane sz-1-a: lax.conv_transpose
            # mirrors the kernel (transpose_kernel=False), and the 2D call
            # already mirrors y/x — only the z flip is done by hand here
            use_zd2s = sz > 1 and jax.default_backend() not in ("cpu", "gpu")
            if use_zd2s:
                from biapy_tpu.ops.pallas.shuffle import shuffle_enabled, zd2s

                use_zd2s = shuffle_enabled()
            if use_zd2s:
                # ONE 2D transposed conv with the z taps stacked on the
                # output-channel axis, then a VMEM-local z interleave (the
                # XLA stack/concatenate costs ~4 ms/step on the bench
                # profile; per-tap convs also pay the emitter twice)
                k2 = jnp.concatenate([kx[sz - 1 - a] for a in range(sz)],
                                     axis=-1)
                y = jax.lax.conv_transpose(
                    x, k2, (sy, sx), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if self.use_bias:
                    bias = self.param("bias", self.bias_init, (self.features,))
                    y = y + jnp.tile(bias, sz).astype(y.dtype)
                return zd2s(y, sz)
            convt_mode = os.environ.get("BIAPY_TPU_CONVT", "")
            if sz > 1 and (convt_mode == "fusedxla" or (
                    convt_mode == ""
                    and jax.default_backend() not in ("cpu", "gpu"))):
                # DEFAULT on TPU (r5 A/B: 12.16 -> 12.30 it/s on the bench
                # train step combined with repeat4d pool-bwd; bit-equal to
                # the per-tap formulation by test): ONE 2D transposed conv
                # with z taps stacked on the output-channel axis, then a
                # pure-XLA z depth-to-space (single transpose instead of
                # per-tap convs + stack). BIAPY_TPU_CONVT=pertap forces the
                # old formulation.
                k2 = jnp.concatenate([kx[sz - 1 - a] for a in range(sz)],
                                     axis=-1)
                y = jax.lax.conv_transpose(
                    x, k2, (sy, sx), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if self.use_bias:
                    bias = self.param("bias", self.bias_init, (self.features,))
                    y = y + jnp.tile(bias, sz).astype(y.dtype)
                return y.reshape(bd, h * sy, w * sx, sz, co).transpose(
                    0, 3, 1, 2, 4).reshape(bd * sz, h * sy, w * sx, co)
            outs = [jax.lax.conv_transpose(
                x, kx[sz - 1 - a], (sy, sx), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
                for a in range(sz)]
            if sz == 1:
                y = outs[0]
            else:
                y = jnp.stack(outs, axis=1).reshape(bd * sz, h * sy, w * sx, co)
            if self.use_bias:
                bias = self.param("bias", self.bias_init, (self.features,))
                y = y + bias.astype(y.dtype)
            return y
        if fb is not None and x.ndim == 4 and nd == 3:
            x = unfold5d(x, x.shape[0] // fb)
            y = self._generic(x, kernel, strides, nd)
            return refold4d(y)
        if ks == strides and self.padding == "SAME":
            cin, co = x.shape[-1], self.features
            k = jnp.flip(kernel, axis=tuple(range(nd))).astype(x.dtype)
            wmat = k.reshape((-1, cin, co)).transpose(1, 0, 2).reshape(cin, -1)
            y = x @ wmat
            if self.use_bias:
                # add the bias HERE, where co is the minor axis of the dot
                # output (tiled over the taps): it fuses into the matmul
                # epilogue; after the depth-to-space transpose it would cost
                # a separate full-tensor read+write pass
                bias = self.param("bias", self.bias_init, (self.features,))
                y = y + jnp.tile(bias, y.shape[-1] // co).astype(y.dtype)
            b = x.shape[0]
            sp = x.shape[1:1 + nd]
            y = y.reshape((b,) + tuple(sp) + ks + (co,))
            if nd == 3:
                y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
            else:
                y = y.transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape((b,) + tuple(s * k_ for s, k_ in zip(sp, ks)) + (co,))
        else:
            y = self._generic(x, kernel, strides, nd)
        return y

    def _generic(self, x, kernel, strides, nd):
        sp_ax = "DHW"[3 - nd:]
        dn = ("N" + sp_ax + "C", sp_ax + "IO", "N" + sp_ax + "C")
        y = jax.lax.conv_transpose(x, kernel.astype(x.dtype), strides,
                                   self.padding, dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def get_activation(name: Optional[str]) -> Callable:
    """Map a BiaPy activation name to a jax function (reference:
    models/blocks.py get_activation)."""
    if not name or name.lower() in ("none", "linear"):
        return lambda x: x
    name = name.lower()
    table = {
        "relu": nn.relu,
        "elu": nn.elu,
        "gelu": nn.gelu,
        "silu": nn.silu,
        "swish": nn.silu,
        "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "prelu": lambda x: nn.leaky_relu(x, negative_slope=0.25),
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "softmax": lambda x: nn.softmax(x, axis=-1),
        "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
        "relu6": lambda x: jnp.minimum(nn.relu(x), 6.0),
        "hardswish": lambda x: x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0,
    }
    if name not in table:
        raise ValueError(f"Unknown activation: {name}")
    return table[name]


class Norm(nn.Module):
    """Normalization by name: 'bn', 'sync_bn', 'in', 'gn', 'none'.

    'sync_bn' maps to BatchNorm with cross-device axis 'data' when inside
    pjit/shard_map — on TPU, batch stats are synchronized via psum by setting
    ``axis_name`` (the reference uses torch SyncBatchNorm).
    """

    kind: str = "none"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Keep activations in the input dtype: flax norms promote bf16
        # activations to fp32 (params/stats are fp32), which would silently
        # run everything downstream at half MXU rate on TPU. Params and
        # batch stats stay fp32 (param_dtype default); only the compute /
        # output dtype follows x.
        if self.kind == "none":
            return x
        fb = fold_batch()
        if fb is not None and x.ndim == 4 and self.kind in ("gn", "in"):
            # per-SAMPLE stats need the true batch axis: unfold around the
            # norm (bn/ln reduce identically in folded form; gn/in do not)
            return refold4d(self._apply(unfold5d(x, x.shape[0] // fb), train))
        return self._apply(x, train)

    def _apply(self, x, train: bool):
        if self.kind in ("bn", "sync_bn"):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=x.dtype,
                axis_name=self.axis_name if self.kind == "sync_bn" else None,
            )(x)
        if self.kind == "gn":
            groups = min(8, x.shape[-1])
            while x.shape[-1] % groups != 0:
                groups -= 1
            return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=x.dtype)(x)
        if self.kind == "in":
            # InstanceNorm == GroupNorm with one group per channel.
            return nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5, dtype=x.dtype)(x)
        if self.kind == "ln":
            return nn.LayerNorm(epsilon=1e-6, dtype=x.dtype)(x)
        raise ValueError(f"Unknown normalization: {self.kind}")


def _expand(val: Union[int, Sequence[int]], ndim: int) -> Tuple[int, ...]:
    if isinstance(val, int):
        return (val,) * ndim
    return tuple(val)


def aniso_kernel(k: int, ndim: int, isotropic: bool) -> Tuple[int, ...]:
    """(k,k) in 2D; (k,k,k) or (1,k,k) in 3D depending on level isotropy."""
    if ndim == 2:
        return (k, k)
    return (k, k, k) if isotropic else (1, k, k)


class SqExBlock(nn.Module):
    """Squeeze-and-Excitation channel recalibration (reference: blocks.py:1119)."""

    r: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fb = fold_batch()
        folded = fb is not None and x.ndim == 4
        if folded:
            fd = x.shape[0] // fb
            # squeeze per true sample: reduce y/x first, then the z rows
            s = jnp.mean(x, axis=(1, 2)).reshape(fb, fd, c).mean(axis=1)
        else:
            spatial_axes = tuple(range(1, x.ndim - 1))
            s = jnp.mean(x, axis=spatial_axes)  # (B, C)
        s = nn.Dense(max(1, c // self.r), use_bias=False, kernel_init=KERNEL_INIT)(s)
        s = nn.relu(s)
        s = nn.Dense(c, use_bias=False, kernel_init=KERNEL_INIT)(s)
        s = nn.sigmoid(s)
        if folded:
            s = jnp.repeat(s, fd, axis=0).reshape(x.shape[0], 1, 1, c)
        else:
            s = s.reshape((x.shape[0],) + (1,) * (x.ndim - 2) + (c,))
        return x * s


class ConvBlock(nn.Module):
    """``nconvs`` stacked (conv, norm, act, dropout) units with configurable
    ordering, optional SE block (reference: blocks.py:25)."""

    features: int
    k_size: Union[int, Tuple[int, ...]] = 3
    strides: Union[int, Tuple[int, ...]] = 1
    act: Optional[str] = None
    norm: str = "none"
    dropout: float = 0.0
    se_block: bool = False
    nconvs: int = 1
    order: str = "conv_norm_act"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        act_fn = get_activation(self.act)
        ndim = data_ndim(x)
        k = _expand(self.k_size, ndim)
        for i in range(self.nconvs):
            strides = _expand(self.strides if i == 0 else 1, ndim)
            conv = Conv(
                self.features, kernel_size=k, strides=strides, padding="SAME",
                use_bias=self.use_bias, kernel_init=KERNEL_INIT,
            )
            if self.order == "norm_act_conv":
                x = Norm(self.norm)(x, train)
                x = act_fn(x)
                x = conv(x)
            else:
                x = conv(x)
                x = Norm(self.norm)(x, train)
                x = act_fn(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            # SE is applied after every conv when stacking (the reference's
            # nconvs>1 path builds one inner ConvBlock per conv, each with its
            # own SE; blocks.py:127-147).
            if self.se_block:
                x = SqExBlock()(x)
        return x


class ResConvBlock(nn.Module):
    """Residual block (reference: blocks.py:1194).

    Default ``order='conv_norm_act'`` is the reference's historical
    post-activation design: optional [norm, act] on the block input (skipped
    for the network's very first block), optional pre-activated extra conv
    (Kisuk et al. 2017; makes the shortcut an identity), then a main path of
    ``nconvs`` ConvBlocks whose FINAL conv is bare (no norm/act), plus a
    projection shortcut (1-wide conv + skip_norm). ``order='norm_act_conv'``
    builds the full pre-activation variant (He et al. 2016).
    SE (if any) recalibrates the summed output once.
    """

    features: int
    k_size: Union[int, Tuple[int, ...]] = 3
    act: Optional[str] = None
    norm: str = "none"
    dropout: float = 0.0
    skip_k_size: Union[int, Tuple[int, ...]] = 1
    skip_norm: str = "none"
    first_block: bool = False
    se_block: bool = False
    extra_conv: bool = False
    nconvs: int = 2
    order: str = "conv_norm_act"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act_fn = get_activation(self.act)
        ndim = data_ndim(x)
        k = _expand(self.k_size, ndim)
        pre = self.order == "norm_act_conv"

        main_in = x
        if pre:
            if self.extra_conv:
                main_in = ConvBlock(
                    self.features, k, act=self.act, norm=self.norm,
                    dropout=self.dropout, order="norm_act_conv",
                )(main_in, train)
            h = main_in
            for _ in range(self.nconvs):
                h = ConvBlock(
                    self.features, k, act=self.act, norm=self.norm,
                    dropout=self.dropout, order="norm_act_conv",
                )(h, train)
        else:
            input_prelude = not self.first_block
            if self.extra_conv:
                if input_prelude:
                    main_in = Norm(self.norm)(main_in, train)
                    main_in = act_fn(main_in)
                main_in = ConvBlock(
                    self.features, k, act=self.act, norm=self.norm, dropout=self.dropout
                )(main_in, train)
                h = main_in
            else:
                # [norm, act] belong to the main path only; the shortcut sees
                # the raw block input (reference: forward does
                # block(x) + shortcut(x)).
                h = main_in
                if input_prelude:
                    h = Norm(self.norm)(h, train)
                    h = act_fn(h)
            h = ConvBlock(self.features, k, act=self.act, norm=self.norm, dropout=self.dropout)(h, train)
            for _ in range(max(0, self.nconvs - 2)):
                h = ConvBlock(self.features, k, act=self.act, norm=self.norm, dropout=self.dropout)(h, train)
            if self.nconvs >= 2:
                h = ConvBlock(self.features, k)(h, train)  # final bare conv

        if self.extra_conv:
            shortcut = main_in
        else:
            shortcut = Conv(
                self.features, kernel_size=_expand(self.skip_k_size, ndim), padding="SAME",
                use_bias=True, kernel_init=KERNEL_INIT,
            )(main_in)
            shortcut = Norm(self.skip_norm)(shortcut, train)

        out = h + shortcut
        if self.se_block:
            out = SqExBlock()(out)
        return out


class AttentionGate(nn.Module):
    """Attention U-Net gating of the skip connection (reference:
    blocks.py:1014; Oktay et al. 2018)."""

    features: int
    norm: str = "none"

    @nn.compact
    def __call__(self, x_skip, g, train: bool = False):
        ndim = data_ndim(x_skip)
        one = (1,) * ndim
        wg = Conv(self.features, kernel_size=one, kernel_init=KERNEL_INIT)(g)
        wg = Norm(self.norm)(wg, train)
        # The skip branch is intentionally un-normalized, matching the
        # reference's effective behaviour (its w_x norm is never registered,
        # blocks.py:1065-1072).
        wx = Conv(self.features, kernel_size=one, kernel_init=KERNEL_INIT)(x_skip)
        psi = nn.relu(wg + wx)
        psi = Conv(1, kernel_size=one, kernel_init=KERNEL_INIT)(psi)
        psi = Norm(self.norm)(psi, train)
        psi = nn.sigmoid(psi)
        return x_skip * psi


def upsample_nearest(x, scale: Sequence[int]):
    """Nearest-neighbour upsampling by integer per-axis factors."""
    if fold_batch() is not None and x.ndim == 4 and len(scale) == 3:
        # z-repeat on the folded row axis repeats each row in place, which
        # is exactly nearest-z upsampling for any batch size
        if scale[0] > 1:
            x = jnp.repeat(x, scale[0], axis=0)
        for d, s in enumerate(scale[1:]):
            if s > 1:
                x = jnp.repeat(x, s, axis=d + 1)
        return x
    for d, s in enumerate(scale):
        if s > 1:
            x = jnp.repeat(x, s, axis=d + 1)
    return x


def upsample_linear(x, scale: Sequence[int]):
    """Bi/tri-linear upsampling by integer per-axis factors (reference:
    nn.Upsample(mode='bilinear'/'trilinear'))."""
    fb = fold_batch()
    if fb is not None and x.ndim == 4 and len(scale) == 3:
        # z interpolation must not cross image seams: unfold around resize
        return refold4d(upsample_linear(unfold5d(x, x.shape[0] // fb), scale))
    new_shape = (x.shape[0],) + tuple(s * f for s, f in zip(x.shape[1:-1], scale)) + (x.shape[-1],)
    return jax.image.resize(x, new_shape, method="linear")


class UpLayer(nn.Module):
    """Upsampling step: transpose conv, or bilinear upsample + 1-wide conv,
    followed by optional norm + activation (reference: UpBlock's `up`
    sequential, blocks.py:600-614)."""

    features: int
    scale: Tuple[int, ...]
    up_mode: str = "convtranspose"
    norm: str = "none"
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.up_mode == "convtranspose":
            x = ConvTranspose(
                self.features, kernel_size=self.scale, strides=self.scale,
                kernel_init=KERNEL_INIT,
            )(x)
        else:
            x = upsample_linear(x, self.scale)
            x = Conv(self.features, kernel_size=(1,) * len(self.scale), kernel_init=KERNEL_INIT)(x)
        x = Norm(self.norm)(x, train)
        return get_activation(self.act)(x)


class UpBlock(nn.Module):
    """Decoder stage: upsample, (optionally attention-gate the skip),
    concat skip, refine (reference: blocks.py:510 / ResUpBlock:1462)."""

    features: int
    scale: Tuple[int, ...]
    k_size: Union[int, Tuple[int, ...]] = 3
    up_mode: str = "convtranspose"
    act: Optional[str] = None
    norm: str = "none"
    dropout: float = 0.0
    attention_gate: bool = False
    se_block: bool = False
    residual: bool = False
    extra_conv: bool = False
    skip_norm: str = "none"
    skip_k_size: Union[int, Tuple[int, ...]] = 1
    nconvs: int = 2
    order: str = "conv_norm_act"

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        if self.residual:
            # ResUpBlock (reference: blocks.py:1462): channel-preserving
            # upsample with no norm/act, refinement in the ResConvBlock.
            if self.up_mode == "convtranspose":
                up = ConvTranspose(
                    x.shape[-1], kernel_size=self.scale, strides=self.scale,
                    kernel_init=KERNEL_INIT,
                )(x)
            else:
                up = upsample_linear(x, self.scale)
        else:
            up = UpLayer(self.features, self.scale, self.up_mode, norm=self.norm, act=self.act)(x, train)
        if self.attention_gate:
            skip = AttentionGate(max(1, self.features // 2), norm=self.norm)(skip, up, train)
        h = jnp.concatenate([up, skip], axis=-1)
        if self.residual:
            return ResConvBlock(
                self.features, self.k_size, act=self.act, norm=self.norm,
                dropout=self.dropout, se_block=self.se_block, extra_conv=self.extra_conv,
                skip_norm=self.skip_norm, skip_k_size=self.skip_k_size,
                nconvs=self.nconvs, order=self.order,
            )(h, train)
        return ConvBlock(
            self.features, self.k_size, act=self.act, norm=self.norm,
            dropout=self.dropout, se_block=self.se_block, nconvs=self.nconvs,
            order=self.order,
        )(h, train)


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXt V2; reference: blocks.py:366)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (dim,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        fb = fold_batch()
        if fb is not None and x.ndim == 4:
            fd = x.shape[0] // fb
            # per-sample stats over (z, y, x): fold rows belong to b*d
            sq = jnp.sum(jnp.square(x), axis=(1, 2))  # (b*d, c)
            sq = sq.reshape(fb, fd, dim).sum(axis=1)  # (b, c)
            gx = jnp.sqrt(sq + 1e-12)
            nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
            nx = jnp.repeat(nx, fd, axis=0).reshape(x.shape[0], 1, 1, dim)
            return gamma * (x * nx) + beta + x
        spatial_axes = tuple(range(1, x.ndim - 1))
        gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=spatial_axes, keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class DropPath(nn.Module):
    """Stochastic depth: randomly drop the residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        fb = fold_batch()
        if fb is not None and x.ndim == 4:
            fd = x.shape[0] // fb
            mask = jax.random.bernoulli(rng, keep, (fb,))
            mask = jnp.repeat(mask, fd, axis=0).reshape((x.shape[0],) + (1,) * (x.ndim - 1))
        else:
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class ConvNeXtBlockV1(nn.Module):
    """ConvNeXt V1 block: depthwise 7x7, LN, pointwise MLP with GELU,
    layer-scale, stochastic depth (reference: blocks.py:268)."""

    features: int
    sd_prob: float = 0.0
    layer_scale: float = 1e-6
    k_size: Union[int, Tuple[int, ...]] = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = data_ndim(x)
        h = Conv(
            self.features, kernel_size=_expand(self.k_size, ndim), padding="SAME",
            feature_group_count=self.features, kernel_init=KERNEL_INIT,
        )(x)
        h = nn.LayerNorm(epsilon=1e-6)(h)
        h = nn.Dense(4 * self.features, kernel_init=KERNEL_INIT)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.features, kernel_init=KERNEL_INIT)(h)
        gamma = self.param("layer_scale", nn.initializers.constant(self.layer_scale), (self.features,))
        h = gamma * h
        return x + DropPath(self.sd_prob)(h, train)


class ConvNeXtBlockV2(nn.Module):
    """ConvNeXt V2 block: GRN replaces layer-scale (reference: blocks.py:423)."""

    features: int
    sd_prob: float = 0.0
    k_size: Union[int, Tuple[int, ...]] = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = data_ndim(x)
        h = Conv(
            self.features, kernel_size=_expand(self.k_size, ndim), padding="SAME",
            feature_group_count=self.features, kernel_init=KERNEL_INIT,
        )(x)
        h = nn.LayerNorm(epsilon=1e-6)(h)
        h = nn.Dense(4 * self.features, kernel_init=KERNEL_INIT)(h)
        h = nn.gelu(h)
        h = GRN()(h)
        h = nn.Dense(self.features, kernel_init=KERNEL_INIT)(h)
        return x + DropPath(self.sd_prob)(h, train)


class ProjectionHead(nn.Module):
    """Pixel embedding projection head for contrastive loss
    (reference: models/heads.py ProjectionHead)."""

    proj_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = data_ndim(x)
        one = (1,) * ndim
        in_ch = x.shape[-1]
        h = Conv(in_ch, kernel_size=one, kernel_init=KERNEL_INIT)(x)
        # reference convmlp head interposes SyncBatchNorm before the ReLU
        # (heads.py:202-207); flax BN is sync by construction under GSPMD
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(self.proj_dim, kernel_size=one, kernel_init=KERNEL_INIT)(h)
        norm = jnp.linalg.norm(h, axis=-1, keepdims=True)
        return h / jnp.maximum(norm, 1e-8)


def _pool_reshape(x, window, folded: bool = False):
    """(b, *sp, c) -> (b, s0/w0, w0, s1/w1, w1, ..., c) + the window axes.

    ``folded``: x is a z-folded (b*d, y, x, c) tensor and window[0] pools
    the row axis (exact: rows are grouped per image and d % w0 == 0)."""
    if folded:
        shape = [x.shape[0] // window[0], window[0]]
        for s, k in zip(x.shape[1:-1], window[1:]):
            shape += [s // k, k]
        shape.append(x.shape[-1])
        axes = tuple(range(1, 2 * len(window), 2))
        return x.reshape(shape), axes
    sp = x.shape[1:-1]
    shape = [x.shape[0]]
    for s, k in zip(sp, window):
        shape += [s // k, k]
    shape.append(x.shape[-1])
    axes = tuple(range(2, 2 + 2 * len(sp), 2))
    return x.reshape(shape), axes


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_exact(x, w, folded=False):
    xr, axes = _pool_reshape(x, w, folded)
    return xr.max(axis=axes)


def _max_pool_exact_fwd(x, w, folded=False):
    y = _max_pool_exact(x, w, folded)
    return y, (x, y)


def _max_pool_exact_bwd(w, folded, res, g):
    if os.environ.get("BIAPY_TPU_POOL_BWD", "repeat4d") == "repeat4d":
        # DEFAULT (r5 A/B on v5e: 11.45 -> 12.16 it/s on the bench train
        # step; dx bit-identical to the 6D form — same eq-mask comparisons,
        # only the upsampling formulation differs): per-axis jnp.repeat in
        # the ORIGINAL rank instead of the 6D reshape/broadcast, avoiding
        # the strided access the 6D form lowers to (tools/roofline.py).
        # BIAPY_TPU_POOL_BWD=6d forces the old formulation.
        x, y = res
        yu, gu = y, g
        for i, k in enumerate(w):
            ax = i if folded else i + 1
            if k > 1:
                yu = jnp.repeat(yu, k, axis=ax)
                gu = jnp.repeat(gu, k, axis=ax)
        dx = jnp.where(x == yu, gu, jnp.zeros((), g.dtype))
        return (dx,)
    # Route the gradient to every max position WITHOUT the tie-splitting
    # normalization jax's default max-vjp emits (an extra full-size
    # reduce_sum + div per pool, ~5 ms/step on the 128^3 bench profile).
    # Torch's MaxPool backward routes to a single argmax; ties between
    # continuous conv outputs are measure-zero, so the eq-mask is the same
    # gradient in practice at half the HBM traffic.
    # ASSUMPTION (ReLU-like activations only): post-ReLU all-zero windows tie
    # at 0 and each tied slot receives the FULL cotangent (amplified by the
    # tie count) — harmless there because ReLU's own backward zeroes those
    # contributions. If a linear/ELU path ever precedes this pool, divide dx
    # by the per-window tie count before shipping it.
    x, y = res
    xr, axes = _pool_reshape(x, w, folded)
    yb = jnp.expand_dims(y, axes)
    gb = jnp.expand_dims(g, axes)
    dx = jnp.where(xr == yb, gb, jnp.zeros((), g.dtype)).reshape(x.shape)
    return (dx,)


_max_pool_exact.defvjp(_max_pool_exact_fwd, _max_pool_exact_bwd)


def _pool_fold_state(x, window):
    """(window, folded, divisible) after folding adjustments."""
    w = tuple(window)
    fb = fold_batch()
    if fb is not None and x.ndim == 4 and len(w) == 3:
        d = x.shape[0] // fb
        ok = (d % w[0] == 0
              and all(s % k == 0 for s, k in zip(x.shape[1:-1], w[1:])))
        return w, True, ok
    return w, False, all(s % k == 0 for s, k in zip(x.shape[1:-1], w))


def _max_pool_strided(x, w):
    """Window max as an elementwise max tree over strided slices (stride ==
    window; works folded (rows,...,c) or batched (b,...,c)). Backward =
    window-count-smaller selects + strided pads, avoiding the full-size 6D
    eq/broadcast of the reshape formulation. Folded rows stay within one
    image because d % wz == 0 makes image boundaries window-aligned."""
    import itertools

    lead = x.ndim - len(w) - 1  # 0 when folded, 1 with an explicit batch dim
    out = None
    for off in itertools.product(*[range(k) for k in w]):
        start = (0,) * lead + tuple(off) + (0,)
        strides = (1,) * lead + tuple(w) + (1,)
        s = jax.lax.slice(x, start, x.shape, strides)
        out = s if out is None else jnp.maximum(out, s)
    return out


def max_pool(x, window: Sequence[int]):
    """Max pooling with stride == window (reference: MaxPool2d/3d usage).

    Non-overlapping windows pool by reshape+reduce instead of
    lax.reduce_window: the forward is identical, but reduce_window's
    backward lowers to XLA SelectAndScatter, which serializes on TPU; the
    reshaped max carries a custom vjp (eq-mask broadcast, no tie-split)."""
    w, folded, ok = _pool_fold_state(x, window)
    if folded:
        if ok:
            if (jax.default_backend() not in ("cpu", "gpu")
                    and os.environ.get("BIAPY_TPU_PALLAS_POOL", "") == "1"):
                # opt-in: the Pallas pool fwd compiles, but its eq-mask
                # backward needs a sublane upsample Mosaic rejects at
                # c < 128 lanes; the XLA custom-vjp path below stays the
                # default until that backward lands
                from biapy_tpu.ops.pallas.shuffle import (pool_max_folded,
                                                          shuffle_enabled)

                if shuffle_enabled():
                    return pool_max_folded(x, w)
            if (jax.default_backend() not in ("cpu", "gpu")
                    and os.environ.get("BIAPY_TPU_POOL", "") == "strided"):
                # opt-in: measured SLOWER in the full train step (9.3 vs
                # 11.6 it/s) — the strided-pad backwards lose to the
                # reshape custom-vjp despite a faster standalone fwd+bwd
                return _max_pool_strided(x, w)
            return _max_pool_exact(x, w, True)
        d = x.shape[0] // fold_batch()
        return refold4d(max_pool_5d(unfold5d(x, d), w))
    if ok:
        return _max_pool_exact(x, w, False)
    return max_pool_5d(x, w)


def max_pool_5d(x, w):
    if all(s % k == 0 for s, k in zip(x.shape[1:-1], w)):
        return _max_pool_exact(x, w, False)
    ww = (1,) + tuple(w) + (1,)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, ww, ww, "VALID")


def avg_pool(x, window: Sequence[int]):
    import math

    w, folded, ok = _pool_fold_state(x, window)
    if folded and not ok:
        return refold4d(avg_pool(unfold5d(x, x.shape[0] // fold_batch()), w))
    if ok:
        xr, axes = _pool_reshape(x, w, folded)
        return xr.mean(axis=axes)
    ww = (1,) + w + (1,)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, ww, ww, "VALID")
    return summed / float(math.prod(window))


def get_decoder_feature_maps(feature_maps, num_decoders: int, divide: bool):
    """Per-decoder feature maps when separated decoders are enabled
    (reference: blocks.py get_decoder_feature_maps)."""
    if num_decoders <= 1 or not divide:
        return list(feature_maps)
    return [max(1, f // num_decoders) for f in feature_maps]
