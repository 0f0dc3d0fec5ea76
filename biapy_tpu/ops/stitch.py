"""On-device sliding-window inference with spline-blend stitching.

Reference analog: the per-patch CPU loop in predict_batches_in_test +
merge_data_with_overlap (biapy/engine/base_workflow.py:1598,
biapy/data/data_2D_manipulation.py:366). The reference round-trips every
patch host<->GPU and stitches in NumPy; here the WHOLE volume lives in HBM
and one jitted program scans the (static) patch grid: dynamic-slice a patch
batch, run the model forward, multiply by the spline window, and fold the
blended cores into the output. Host transfers: one volume in, one stitched
result out.

TPU-first accumulation (round 3): a read-modify-write
``dynamic_update_slice`` of the full output per patch serializes the whole
scan behind HBM copies (measured 52% of slab time on v5e). Instead the scan
writes each windowed core into a disjoint row of a per-patch buffer (an
aligned, in-place carry update that overlaps the convs), and a static
overlap-add epilogue folds the rows: for a regular grid every core chunk of
``step`` voxels lands at ``(i + j) * step``, so chunk j across all patches
is ONE reshape/transpose placed with ONE static-slice add — prod(m) tensor
adds total (m = ceil(core/step) per axis), zero when overlap is 0 (a pure
reshape). The blend divisor never needs accumulating at all: the spline
window is separable and the grid is a cross product, so the per-voxel weight
sum is an outer product of per-axis host-computed vectors, baked in as three
1-D constants.

``pre_padded`` skips the on-device halo pad for callers whose block already
carries the halo (by-chunks tiles, z-slabs): re-padding an already-extended
block makes the grid cover halo voxels with full extra patch rows —
(k+1)^nd patches where k^nd suffice (the reference pays exactly this,
data_3D_manipulation.py:683; here it is opt-out).

The patch grid math is identical to biapy_tpu.data.patching (bit-exact with
the reference), so device stitching == host stitching up to float eps.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from biapy_tpu.data.patching import axis_grid, spline_window, spline_window_1d

# per-patch core buffer cap for the fold path (bytes); grids whose buffer
# would exceed it fall back to the in-place accumulation path
_FOLD_BYTES_CAP = 2 << 30
# unrolled chunk-add cap: prod(ceil(core/step)) static adds in the epilogue
_FOLD_CHUNKS_CAP = 64


def _force_path() -> Optional[str]:
    """BIAPY_TPU_STITCH=fold|accum forces a strategy (A/B benchmarking)."""
    import os

    v = os.environ.get("BIAPY_TPU_STITCH", "")
    return v if v in ("fold", "accum") else None


def _grid_starts(spatial, patch, overlap, padding) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """All patch start coordinates in PADDED volume space (static, host)."""
    nd = len(spatial)
    grids = [axis_grid(spatial[d], patch[d], overlap[d], padding[d]) for d in range(nd)]
    axes = [np.array([g.start(i) for i in range(g.n)], np.int32) for g in grids]
    mesh = np.meshgrid(*axes, indexing="ij")
    starts = np.stack([m.reshape(-1) for m in mesh], axis=-1)  # (npatches, nd)
    ov_px = tuple(g.ov_px for g in grids)
    return starts, ov_px


def _axis_weight_sums(grids, core) -> list:
    """Per-axis blend divisor: ws_d[p] = sum_i w1d_d(p - start_i). The N-D
    weight sum is the outer product of these (separable window x cross-
    product grid), so no on-device weight accumulation is needed."""
    out = []
    for d, g in enumerate(grids):
        w1 = spline_window_1d(core[d], g.ov_px)
        ws = np.zeros(g.length, np.float64)
        for i in range(g.n):
            s = g.start(i)
            ws[s:s + core[d]] += w1
        out.append(np.maximum(ws, 1e-18).astype(np.float32))
    return out


def sliding_window_inference(
    apply_fn: Callable,
    variables,
    volume: jnp.ndarray,
    patch: Sequence[int],
    overlap: Sequence[float],
    padding: Sequence[int],
    out_channels: int,
    batch_size: int = 1,
    out_dtype=jnp.float32,
    compute_dtype=None,
    pad_mode: str = "reflect",
    out_splits: Optional[Sequence[Tuple[int, int]]] = None,
    pre_padded=False,
    grid_overrides: Optional[dict] = None,
    quant_uint8: bool = False,
):
    """Stitched prediction for one channels-last volume (spatial..., C).

    ``apply_fn(variables, x)`` maps a (B, *patch, C) batch to (B, *patch,
    out_channels) activated predictions. Returns (spatial..., out_channels).

    ``out_splits``: optional static list of (z0, z1) bounds in output space;
    the program then returns a TUPLE of out[z0:z1] chunks as separate device
    buffers. Callers draining over a bandwidth-capped transport pull the
    chunks from concurrent threads — and because the split happens INSIDE
    this program, no follow-up device slice gets queued behind later slabs'
    compute (a post-hoc slice would serialize D2H after the whole queue).

    ``pre_padded``: bool or per-axis sequence of bools. A True axis means
    the input volume ALREADY carries ``padding[d]`` voxels of real halo per
    side there (z-slab callers carry real z context from the neighbouring
    slabs); the patch grid covers only that axis's core region and the
    returned array has the core extent. Re-padding an already-extended
    block would make the grid cover halo voxels with full extra patch rows
    — (k+1) rows where k suffice (the bench slab geometry paid exactly
    this: 2 z-rows where 1 covers the slab core).
    """
    nd = len(patch)
    if pad_mode == "median":
        # DATA.TEST.MEDIAN_PADDING: fill borders with the volume median
        # (jnp.pad has no median mode; constant with the traced median)
        med = jnp.median(volume)
        pad_kw = dict(mode="constant", constant_values=med)
    else:
        pad_kw = dict(mode=pad_mode)

    pp = (tuple(bool(v) for v in pre_padded) if isinstance(pre_padded, (tuple, list))
          else (bool(pre_padded),) * nd)
    min_core = tuple(patch[d] - 2 * padding[d] for d in range(nd))
    orig_spatial = tuple(volume.shape[d] - (2 * padding[d] if pp[d] else 0)
                         for d in range(nd))
    if any(s <= 0 for s in orig_spatial):
        raise ValueError(
            f"pre_padded volume {volume.shape[:nd]} smaller than twice the "
            f"padding {padding}")
    # reflect-pad axes shorter than the effective patch core so any volume
    # can be processed (the crop is undone on return) — the device analog of
    # DATA.REFLECT_TO_COMPLETE_SHAPE (pad_to_shape, data_manipulation.py:3126)
    deficits = [max(0, min_core[d] - orig_spatial[d]) for d in range(nd)]
    if any(deficits):
        # a deficit on a pre_padded axis reflect-extends OUTSIDE the real
        # halo: the halo shifts inward with the core, the grid covers the
        # extended core, and the same crop recovers the real core (e.g. the
        # bench's tail z-slab: core 40 + 2x10 real halo, patch core 108)
        pw = [(d // 2, d - d // 2) for d in deficits] + [(0, 0)]
        volume = jnp.pad(volume, pw, **pad_kw)
    spatial = tuple(volume.shape[d] - (2 * padding[d] if pp[d] else 0)
                    for d in range(nd))
    pad_width = [((0, 0) if pp[d] else (padding[d], padding[d]))
                 for d in range(nd)] + [(0, 0)]
    vol_p = (jnp.pad(volume, pad_width, **pad_kw)
             if any(w != (0, 0) for w in pad_width) else volume)
    if compute_dtype is not None:
        vol_p = vol_p.astype(compute_dtype)

    grids = [axis_grid(spatial[d], patch[d], overlap[d], padding[d]) for d in range(nd)]
    if grid_overrides:
        # multi-chip slabbing: a slab must reproduce the WHOLE volume's grid
        # geometry on its axis (same step / shift / window), not the grid a
        # standalone volume of the slab's extent would get — axis_grid
        # redistributes trailing shift by n, so the two differ
        # (base_workflow._predict_block_multichip builds these)
        from biapy_tpu.data.patching import AxisGrid

        for d, (n_, step_, last_, ovpx_) in grid_overrides.items():
            grids[d] = AxisGrid(n=n_, step=step_, last_shift=last_,
                                patch=patch[d], pad=padding[d],
                                length=spatial[d], ov_px=ovpx_)
    axes_starts = [np.array([g.start(i) for i in range(g.n)], np.int32) for g in grids]
    mesh_ = np.meshgrid(*axes_starts, indexing="ij")
    starts_np = np.stack([m.reshape(-1) for m in mesh_], axis=-1)
    ns = tuple(g.n for g in grids)
    ov_px = tuple(g.ov_px for g in grids)
    n = len(starts_np)
    # pad the patch list to a batch multiple. Duplicates must contribute
    # NOTHING: in an overlap band shared with a neighbor, a duplicate would
    # over-weight the repeated patch ((k*w*y + w'*y_nb)/(k*w + w') != the
    # true blend), so each patch carries a validity weight zeroed for pads.
    n_pad = (-n) % batch_size
    valid_np = np.ones(n + n_pad, np.float32)
    if n_pad:
        starts_np = np.concatenate([starts_np, np.repeat(starts_np[-1:], n_pad, axis=0)])
        valid_np[n:] = 0.0
    starts = jnp.asarray(starts_np.reshape(-1, batch_size, nd))
    valid = jnp.asarray(valid_np.reshape(-1, batch_size))

    core = tuple(patch[d] - 2 * padding[d] for d in range(nd))
    window_np = spline_window(core, ov_px)  # (*core, 1)
    flat_window = bool(np.all(window_np == 1.0))
    core_sl = tuple(slice(padding[d], patch[d] - padding[d]) for d in range(nd))

    out_shape = spatial + (out_channels,)

    # ---- strategy: overlap-add fold vs in-place accumulate ----------------
    steps = tuple(core[d] if grids[d].n == 1 else grids[d].step for d in range(nd))
    regular = all(g.n == 1 or g.last_shift == 0 for g in grids)
    m = tuple(1 if grids[d].n == 1 else -(-core[d] // max(1, steps[d])) for d in range(nd))
    ys_bytes = (n + n_pad) * int(np.prod(core)) * out_channels * np.dtype(out_dtype).itemsize
    use_fold = (regular and int(np.prod(m)) <= _FOLD_CHUNKS_CAP
                and ys_bytes <= _FOLD_BYTES_CAP)
    forced = _force_path()
    if forced is not None:
        use_fold = forced == "fold" and regular

    if use_fold:
        wsums = _axis_weight_sums(grids, core)
        inv_axis = [jnp.asarray(1.0 / w) for w in wsums]
        flat_weights = all(np.allclose(w, 1.0) for w in wsums)
        run = _make_fold_runner(
            apply_fn, nd, patch, core, core_sl, ns, steps, m, spatial,
            out_channels, batch_size, out_dtype, window_np, flat_window,
            flat_weights, inv_axis, starts, valid, n,
        )
    else:
        run = _make_accumulate_runner(
            apply_fn, nd, patch, core, core_sl, spatial, out_shape,
            out_channels, batch_size, out_dtype, window_np, starts, valid,
        )

    out = run(variables, vol_p)
    if any(deficits):
        sl = tuple(slice(d // 2, d // 2 + s) for d, s in zip(deficits, orig_spatial))
        out = out[sl]
    if quant_uint8:
        # opt-in quantized drain (TEST.OUTPUT_QUANT_UINT8): probability maps
        # ship as round(p*255) uint8 — half the bytes of the bf16 the
        # reference's REDUCE_MEMORY float16 storage implies, quantization
        # error <= 1/510. Fuses into the stitch epilogue.
        out = jnp.round(jnp.clip(out.astype(jnp.float32), 0.0, 1.0) * 255.0
                        ).astype(jnp.uint8)
    if out_splits is not None:
        return tuple(out[z0:z1] for z0, z1 in out_splits)
    return out


def _make_fold_runner(apply_fn, nd, patch, core, core_sl, ns, steps, m,
                      spatial, out_channels, batch_size, out_dtype,
                      window_np, flat_window, flat_weights, inv_axis,
                      starts, valid, n_real):
    """Scan writes windowed cores into disjoint rows of a per-patch buffer;
    a static overlap-add epilogue folds them (see module docstring)."""
    window = jnp.asarray(window_np, jnp.float32)
    n_total = starts.shape[0] * starts.shape[1]

    @partial(jax.jit, donate_argnums=())
    def run(variables, vol_p):
        ys = jnp.zeros((n_total,) + core + (out_channels,), out_dtype)

        def body(ys, xs):
            ib, batch_starts, batch_valid = xs

            def get_patch(st):
                idx = tuple(st[d] for d in range(nd)) + (0,)
                return jax.lax.dynamic_slice(vol_p, idx, tuple(patch) + (vol_p.shape[-1],))

            x = jax.vmap(get_patch)(batch_starts)
            y = apply_fn(variables, x).astype(jnp.float32)
            y_core = y[(slice(None),) + core_sl]
            if not flat_window:
                y_core = y_core * window
            vshape = (batch_size,) + (1,) * (nd + 1)
            y_core = y_core * batch_valid.reshape(vshape)
            idx = (ib * batch_size,) + (0,) * (nd + 1)
            ys = jax.lax.dynamic_update_slice(ys, y_core.astype(out_dtype), idx)
            return ys, None

        ib = jnp.arange(starts.shape[0], dtype=jnp.int32)
        ys, _ = jax.lax.scan(body, ys, (ib, starts, valid))

        # ---- overlap-add fold (all static shapes/indices) -----------------
        ysr = ys[:n_real].reshape(ns + core + (out_channels,))
        # interleave (n_0, s_0, n_1, s_1, ...) then flatten per axis
        perm = []
        for d in range(nd):
            perm += [d, nd + d]
        perm.append(2 * nd)
        if all(v == 1 for v in m):
            # exact partition: the fold is a pure transpose/reshape
            block = ysr.transpose(perm).reshape(
                tuple(ns[d] * core[d] for d in range(nd)) + (out_channels,))
            out = block[tuple(slice(0, spatial[d]) for d in range(nd))]
            out = out.astype(jnp.float32)
        else:
            # pad cores to m*step so every chunk reshapes uniformly
            padw = [(0, 0)] * nd + [(0, m[d] * steps[d] - core[d]) for d in range(nd)] + [(0, 0)]
            ysp = ysr.astype(jnp.float32)
            if any(p != (0, 0) for p in padw):
                ysp = jnp.pad(ysp, padw)
            ext = tuple((ns[d] - 1 + m[d]) * steps[d] for d in range(nd))
            acc = jnp.zeros(ext + (out_channels,), jnp.float32)
            import itertools

            for combo in itertools.product(*(range(md) for md in m)):
                sl = tuple(slice(None) for _ in range(nd)) + tuple(
                    slice(combo[d] * steps[d], (combo[d] + 1) * steps[d]) for d in range(nd)
                ) + (slice(None),)
                block = ysp[sl].transpose(perm).reshape(
                    tuple(ns[d] * steps[d] for d in range(nd)) + (out_channels,))
                dst = tuple(slice(combo[d] * steps[d],
                                  combo[d] * steps[d] + ns[d] * steps[d])
                            for d in range(nd))
                acc = acc.at[dst].add(block)
            out = acc[tuple(slice(0, spatial[d]) for d in range(nd))]
        if not flat_weights:
            for d in range(nd):
                shape = [1] * (nd + 1)
                shape[d] = spatial[d]
                out = out * inv_axis[d].reshape(shape)
        return out.astype(out_dtype)

    return run


def _make_accumulate_runner(apply_fn, nd, patch, core, core_sl, spatial,
                            out_shape, out_channels, batch_size, out_dtype,
                            window_np, starts, valid):
    """Fallback for irregular grids / oversized fold buffers: in-place
    read-modify-write accumulation into full-volume sum/weight buffers."""
    window = jnp.asarray(window_np, out_dtype)
    validf = valid.astype(out_dtype)

    @partial(jax.jit, donate_argnums=())
    def run(variables, vol_p):
        acc = jnp.zeros(out_shape, out_dtype)
        wacc = jnp.zeros(spatial + (1,), out_dtype)
        core_sizes = core

        def body(carry, xs):
            batch_starts, batch_valid = xs
            acc, wacc = carry

            def get_patch(st):
                idx = tuple(st[d] for d in range(nd)) + (0,)
                return jax.lax.dynamic_slice(vol_p, idx, tuple(patch) + (vol_p.shape[-1],))

            x = jax.vmap(get_patch)(batch_starts)
            y = apply_fn(variables, x).astype(out_dtype)
            y_core = y[(slice(None),) + core_sl] * window

            def upd(i, c):
                acc, wacc = c
                st = batch_starts[i]
                v = batch_valid[i]
                idx = tuple(st[d] for d in range(nd)) + (0,)
                cur = jax.lax.dynamic_slice(acc, idx, core_sizes + (out_channels,))
                acc = jax.lax.dynamic_update_slice(acc, cur + y_core[i] * v, idx)
                curw = jax.lax.dynamic_slice(wacc, idx, core_sizes + (1,))
                wacc = jax.lax.dynamic_update_slice(wacc, curw + window * v, idx)
                return acc, wacc

            acc, wacc = jax.lax.fori_loop(0, batch_size, upd, (acc, wacc))
            return (acc, wacc), None

        (acc, wacc), _ = jax.lax.scan(body, (acc, wacc), (starts, validf))
        return acc / (wacc + 1e-18)

    return run
