"""On-device sliding-window inference with spline-blend stitching.

Reference analog: the per-patch CPU loop in predict_batches_in_test +
merge_data_with_overlap (biapy/engine/base_workflow.py:1598,
biapy/data/data_2D_manipulation.py:366). The reference round-trips every
patch host<->GPU and stitches in NumPy; here the WHOLE volume lives in HBM
and one jitted program scans the (static) patch grid: dynamic-slice a patch
batch, run the model forward, multiply by the spline window, and
dynamic-update-slice accumulate into output and weight buffers. Host
transfers: one volume in, one stitched result out.

The patch grid math is identical to biapy_tpu.data.patching (bit-exact with
the reference), so device stitching == host stitching up to float eps.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from biapy_tpu.data.patching import axis_grid, spline_window


def _grid_starts(spatial, patch, overlap, padding) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """All patch start coordinates in PADDED volume space (static, host)."""
    nd = len(spatial)
    grids = [axis_grid(spatial[d], patch[d], overlap[d], padding[d]) for d in range(nd)]
    axes = [np.array([g.start(i) for i in range(g.n)], np.int32) for g in grids]
    mesh = np.meshgrid(*axes, indexing="ij")
    starts = np.stack([m.reshape(-1) for m in mesh], axis=-1)  # (npatches, nd)
    ov_px = tuple(g.ov_px for g in grids)
    return starts, ov_px


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
    """
    nd = len(patch)
    if pad_mode == "median":
        # DATA.TEST.MEDIAN_PADDING: fill borders with the volume median
        # (jnp.pad has no median mode; constant with the traced median)
        med = jnp.median(volume)
        pad_kw = dict(mode="constant", constant_values=med)
    else:
        pad_kw = dict(mode=pad_mode)
    orig_spatial = volume.shape[:nd]
    # reflect-pad axes shorter than the effective patch core so any volume
    # can be processed (the crop is undone on return) — the device analog of
    # DATA.REFLECT_TO_COMPLETE_SHAPE (pad_to_shape, data_manipulation.py:3126)
    min_sz = tuple(patch[d] - 2 * padding[d] for d in range(nd))
    deficits = [max(0, min_sz[d] - orig_spatial[d]) for d in range(nd)]
    if any(deficits):
        pw = [(d // 2, d - d // 2) for d in deficits] + [(0, 0)]
        volume = jnp.pad(volume, pw, **pad_kw)
    spatial = volume.shape[:nd]
    starts_np, ov_px = _grid_starts(spatial, patch, overlap, padding)
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
    valid = jnp.asarray(valid_np.reshape(-1, batch_size), out_dtype)

    core = tuple(patch[d] - 2 * padding[d] for d in range(nd))
    window_np = spline_window(core, ov_px)  # (*core, 1)
    window = jnp.asarray(window_np, out_dtype)

    pad_width = [(padding[d], padding[d]) for d in range(nd)] + [(0, 0)]
    vol_p = jnp.pad(volume, pad_width, **pad_kw)
    if compute_dtype is not None:
        vol_p = vol_p.astype(compute_dtype)

    out_shape = spatial + (out_channels,)

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
            # strip padding to the core region
            core_sl = tuple(slice(padding[d], patch[d] - padding[d]) for d in range(nd))
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

        (acc, wacc), _ = jax.lax.scan(body, (acc, wacc), (starts, valid))
        out = acc / (wacc + 1e-18)
        if any(deficits):
            sl = tuple(slice(d // 2, d // 2 + s) for d, s in zip(deficits, orig_spatial))
            out = out[sl]
        if out_splits is not None:
            return tuple(out[z0:z1] for z0, z1 in out_splits)
        return out

    return run(variables, vol_p)
