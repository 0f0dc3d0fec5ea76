"""Cellpose-style flow integration, on device.

Reference analog: biapy/data/post_processing/gradient_tracking.py
(flow Euler integration :610, omnipose suppressed stepping :677) — the
reference integrates per-pixel trajectories in numpy/numba; here the whole
pixel grid integrates in one jitted ``lax.fori_loop`` with bilinear flow
sampling (static shapes, VPU-friendly), and only the final clustering
(density peaks + connected components + assignment) runs on host.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from biapy_tpu.native import connected_components
from scipy import ndimage


def _bilinear_sample(field: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Sample a (spatial..., C) field at fractional positions (..., nd)."""
    nd = pos.shape[-1]
    shape = field.shape[:nd]
    p0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - p0
    out = 0.0
    for corner in range(2**nd):
        w = 1.0
        idx = []
        for d in range(nd):
            bit = (corner >> d) & 1
            c = jnp.clip(p0[..., d] + bit, 0, shape[d] - 1)
            idx.append(c)
            w = w * jnp.where(bit, frac[..., d], 1.0 - frac[..., d])
        out = out + field[tuple(idx)] * w[..., None]
    return out


@partial(jax.jit, static_argnames=("n_iter", "suppressed"))
def follow_flows(flows: jnp.ndarray, n_iter: int = 200, step: float = 1.0,
                 suppressed: bool = False) -> jnp.ndarray:
    """Integrate every pixel along the flow field.

    ``flows``: (spatial..., nd) unit vectors pointing toward instance
    centers. Returns final positions (spatial..., nd). ``suppressed`` uses
    Omnipose's 1/(1+t) damped stepping (reference: omnipose_core.py:222).
    """
    nd = flows.shape[-1]
    spatial = flows.shape[:-1]
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in spatial], indexing="ij")
    pos0 = jnp.stack(grids, axis=-1)

    def body(t, pos):
        v = _bilinear_sample(flows, pos)
        s = step / (1.0 + t) if suppressed else step
        new = pos + s * v
        return jnp.stack(
            [jnp.clip(new[..., d], 0.0, spatial[d] - 1.0) for d in range(nd)], axis=-1
        )

    return jax.lax.fori_loop(0, n_iter, body, pos0)


def flows_to_instances(
    flows: np.ndarray,
    fg_mask: np.ndarray,
    n_iter: int = 200,
    suppressed: bool = False,
    min_size: int = 15,
    flow_error_th: float = 0.0,
) -> np.ndarray:
    """Flow field + foreground mask -> instance labels (reference:
    gradient_tracking.py:610 create_instances_from_flows).

    Pixels integrate to their sinks on device; sinks are clustered by landing
    density (dilated peak regions -> connected components) and every
    foreground pixel takes the label of its landing cluster.
    """
    nd = flows.shape[-1]
    final = np.asarray(follow_flows(jnp.asarray(flows, jnp.float32), n_iter=n_iter,
                                    suppressed=suppressed))
    fg = np.asarray(fg_mask, bool)
    if not fg.any():
        return np.zeros(fg.shape, np.int32)
    landing = np.rint(final).astype(np.int64)
    for d in range(nd):
        np.clip(landing[..., d], 0, fg.shape[d] - 1, out=landing[..., d])
    # landing density over foreground pixels only
    hist = np.zeros(fg.shape, np.int64)
    pts = tuple(landing[..., d][fg] for d in range(nd))
    np.add.at(hist, pts, 1)
    # sinks: high-density cells grown by a 5-iteration 3^nd expansion
    # (reference: gradient_tracking.py cellpose get_masks — "histogram peaks
    # grown with a 5-iteration 3x3 expansion"). Imperfect predicted flows
    # land one cell's pixels in several nearby sub-sinks; the expansion
    # reunites sinks within ~10 px so the cell stays one instance, while
    # distinct cells' sinks (a cell diameter apart) stay separate. Measured
    # on captured under-trained predictions: 2 iterations leaves 5 fragment
    # FPs (f1 0.83), 5 merges all (f1 1.0); a density-masked variant
    # stalls at h<=2 gaps inside the landing cloud and keeps 6 FPs.
    peaks = hist > max(2, int(hist.max() * 0.05)) if hist.max() > 4 else hist > 0
    peaks = ndimage.binary_dilation(peaks, iterations=5)
    seeds, n = connected_components(peaks)
    if n == 0:
        return np.zeros(fg.shape, np.int32)
    labels = np.zeros(fg.shape, np.int32)
    labels[fg] = seeds[pts]
    # drop tiny fragments
    from biapy_tpu.data.post_processing import relabel_sequential, remove_small_instances

    labels = remove_small_instances(labels, min_size)
    # flow-error QC (reference: regenerate flows per mask, drop high-MSE
    # masks — gradient_tracking.py cellpose_flows_to_instances
    # flow_threshold=0.4). The comparison is between UNIT fields: the
    # regenerated flows are unit gradients, and the prediction is normalized
    # per pixel first, so the error measures direction disagreement (a
    # fragment's regenerated flows point at the fragment's own center, far
    # from the predicted cell-center direction) rather than the magnitude
    # underfit every partially-trained network shows.
    if flow_error_th > 0:
        from biapy_tpu.data.pre_processing import cellpose_flows

        regen = cellpose_flows(labels)
        norm = np.linalg.norm(flows, axis=-1, keepdims=True)
        unit = flows / np.maximum(norm, 1e-6)
        for lab in np.unique(labels):
            if lab == 0:
                continue
            m = labels == lab
            err = float(np.mean(np.sum((regen[m] - unit[m]) ** 2, axis=-1)))
            if err > flow_error_th:
                labels[m] = 0
    return relabel_sequential(labels)
