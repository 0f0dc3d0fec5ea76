"""EmbedSeg: spatial embedding instance segmentation.

Reference analog: biapy/engine/metrics.py SpatialEmbLoss:2375 (+
lovasz_hinge:2300) and biapy/data/post_processing/embedseg.py:21 (seed-driven
clustering); Neven et al. 2019 / Lalit et al. 2022.

Model heads (channel codes E_offset / E_sigma / E_seediness): per-pixel
offset vectors o(x) (tanh), per-pixel sigmas, and a seediness map. The
embedding of pixel x is e(x) = x/S + o(x) in normalized coords; an instance
is the set of pixels whose gaussian membership
phi_k(x) = exp(-||e(x) - c_k||^2 / (2 sigma_k^2)) exceeds 0.5 around a seed.

Loss (jit, fixed MAX_INSTANCES): per instance, lovasz-hinge on the
membership logits vs the instance mask; sigma smoothness; seediness
regression to phi on foreground and 0 on background.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. sorted errors
    (reference: lovasz_hinge helpers, metrics.py:2300)."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-8)
    jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_hinge_flat(logits: jnp.ndarray, labels: jnp.ndarray,
                      valid: jnp.ndarray) -> jnp.ndarray:
    """Binary lovasz hinge over flat pixels, masked by ``valid``."""
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    errors = jnp.where(valid, errors, -jnp.inf)
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    labels_sorted = jnp.where(valid[order], labels[order], 0.0)
    grad = lovasz_grad(labels_sorted)
    relu_err = jnp.where(jnp.isfinite(errors_sorted), jax.nn.relu(errors_sorted), 0.0)
    return jnp.sum(relu_err * grad)


def _coord_grid(spatial) -> jnp.ndarray:
    """Normalized pixel coordinates in [0, 1], (spatial..., nd)."""
    axes = [jnp.linspace(0, 1, s) for s in spatial]
    return jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)


def spatial_emb_loss(
    pred: jnp.ndarray,
    instance_labels: jnp.ndarray,
    nd: int,
    max_instances: int = 32,
    w_inst: float = 1.0,
    w_var: float = 10.0,
    w_seed: float = 1.0,
) -> jnp.ndarray:
    """EmbedSeg loss (reference: SpatialEmbLoss, metrics.py:2375).

    ``pred``: (..., 2*nd + 1) = offsets (tanh'd), sigmas (raw), seediness
    logit. ``instance_labels``: (...,) int map (0 = background).
    """
    spatial = pred.shape[:-1]
    offsets = jnp.tanh(pred[..., :nd])
    sigmas = jnp.exp(pred[..., nd : 2 * nd] * 10.0)
    seed_logit = pred[..., 2 * nd]
    coords = _coord_grid(spatial)
    emb = coords + offsets  # (spatial..., nd)

    flat_emb = emb.reshape(-1, nd)
    flat_sig = sigmas.reshape(-1, nd)
    flat_lab = instance_labels.reshape(-1).astype(jnp.int32)
    flat_seed = seed_logit.reshape(-1)
    n_pix = flat_lab.shape[0]

    seed_target = jnp.zeros(n_pix)
    total_inst = 0.0
    total_var = 0.0

    def per_instance(k, carry):
        total_inst, total_var, seed_target = carry
        m = (flat_lab == k).astype(jnp.float32)
        cnt = jnp.sum(m)
        present = cnt > 0
        center = jnp.sum(flat_emb * m[:, None], axis=0) / jnp.maximum(cnt, 1.0)
        s_k = jnp.sum(flat_sig * m[:, None], axis=0) / jnp.maximum(cnt, 1.0)
        # sigma smoothness within the instance
        var = jnp.sum(jnp.sum((flat_sig - s_k) ** 2, axis=-1) * m) / jnp.maximum(cnt, 1.0)
        dist2 = jnp.sum((flat_emb - center) ** 2 / jnp.maximum(2 * s_k**2, 1e-8), axis=-1)
        phi = jnp.exp(-dist2)
        logits = 2.0 * phi - 1.0  # membership logit in [-1, 1]
        inst = lovasz_hinge_flat(logits, m, jnp.ones_like(m, bool))
        seed_target = jnp.where(m > 0, phi, seed_target)
        total_inst = total_inst + jnp.where(present, inst, 0.0)
        total_var = total_var + jnp.where(present, var, 0.0)
        return total_inst, total_var, seed_target

    total_inst, total_var, seed_target = jax.lax.fori_loop(
        1, max_instances + 1, per_instance, (total_inst, total_var, seed_target)
    )
    n_inst = jnp.maximum(jnp.max(flat_lab).astype(jnp.float32), 1.0)
    seed_pred = jax.nn.sigmoid(flat_seed)
    seed_loss = jnp.mean((seed_pred - jax.lax.stop_gradient(seed_target)) ** 2)
    return (w_inst * total_inst + w_var * total_var) / n_inst + w_seed * seed_loss


def embedseg_cluster(
    pred: np.ndarray,
    nd: int,
    seed_threshold: float = 0.5,
    min_size: int = 16,
    max_instances: int = 256,
    fg_threshold: float = 0.5,
    min_unclustered_sum: int = 0,
) -> np.ndarray:
    """Seed-driven clustering at inference (reference: embedseg.py:21):
    repeatedly take the highest unclaimed seediness pixel, gather the pixels
    whose gaussian membership around its embedding exceeds 0.5."""
    spatial = pred.shape[:-1]
    offsets = np.tanh(pred[..., :nd])
    sigmas = np.exp(pred[..., nd : 2 * nd] * 10.0)
    seed = 1.0 / (1.0 + np.exp(-pred[..., 2 * nd]))
    axes = [np.linspace(0, 1, s) for s in spatial]
    coords = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    emb = coords + offsets

    labels = np.zeros(spatial, np.int32)
    unclaimed = seed > seed_threshold
    next_id = 0
    for _ in range(max_instances):
        cand = np.argwhere(unclaimed & (labels == 0))
        if len(cand) == 0 or len(cand) < min_unclustered_sum:
            # PROBLEM.INSTANCE_SEG.EMBEDSEG.MIN_UNCLUSTERED_SUM: stop once
            # too few seed pixels remain unexplained
            break
        vals = seed[tuple(cand.T)]
        c = cand[int(np.argmax(vals))]
        center = emb[tuple(c)]
        s = sigmas[tuple(c)]
        dist2 = np.sum((emb - center) ** 2 / np.maximum(2 * s**2, 1e-8), axis=-1)
        member = (np.exp(-dist2) > fg_threshold) & (labels == 0)
        if member.sum() < min_size:
            unclaimed[tuple(c)] = False
            continue
        next_id += 1
        labels[member] = next_id
        unclaimed &= ~member
    return labels
