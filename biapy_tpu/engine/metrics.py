"""Losses and metrics, as pure JAX functions.

Reference analog: biapy/engine/metrics.py (jaccard_index:138,
weight_binary_ratio:93, CrossEntropyLoss_wrapper:475, DiceLoss:708,
DiceCELoss:746, detection_loss:571, instance_segmentation_loss:1400,
SSIM family:2109-2246, n2v_loss_mse:2247).

Everything here runs on device under jit: losses take channels-last arrays
(B, ..., C) of logits (activations applied by the engine only at inference,
matching the reference's apply_model_activations contract) and return
scalars; metrics return scalars per batch. No torch, no host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-7


# --------------------------------------------------------------------------
# elementwise losses
# --------------------------------------------------------------------------
def bce_with_logits(logits, targets, weight=None):
    """Numerically-stable binary cross-entropy on logits."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(targets * log_p + (1.0 - targets) * log_not_p)
    if weight is not None:
        loss = loss * weight
    return loss


def softmax_ce_with_logits(logits, labels_int, class_weights=None, ignore_index=None,
                           mask=None):
    """Per-pixel softmax cross-entropy; ``labels_int`` integer class map
    (B, ..., 1) or (B, ...). ``mask`` restricts the loss to foreground
    pixels, normalized by the mask mass (reference: detection_loss masks the
    class CE to the point channel, metrics.py:693-697)."""
    if labels_int.shape[-1] == 1:
        labels_int = labels_int[..., 0]
    labels_int = labels_int.astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nclass = logits.shape[-1]
    safe_labels = jnp.clip(labels_int, 0, nclass - 1)
    picked = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    loss = -picked
    if class_weights is not None:
        w = jnp.asarray(class_weights)[safe_labels]
        loss = loss * w
    valid = None
    if ignore_index is not None:
        valid = (labels_int != ignore_index).astype(loss.dtype)
    if mask is not None:
        m = mask[..., 0] if mask.ndim == loss.ndim + 1 else mask
        m = m.astype(loss.dtype)
        valid = m if valid is None else valid * m
    if valid is not None:
        loss = loss * valid
        return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.mean(loss)


def weight_binary_ratio(target):
    """Per-element weight map balancing foreground/background frequency
    (reference: metrics.py:93). Returns weights with mean ~1."""
    fg = jnp.clip(jnp.mean((target > 0.5).astype(jnp.float32)), EPS, 1 - EPS)
    # weight foreground by (1-fg)/fg when foreground is the minority (and
    # symmetrically otherwise), normalized so that weights >= 1.
    alpha = jnp.where(fg <= 0.5, (1.0 - fg) / fg, fg / (1.0 - fg))
    is_minority_fg = fg <= 0.5
    w_fg = jnp.where(is_minority_fg, alpha, 1.0)
    w_bg = jnp.where(is_minority_fg, 1.0, alpha)
    return jnp.where(target > 0.5, w_fg, w_bg)


# --------------------------------------------------------------------------
# composite losses
# --------------------------------------------------------------------------
def cross_entropy_loss(
    logits,
    targets,
    num_classes: int = 2,
    class_rebalance: str = "none",
    class_weights: Optional[Sequence[float]] = None,
    ignore_index: Optional[int] = None,
):
    """BCE (binary) / softmax CE (multiclass) with optional rebalancing
    (reference: CrossEntropyLoss_wrapper, metrics.py:475)."""
    if isinstance(logits, dict):
        logits = logits["pred"]
    if num_classes <= 2 and logits.shape[-1] == 1:
        weight = None
        if class_rebalance == "auto":
            weight = weight_binary_ratio(targets)
        elif class_rebalance == "manual" and class_weights:
            w_bg, w_fg = class_weights[0], class_weights[-1]
            weight = jnp.where(targets > 0.5, w_fg, w_bg)
        bce = bce_with_logits(logits, targets.astype(logits.dtype), weight)
        if ignore_index is not None:
            # LOSS.IGNORE_INDEX applies on the binary path too — unlabeled
            # pixels must not contribute gradient (reference:
            # CrossEntropyLoss_wrapper ignore_index)
            valid = (targets != ignore_index).astype(bce.dtype)
            return jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return jnp.mean(bce)
    cw = jnp.asarray(class_weights) if (class_rebalance == "manual" and class_weights) else None
    return softmax_ce_with_logits(logits, targets, cw, ignore_index)


def dice_loss(logits, targets, smooth: float = 1e-5, apply_sigmoid: bool = True):
    """Soft Dice over the batch (reference: DiceLoss, metrics.py:708)."""
    p = jax.nn.sigmoid(logits) if apply_sigmoid else logits
    t = targets.astype(p.dtype)
    axes = tuple(range(1, p.ndim))
    inter = jnp.sum(p * t, axis=axes)
    denom = jnp.sum(p, axis=axes) + jnp.sum(t, axis=axes)
    dice = (2.0 * inter + smooth) / (denom + smooth)
    return 1.0 - jnp.mean(dice)


def dice_ce_loss(
    logits, targets, num_classes: int = 2, w_dice: float = 0.5, w_ce: float = 0.5,
    class_rebalance: str = "none", class_weights=None, ignore_index=None,
):
    """Combined Dice + CE (reference: DiceCELoss, metrics.py:746)."""
    if isinstance(logits, dict):
        logits = logits["pred"]
    ce = cross_entropy_loss(logits, targets, num_classes, class_rebalance, class_weights, ignore_index)
    if num_classes > 2 and logits.shape[-1] > 1:
        t1h = jax.nn.one_hot(targets[..., 0].astype(jnp.int32), logits.shape[-1])
        if ignore_index is not None:
            t1h = t1h * (targets[..., :1] != ignore_index)
        d = dice_loss(jax.nn.softmax(logits, axis=-1), t1h, apply_sigmoid=False)
    elif ignore_index is not None:
        # drop ignored pixels from BOTH dice terms (a zeroed target alone
        # would still count the prediction in the denominator)
        valid = (targets != ignore_index).astype(logits.dtype)
        d = dice_loss(jax.nn.sigmoid(logits) * valid, targets * valid,
                      apply_sigmoid=False)
    else:
        d = dice_loss(logits, targets)
    return w_dice * d + w_ce * ce


def masked_mse(pred, target, mask):
    m = mask.astype(pred.dtype)
    return jnp.sum(jnp.square(pred - target) * m) / jnp.maximum(jnp.sum(m), 1.0)


def n2v_loss_mse(pred, target, mask):
    """Noise2Void masked MSE: loss only on manipulated pixels
    (reference: n2v_loss_mse, metrics.py:2247)."""
    return masked_mse(pred, target, mask)


_CHANNEL_LOSS_FNS: Dict[str, Callable] = {}


def _channel_loss(name: str, logits, target, weight=None):
    """One channel's loss by name (bce / mse / l1=mae / ce)."""
    name = name.lower()
    if name in ("bce", "ce_sigmoid"):
        return jnp.mean(bce_with_logits(logits, target, weight))
    if name in ("mse", "l2"):
        err = jnp.square(logits - target)
    elif name in ("mae", "l1"):
        err = jnp.abs(logits - target)
    else:
        raise ValueError(f"Unknown channel loss: {name}")
    if weight is not None:
        # normalize by the weight mass OVER THE BROADCAST error shape so a
        # (..., 1) foreground mask on an nrays-wide channel yields a true
        # mean over rays (reference: metrics.py:1760 "'R' rays is a true
        # mean over rays (matching StarDist)")
        w = jnp.broadcast_to(weight, err.shape)
        return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(err)


def instance_segmentation_loss(
    out_channels: Sequence[str],
    losses_to_use: Sequence[str],
    channel_weights: Sequence[float],
    channels_per_output: Sequence[int],
    mask_distances: Optional[Dict[str, bool]] = None,
    class_rebalance_within_channels: bool = False,
    n_classes: int = 0,
    class_channel_weight: float = 1.0,
):
    """Build the multi-channel instance-seg loss
    (reference: instance_segmentation_loss, metrics.py:1400).

    ``n_classes`` > 0 adds the multi-head classification term: the last
    ``n_classes`` prediction channels are softmax logits scored against the
    class-index map carried as the LAST ground-truth channel (reference:
    DATA.N_CLASSES > 2 multi-head, instance_seg.py:459-465).

    ``out_channels`` e.g. ["F","C","D"]; ``channels_per_output`` gives how
    many prediction channels each representation occupies (e.g. flows take
    2/3). The ground truth is laid out with the same channel structure.
    Regression channels (distances, flows) can be masked to the foreground
    (``mask_distances``), and binary channels can be rebalanced.
    """
    mask_distances = mask_distances or {}

    # 'We': GT carries a U-Net border weight map as its LAST channel; it is
    # never predicted. BCE channels add it to their per-pixel weight
    # (w(x) = w_c(x) + w_border(x), the U-Net paper formula); other losses
    # apply it multiplicatively (reference: metrics.py:1637,1744).
    border_weight = "We" in out_channels
    active = [(ch, ln, w, n) for ch, ln, w, n in
              zip(out_channels, losses_to_use, channel_weights, channels_per_output)
              if ch != "We"]

    def loss_fn(y_pred, y_true):
        cls_pred = None
        if isinstance(y_pred, dict):
            cls_pred = y_pred.get("class")
            y_pred = y_pred["pred"]
        class_term = 0.0
        if n_classes > 0:
            if cls_pred is None:  # flat layout (stitched/TTA-merged arrays)
                cls_pred = y_pred[..., -n_classes:]
                y_pred = y_pred[..., :-n_classes]
            # class map is the very last GT channel (appended after the
            # compiled channels, reference pre_processing.py:549)
            cls_true = y_true[..., -1:]
            y_true = y_true[..., :-1]
            # scored only where an instance exists — the overwhelming
            # background would otherwise drown the term (reference:
            # metrics.py:1783-1787)
            class_term = class_channel_weight * softmax_ce_with_logits(
                cls_pred, cls_true, mask=(cls_true > 0))
        w_borders = None
        if border_weight:
            w_borders = y_true[..., -1:]
            y_true = y_true[..., :-1]
        total = 0.0
        off = 0
        # the F (or first binary) channel index, used as mask for regression
        fg_idx = None
        o = 0
        for ch, _, _, n in active:
            if ch in ("F", "B", "P", "C", "F_pre", "F_post", "F_cleft"):
                fg_idx = o
                break
            o += n
        for ch, lname, w, n in active:
            pred_c = y_pred[..., off : off + n]
            true_c = y_true[..., off : off + n].astype(pred_c.dtype)
            weight = None
            if lname.lower() in ("bce",) and class_rebalance_within_channels:
                weight = weight_binary_ratio(true_c)
            if mask_distances.get(ch, False):
                if fg_idx is not None:
                    fg = (y_true[..., fg_idx : fg_idx + 1] > 0.5).astype(pred_c.dtype)
                else:
                    # no binary channel in the set: fall back to (target != 0)
                    # on the masked channel itself, as the reference does for
                    # 'R' without 'F' (reference config.py:217 uses R > 0)
                    fg = (jnp.abs(true_c) > 0).any(axis=-1, keepdims=True).astype(pred_c.dtype)
                weight = fg if weight is None else weight * fg
            if w_borders is not None:
                wb = w_borders.astype(pred_c.dtype)
                if lname.lower() == "bce":
                    weight = wb if weight is None else weight + wb
                else:
                    weight = wb if weight is None else weight * wb
            total = total + w * _channel_loss(lname, pred_c, true_c, weight)
            off += n
        return total + class_term

    return loss_fn


def detection_loss(
    channel_weights=(1.0,),
    class_rebalance_within_channels: bool = True,
    num_classes: int = 2,
    class_rebalance: str = "none",
    class_weights=None,
):
    """Point-heatmap detection loss: rebalanced BCE on the point channel,
    optional CE on a separated class head (reference: detection_loss,
    metrics.py:571)."""

    def loss_fn(y_pred, y_true):
        cls_pred = None
        if isinstance(y_pred, dict):
            cls_pred = y_pred.get("class")
            y_pred = y_pred["pred"]
        t = y_true[..., :1].astype(y_pred.dtype)
        weight = weight_binary_ratio(t) if class_rebalance_within_channels else None
        loss = channel_weights[0] * jnp.mean(bce_with_logits(y_pred[..., :1], t, weight))
        if cls_pred is not None and num_classes > 2:
            cls_true = y_true[..., 1:2]
            cw = jnp.asarray(class_weights) if (class_rebalance == "manual" and class_weights) else None
            # class CE only where a point blob exists (reference masks the
            # class term to the foreground, metrics.py:693-697)
            loss = loss + (channel_weights[-1] if len(channel_weights) > 1 else 1.0) * softmax_ce_with_logits(
                cls_pred, cls_true, cw, mask=(y_true[..., :1] > 0)
            )
        return loss

    return loss_fn


# --------------------------------------------------------------------------
# image-quality losses / metrics (SR, denoising, I2I, SSL)
# --------------------------------------------------------------------------
def mse_metric(pred, target):
    return jnp.mean(jnp.square(pred - target))


def mae_metric(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def psnr_metric(pred, target, data_range: float = 1.0):
    mse = jnp.mean(jnp.square(pred - target))
    return 20.0 * jnp.log10(data_range) - 10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * jnp.square(x / sigma))
    return g / jnp.sum(g)


def _ssim_filter(img, ndim: int, size: int = 11, sigma: float = 1.5):
    """Separable Gaussian filter over spatial dims of (B, ..., C)."""
    g = _gaussian_kernel1d(size, sigma)
    out = img
    for d in range(1, 1 + ndim):
        pad = [(0, 0)] * out.ndim
        pad[d] = (size // 2, size // 2)
        padded = jnp.pad(out, pad, mode="symmetric")
        out = _conv1d_along_axis(padded, g, d)
    return out


def _conv1d_along_axis(x, kernel1d, axis: int):
    """Depthwise 1-D convolution along ``axis`` via correlation (VALID)."""
    k = kernel1d.shape[0]
    x_moved = jnp.moveaxis(x, axis, -1)
    lead_shape = x_moved.shape[:-1]
    flat = x_moved.reshape(-1, x_moved.shape[-1])
    out = jax.vmap(lambda row: jnp.correlate(row, kernel1d, mode="valid"))(flat)
    return jnp.moveaxis(out.reshape(lead_shape + (out.shape[-1],)), -1, axis)


def ssim_metric(pred, target, data_range: float = 1.0, size: int = 11, sigma: float = 1.5):
    """SSIM over channels-last batches (matches pytorch_msssim defaults used
    by the reference's SSIM losses, metrics.py:2109)."""
    ndim = pred.ndim - 2
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_x = _ssim_filter(pred, ndim, size, sigma)
    mu_y = _ssim_filter(target, ndim, size, sigma)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sx = _ssim_filter(pred * pred, ndim, size, sigma) - mu_x2
    sy = _ssim_filter(target * target, ndim, size, sigma) - mu_y2
    sxy = _ssim_filter(pred * target, ndim, size, sigma) - mu_xy
    ssim_map = ((2 * mu_xy + c1) * (2 * sxy + c2)) / ((mu_x2 + mu_y2 + c1) * (sx + sy + c2))
    return jnp.mean(ssim_map)


def ssim_loss(pred, target, data_range: float = 1.0):
    return 1.0 - ssim_metric(pred, target, data_range)


def w_mae_ssim_loss(pred, target, w_mae: float = 0.5, w_ssim: float = 0.5):
    """Weighted MAE + SSIM (reference: W_MAE_SSIM_loss, metrics.py:2155)."""
    return w_mae * mae_metric(pred, target) + w_ssim * ssim_loss(pred, target)


def w_mse_ssim_loss(pred, target, w_mse: float = 0.5, w_ssim: float = 0.5):
    """Weighted MSE + SSIM (reference: W_MSE_SSIM_loss, metrics.py:2200)."""
    return w_mse * mse_metric(pred, target) + w_ssim * ssim_loss(pred, target)


# --------------------------------------------------------------------------
# segmentation metrics
# --------------------------------------------------------------------------
def jaccard_index(y_pred, y_true, num_classes: int = 2, t: float = 0.5,
                  ignore_index: Optional[int] = None, apply_activation: bool = True):
    """IoU / Jaccard (reference: metrics.py:138). Binary: sigmoid+threshold
    each channel; multiclass: argmax vs integer labels."""
    if isinstance(y_pred, dict):
        y_pred = y_pred["pred"]
    if num_classes > 2 and y_pred.shape[-1] > 1:
        pred_lab = jnp.argmax(y_pred, axis=-1)
        true_lab = y_true[..., 0].astype(jnp.int32) if y_true.shape[-1] == 1 else y_true.astype(jnp.int32)
        valid = jnp.ones_like(true_lab, dtype=bool) if ignore_index is None else (true_lab != ignore_index)
        ious = []
        for c in range(num_classes):
            p = (pred_lab == c) & valid
            g = (true_lab == c) & valid
            inter = jnp.sum(p & g)
            union = jnp.sum(p | g)
            ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1), jnp.nan))
        ious = jnp.stack(ious)
        return jnp.nanmean(ious)
    p = jax.nn.sigmoid(y_pred) if apply_activation else y_pred
    pb = p > t
    gb = y_true > 0.5
    if ignore_index is not None:
        valid = y_true != ignore_index
        pb = pb & valid
        gb = gb & valid
    inter = jnp.sum(pb & gb)
    union = jnp.sum(pb | gb)
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), 1.0)


def accuracy_metric(logits, labels):
    """Top-1 accuracy for classification."""
    pred = jnp.argmax(logits, axis=-1)
    labels = labels.reshape(pred.shape)
    return jnp.mean((pred == labels).astype(jnp.float32))


def top_k_accuracy(logits, labels, k: int = 5):
    k = min(k, logits.shape[-1])
    topk = jax.lax.top_k(logits, k)[1]
    labels = labels.reshape(labels.shape[0], 1)
    return jnp.mean(jnp.any(topk == labels, axis=-1).astype(jnp.float32))


# --------------------------------------------------------------------------
# numpy-side helpers (test-time, host)
# --------------------------------------------------------------------------
def jaccard_index_numpy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Binary IoU on numpy arrays (reference: metrics.py:25)."""
    tp = np.count_nonzero((y_pred > 0.5) & (y_true > 0.5))
    fp = np.count_nonzero((y_pred > 0.5) & (y_true <= 0.5))
    fn = np.count_nonzero((y_pred <= 0.5) & (y_true > 0.5))
    denom = tp + fp + fn
    return 1.0 if denom == 0 else tp / denom


# ---------------------------------------------------------------------------
# Pixel-contrastive learning (reference: ContrastCELoss metrics.py:958,
# PixelContrastLoss :1078, memory-bank updates train_engine.py:130-146).
# JAX-idiomatic: fixed-shape anchor sampling (top-k over random priorities
# instead of variable-class python loops), queues live on device.
# ---------------------------------------------------------------------------


def _labels_to_ids(y, nd: int, spatial_e):
    """Collapse a channels-last target into integer class ids and
    nearest-downsample to the embedding resolution (reference interpolate +
    channel-merge tricks, metrics.py:1393, memory_bank.py:130)."""
    import jax.numpy as jnp

    if y.shape[-1] == 1:
        # one channel = integer class map (0/1 binary or 0..C-1 multiclass);
        # round, don't binarize
        ids = jnp.round(y[..., 0]).astype(jnp.int32)
    else:
        ids = jnp.argmax(y, axis=-1).astype(jnp.int32)
    sp = ids.shape[1 : 1 + nd]
    sl = (slice(None),) + tuple(
        slice(None, None, max(1, sp[d] // max(1, spatial_e[d]))) for d in range(nd))
    ids = ids[sl]
    sl2 = (slice(None),) + tuple(slice(0, spatial_e[d]) for d in range(nd))
    return ids[sl2]


def pixel_contrast_loss(embed, labels_ids, predict_ids, queue, rng,
                        n_classes: int = 2, temperature: float = 0.07,
                        base_temperature: float = 0.07, max_anchors: int = 64):
    """InfoNCE over hard-mined per-class anchors against the class queues.

    ``embed``: (B, *Se, D) projection-head output; ``labels_ids``/
    ``predict_ids``: (B, *Se) int class maps at embed resolution; ``queue``:
    (n_classes, Q, D) normalized memory — positives are same-class entries,
    negatives the rest (reference: _hard_anchor_sampling + _contrastive,
    metrics.py:1124-1322).
    """
    import jax
    import jax.numpy as jnp

    D = embed.shape[-1]
    feats = embed.reshape(-1, D)
    feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)
    lab = labels_ids.reshape(-1)
    prd = predict_ids.reshape(-1)
    n_view = min(max(1, max_anchors // n_classes), feats.shape[0])

    u = jax.random.uniform(rng, lab.shape)

    def sample_class(c):
        is_c = lab == c
        hard = is_c & (prd != c)
        # hard anchors first, then easy, never non-class (reference keeps a
        # half/half split when both are plentiful)
        pri = u + 2.0 * is_c.astype(jnp.float32) + 0.5 * hard.astype(jnp.float32)
        _, idx = jax.lax.top_k(pri, n_view)
        return feats[idx], is_c[idx]

    anchors, valid = jax.vmap(sample_class)(jnp.arange(n_classes))
    anchor_feat = anchors.reshape(n_classes * n_view, D)
    anchor_lab = jnp.repeat(jnp.arange(n_classes), n_view)
    anchor_valid = valid.reshape(-1).astype(jnp.float32)

    Q = queue.shape[1]
    contrast_feat = queue.reshape(n_classes * Q, D)
    contrast_lab = jnp.repeat(jnp.arange(n_classes), Q)

    logits = anchor_feat @ contrast_feat.T / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    pos_mask = (anchor_lab[:, None] == contrast_lab[None, :]).astype(jnp.float32)
    neg_sum = jnp.sum(jnp.exp(logits) * (1 - pos_mask), axis=1, keepdims=True)
    log_prob = logits - jnp.log(jnp.exp(logits) + neg_sum)
    mean_log_prob_pos = jnp.sum(pos_mask * log_prob, axis=1) / jnp.maximum(
        jnp.sum(pos_mask, axis=1), 1.0)
    per_anchor = -(temperature / base_temperature) * mean_log_prob_pos
    denom = jnp.maximum(jnp.sum(anchor_valid), 1.0)
    return jnp.sum(per_anchor * anchor_valid) / denom


def make_contrast_ce_loss(main_loss, nd: int, n_classes: int = 2,
                          weight: float = 1.0, temperature: float = 0.07,
                          max_anchors: int = 64):
    """Wrap a segmentation loss with the pixel-contrast term (reference:
    ContrastCELoss, metrics.py:958). The returned loss expects dict model
    outputs {'pred', 'embed'} and batch-supplied queues under
    ``outputs['pixel_queue']`` / ``outputs['segment_queue']``."""
    import jax.numpy as jnp

    def loss_fn(outputs, y, rng):
        pred = outputs["pred"] if isinstance(outputs, dict) else outputs
        base = main_loss(pred, y)
        if not isinstance(outputs, dict) or "embed" not in outputs \
                or "pixel_queue" not in outputs:
            return base
        embed = outputs["embed"]
        spatial_e = embed.shape[1:-1]
        lab_ids = _labels_to_ids(y, nd, spatial_e)
        if pred.shape[-1] == 1:
            pred_ids = (pred[..., 0] > 0).astype(jnp.int32)  # logits: >0 == sigmoid>.5
        else:
            pred_ids = jnp.argmax(pred, axis=-1).astype(jnp.int32)
        if pred_ids.shape[1:] != spatial_e:
            # nearest-downsample the integer class map to the embed grid
            # (no _labels_to_ids here — its 1-channel path binarizes, which
            # corrupts multiclass ids)
            sp = pred_ids.shape[1 : 1 + nd]
            sl = (slice(None),) + tuple(
                slice(None, None, max(1, sp[d] // max(1, spatial_e[d]))) for d in range(nd))
            pred_ids = pred_ids[sl]
            pred_ids = pred_ids[(slice(None),) + tuple(slice(0, spatial_e[d]) for d in range(nd))]
        queue = jnp.concatenate([outputs["segment_queue"], outputs["pixel_queue"]], axis=1)
        lc = pixel_contrast_loss(embed, lab_ids, pred_ids, queue, rng,
                                 n_classes=n_classes, temperature=temperature,
                                 max_anchors=max_anchors)
        return base + weight * lc

    loss_fn.needs_rng = True
    return loss_fn


def contrast_enqueue_samples(embed, y, nd: int, n_classes: int, k: int, rng):
    """Compact per-class enqueue payload computed on device: K random pixel
    embeddings + the mean (segment) embedding per class present in the batch
    (reference: MemoryBank.dequeue_and_enqueue, memory_bank.py:111)."""
    import jax
    import jax.numpy as jnp

    D = embed.shape[-1]
    feats = embed.reshape(-1, D)
    feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)
    lab = _labels_to_ids(y, nd, embed.shape[1:-1]).reshape(-1)
    u = jax.random.uniform(rng, lab.shape)

    def per_class(c):
        is_c = lab == c
        pri = u + is_c.astype(jnp.float32)
        _, idx = jax.lax.top_k(pri, k)
        pix = feats[idx]
        w = is_c.astype(jnp.float32)
        seg = jnp.sum(feats * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
        seg = seg / jnp.maximum(jnp.linalg.norm(seg), 1e-8)
        return pix, seg, jnp.sum(w) > 0, is_c[idx]

    pix, seg, valid, pix_valid = jax.vmap(per_class)(jnp.arange(n_classes))
    return {"_aux_pix": pix, "_aux_seg": seg, "_aux_valid": valid,
            "_aux_pix_valid": pix_valid}


def update_contrast_queues(pixel_q, segment_q, aux, step):
    """Jittable rotating-pointer enqueue: class c's slot at ``step`` keeps its
    old rows when the class was absent from the batch."""
    import jax.numpy as jnp

    pix, seg, valid, pix_valid = (aux["_aux_pix"], aux["_aux_seg"],
                                  aux["_aux_valid"], aux["_aux_pix_valid"])
    k = pix.shape[1]
    Mp = pixel_q.shape[1]
    pos = (step * k) % jnp.maximum(Mp - k + 1, 1)
    rows = jnp.arange(k) + pos
    keep = (valid[:, None] & pix_valid).astype(pixel_q.dtype)[..., None]
    old = jnp.take_along_axis(
        pixel_q, jnp.broadcast_to(rows[None, :, None], (pixel_q.shape[0], k, 1)), axis=1)
    new_rows = pix * keep + old * (1 - keep)
    pixel_q = pixel_q.at[:, rows].set(new_rows.astype(pixel_q.dtype))
    Ms = segment_q.shape[1]
    spos = step % Ms
    segkeep = valid.astype(segment_q.dtype)[:, None]
    old_seg = segment_q[:, spos]
    segment_q = segment_q.at[:, spos].set(
        (seg * segkeep + old_seg * (1 - segkeep)).astype(segment_q.dtype))
    return pixel_q, segment_q


# ---------------------------------------------------------------------------
# TRAIN/TEST.METRICS selection for the restoration workflows (SR, I2I, SSL,
# denoising). Reference: per-name torchmetrics construction in
# super_resolution.py:130-200 / multiple_metrics metrics.py:249.
# ---------------------------------------------------------------------------

RESTORATION_METRIC_NAMES = ("psnr", "mae", "mse", "ssim")


def build_restoration_train_metrics(cfg_names, unwrap=None):
    """Jit-side metric dict from TRAIN.METRICS names (default: all four)."""
    unwrap = unwrap or (lambda o: o["pred"] if isinstance(o, dict) else o)
    names = [str(n).lower() for n in (cfg_names or [])] or list(RESTORATION_METRIC_NAMES)
    fns = {}
    for n in names:
        if n == "psnr":
            fns["psnr"] = lambda out, y: psnr_metric(unwrap(out), y)
        elif n == "mae":
            fns["mae"] = lambda out, y: mae_metric(unwrap(out), y)
        elif n == "mse":
            fns["mse"] = lambda out, y: mse_metric(unwrap(out), y)
        elif n == "ssim":
            fns["ssim"] = lambda out, y: ssim_metric(unwrap(out), y)
    return fns


def restoration_test_metrics(pred: np.ndarray, gt_norm: np.ndarray, cfg_names) -> dict:
    """Host-side per-image metrics from TEST.METRICS names. ``gt_norm`` must
    already be value-normalized like the prediction."""
    names = [str(n).lower() for n in (cfg_names or [])] or list(RESTORATION_METRIC_NAMES)
    out = {}
    diff = pred.astype(np.float64) - gt_norm.astype(np.float64)
    rng_ = max(float(gt_norm.max() - gt_norm.min()), 1e-6)
    for n in names:
        if n == "mse":
            out["mse"] = float((diff ** 2).mean())
        elif n == "mae":
            out["mae"] = float(np.abs(diff).mean())
        elif n == "psnr":
            mse = float((diff ** 2).mean())
            out["psnr"] = float(20 * np.log10(rng_) - 10 * np.log10(max(mse, 1e-12)))
        elif n == "ssim":
            import jax.numpy as jnp

            nd = pred.ndim - 1
            out["ssim"] = float(ssim_metric(jnp.asarray(pred, jnp.float32)[None],
                                            jnp.asarray(gt_norm, jnp.float32)[None],
                                            data_range=rng_))
        elif n in ("fid", "is", "lpips"):
            pass  # set-level metrics: accumulated per image and computed
            # once over the whole test set (engine/perceptual.py)
    return out
