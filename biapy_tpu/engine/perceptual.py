"""Set-level perceptual/distribution test metrics (FID / IS / LPIPS) and the
VGG perceptual GAN loss term.

Reference analog: torchmetrics FrechetInceptionDistance / InceptionScore /
LearnedPerceptualImagePatchSimilarity wired into the restoration workflows'
TEST.METRICS (image_to_image.py:176-213, :338-380) and the VGG16 perceptual
term of the CycleGAN composite (metrics.py VGG:2593, CycleGanLoss:2668,
weighted by LOSS.CYCLEGAN.ALPHA_PERCEPTUAL).

The reference downloads pretrained nets; this environment has no egress, so
weights come from LOCAL files named in the config:

- ``TEST.METRIC_WEIGHTS.INCEPTION`` — a torchvision inception_v3 state dict
  (FID + IS).
- ``TEST.METRIC_WEIGHTS.LPIPS`` — an lpips-package (net='squeeze') state
  dict: backbone under ``net.slice*`` + calibration under ``lin*``.
- ``LOSS.CYCLEGAN.PERCEPTUAL_WEIGHTS`` — a torchvision vgg16 state dict.

Reference behavioral quirks preserved (image_to_image.py:355-371): FID
updates prediction as the "real" set and target as "fake" (symmetric in the
Fréchet distance), and IS is computed on the TARGET set.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _to_unit_range(img: np.ndarray) -> np.ndarray:
    """Reference parity (image_to_image.py:324-336): div/scale_range
    normalized images clamp to [0,1]; zero-mean images min-max rescale."""
    img = np.asarray(img, np.float32)
    lo, hi = float(img.min()), float(img.max())
    if lo < -0.2 or hi > 1.2:  # zero-mean-ish -> min-max
        return (img - lo) / max(hi - lo, 1e-8)
    return np.clip(img, 0.0, 1.0)


def _nhwc(img: np.ndarray) -> np.ndarray:
    """One test image (H,W,C) -> batch NHWC; 3D volumes fold Z into batch
    (the reference restricts these metrics to 2D; volumes arrive only via
    the GAN loss path, metrics.py VGG folds depth into batch the same way)."""
    if img.ndim == 2:
        img = img[..., None]
    if img.ndim == 3:
        return img[None]
    return img  # (Z,H,W,C) folds as batch


class VGGPerceptualLoss:
    """Jit-friendly VGG16 relu3_3 L1 feature distance (reference: metrics.py
    VGG:2593 — vgg16 ``features[:16]``, ImageNet normalization, L1)."""

    def __init__(self, weights_path: str):
        from biapy_tpu.models.feature_nets import (VGG16Features, VGG16_RELU3_3,
                                                   load_vgg16_weights)

        self.net = VGG16Features(taps=(VGG16_RELU3_3,))
        params = self.net.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]
        self.params, _ = load_vgg16_weights(weights_path, params)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """NHWC or NDHWC in [0,1]; 3D folds depth into batch (reference
        parity). Differentiable — usable inside the GAN generator loss."""
        from biapy_tpu.models.feature_nets import imagenet_preprocess

        if pred.ndim == 5:  # (B,Z,H,W,C) -> (B*Z,H,W,C)
            pred = pred.reshape((-1,) + pred.shape[2:])
            target = target.reshape((-1,) + target.shape[2:])
        fp = self.net.apply({"params": self.params}, imagenet_preprocess(pred))[0]
        ft = self.net.apply({"params": self.params}, imagenet_preprocess(target))[0]
        return jnp.mean(jnp.abs(fp - ft))


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (torchmetrics FID math)."""
    import scipy.linalg

    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset),
                                        disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def inception_score(probs: np.ndarray, splits: int = 10) -> float:
    """IS from class probabilities (torchmetrics InceptionScore: split the
    set, exp(mean KL(p(y|x) || p(y))) per split, mean over splits)."""
    probs = np.asarray(probs, np.float64)
    n = len(probs)
    scores = []
    for part in np.array_split(probs, min(splits, max(n, 1))):
        if len(part) == 0:
            continue
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-10) - np.log(py + 1e-10))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)) if scores else 0.0


class PerceptualMetricsAccumulator:
    """Accumulates per-test-image inception features / LPIPS scores and
    computes the set-level metrics once at the end (the reference calls
    ``metric.update`` per image and ``compute`` in after-all, image_to_image
    .py:355-371)."""

    def __init__(self, metric_names: Sequence[str],
                 inception_path: str = "", lpips_path: str = ""):
        self.names = [str(n).lower() for n in metric_names
                      if str(n).lower() in ("fid", "is", "lpips")]
        self._pred_feats: List[np.ndarray] = []
        self._gt_feats: List[np.ndarray] = []
        self._gt_probs: List[np.ndarray] = []
        self._lpips: List[float] = []
        self._inc = None
        self._lp = None
        if any(n in self.names for n in ("fid", "is")):
            from biapy_tpu.models.feature_nets import (InceptionV3,
                                                       load_inception_weights)

            net = InceptionV3()
            params = net.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 299, 299, 3), jnp.float32))["params"]
            params, _ = load_inception_weights(inception_path, params)

            # bind via defaults: the LPIPS block below rebinds ``net``/
            # ``params``, and a late-binding closure would silently apply the
            # SqueezeNet here when both metric families are enabled
            @jax.jit
            def run_inception(x, _net=net, _params=params):
                pool, logits = _net.apply({"params": _params}, x)
                return pool, jax.nn.softmax(logits, axis=-1)

            self._inc = run_inception
        if "lpips" in self.names:
            from biapy_tpu.models.feature_nets import (SqueezeNetFeatures,
                                                       load_lpips_lin_weights,
                                                       load_squeezenet_weights,
                                                       lpips_preprocess)

            net = SqueezeNetFeatures()
            params = net.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]
            params, _ = load_squeezenet_weights(lpips_path, params)
            lins = load_lpips_lin_weights(lpips_path)

            @jax.jit
            def run_lpips(a, b, _net=net, _params=params):
                fa = _net.apply({"params": _params}, lpips_preprocess(a))
                fb = _net.apply({"params": _params}, lpips_preprocess(b))
                total = 0.0
                for f1, f2, w in zip(fa, fb, lins):
                    n1 = f1 * jax.lax.rsqrt(jnp.sum(f1 * f1, -1, keepdims=True) + 1e-10)
                    n2 = f2 * jax.lax.rsqrt(jnp.sum(f2 * f2, -1, keepdims=True) + 1e-10)
                    d = jnp.square(n1 - n2) * jnp.asarray(w)
                    total = total + jnp.mean(jnp.sum(d, axis=-1), axis=(1, 2))
                return jnp.mean(total)

            self._lpips_fn = run_lpips

    def update(self, pred: np.ndarray, gt: np.ndarray) -> None:
        from biapy_tpu.models.feature_nets import inception_preprocess

        p = _nhwc(_to_unit_range(pred))
        g = _nhwc(_to_unit_range(gt))
        if self._inc is not None:
            pf, _ = self._inc(inception_preprocess(jnp.asarray(p)))
            gf, gp = self._inc(inception_preprocess(jnp.asarray(g)))
            self._pred_feats.append(np.asarray(pf))
            self._gt_feats.append(np.asarray(gf))
            self._gt_probs.append(np.asarray(gp))
        if "lpips" in self.names:
            # LPIPS is a paired distance at native resolution; spatial dims
            # must match (they do: pred and gt share the image grid)
            if p.shape[-1] != g.shape[-1]:  # channel-count mismatch guard
                c = min(p.shape[-1], g.shape[-1])
                p, g = p[..., :c], g[..., :c]
            self._lpips.append(float(self._lpips_fn(jnp.asarray(p), jnp.asarray(g))))

    def compute(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        if "fid" in self.names and self._pred_feats:
            a = np.concatenate(self._pred_feats, axis=0).astype(np.float64)
            b = np.concatenate(self._gt_feats, axis=0).astype(np.float64)
            if len(a) < 2 or len(b) < 2:
                out["fid"] = float("nan")  # covariance needs >= 2 samples
            else:
                out["fid"] = frechet_distance(
                    a.mean(0), np.cov(a, rowvar=False),
                    b.mean(0), np.cov(b, rowvar=False))
        if "is" in self.names and self._gt_probs:
            out["is"] = inception_score(np.concatenate(self._gt_probs, axis=0))
        if "lpips" in self.names and self._lpips:
            out["lpips"] = float(np.mean(self._lpips))
        return out
