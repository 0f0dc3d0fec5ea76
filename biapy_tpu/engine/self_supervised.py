"""Self-supervised pretraining workflow.

Reference analog: biapy/engine/self_supervised.py (882 LoC). Two pretext
tasks (config.py:576-587):

* ``crappify`` — the input is degraded (downsample by RESIZING_FACTOR +
  gaussian noise) and the model restores the original; any SR-style loss.
* ``masking`` — MAE: the model masks its own input patches and reconstructs
  them; loss is the model's masked-patch MSE.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy import ndimage

from biapy_tpu.engine import metrics as M
from biapy_tpu.engine.base_workflow import Base_Workflow


def crappify(img: np.ndarray, resizing_factor: float, noise_level: float,
             rng: np.random.Generator) -> np.ndarray:
    """Downsample + gaussian noise degradation (reference:
    pre_processing.py:3390 crappify): each axis shrinks by
    sqrt(resizing_factor) (a straight 1/factor per axis was a much harder
    4x-fewer-pixels task in 2D), and the noise is added to the FULL-RES
    image before downsampling, with std = noise_level * max(img) (reference
    add_gaussian_noise:3494), not a post-downsample relative std."""
    nd = img.ndim - 1
    if noise_level > 0:
        # std = noise_level * max (reference add_gaussian_noise:3494);
        # guard for normalized data whose max can be <= 0 (zmuv dark patch)
        std = noise_level * max(abs(float(img.max())), 1e-6)
        img = img + rng.normal(0, std, img.shape)
    shrink = 1.0 / np.sqrt(resizing_factor)
    zoom = [shrink] * nd + [1.0]
    small = ndimage.zoom(img, zoom, order=1)
    back = ndimage.zoom(small, [img.shape[d] / small.shape[d] for d in range(img.ndim)], order=1)
    return back.astype(np.float32)


class Self_supervised_Workflow(Base_Workflow):
    def define_activations_and_channels(self):
        self.pretext = self.cfg.PROBLEM.SELF_SUPERVISED.PRETEXT_TASK
        out_c = int(self.cfg.DATA.PATCH_SIZE[-1])
        self.output_channels = [out_c]
        self.activations = ["linear"]
        self.output_channel_info = ["image"]

        self.gt_as_image = True

    def define_metrics(self):
        if self.pretext == "masking":
            # MAE computes its own masked loss from its output dict.
            def loss(out, y):
                import jax.numpy as jnp

                target = out["target_patches"]
                l2 = jnp.mean(jnp.square(out["pred"] - target), axis=-1)
                return jnp.sum(l2 * out["mask"]) / jnp.maximum(jnp.sum(out["mask"]), 1.0)

            self.loss = loss
            self.train_metrics = {}
        else:
            ltype = (self.cfg.LOSS.TYPE or "MAE").upper()
            w = list(self.cfg.LOSS.WEIGHTS) if self.cfg.LOSS.WEIGHTS else [0.5, 0.5]

            def unwrap(out):
                return out["pred"] if isinstance(out, dict) else out

            # the same SR-style loss family the reference SSL workflow
            # accepts — an unknown type must error, not silently become MAE
            if ltype == "MSE":
                self.loss = lambda out, y: M.mse_metric(unwrap(out), y)
            elif ltype == "MAE":
                self.loss = lambda out, y: M.mae_metric(unwrap(out), y)
            elif ltype == "SSIM":
                self.loss = lambda out, y: M.ssim_loss(unwrap(out), y)
            elif ltype == "W_MAE_SSIM":
                self.loss = lambda out, y: M.w_mae_ssim_loss(unwrap(out), y, w[0], w[1])
            elif ltype == "W_MSE_SSIM":
                self.loss = lambda out, y: M.w_mse_ssim_loss(unwrap(out), y, w[0], w[1])
            else:
                raise ValueError(f"Unsupported LOSS.TYPE for SSL crappify: {ltype}")
            self.train_metrics = {"psnr": lambda out, y: M.psnr_metric(unwrap(out), y)}

    def prepare_targets_fn(self):
        if self.pretext == "masking":
            return lambda img, gt, rng: (img, img)  # MAE sees the raw image
        s = self.cfg.PROBLEM.SELF_SUPERVISED

        def target_fn(img, gt, rng):
            return crappify(img, float(s.RESIZING_FACTOR), float(s.NOISE), rng), img

        return target_fn

    def _predict_fn(self):
        if self.pretext != "masking":
            return super()._predict_fn()

        def apply_mae(variables, x, train=False):
            return self.model.apply(variables, x, train=False, return_just_preds=True,
                                    rngs={"mask": __import__("jax").random.PRNGKey(0)})

        from biapy_tpu.engine.train_engine import make_predict_fn

        return make_predict_fn(apply_mae, mesh=self.mesh)

    def metric_calculation(self, pred, gt):
        return self.restoration_metric_calculation(pred, gt)
