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
    pre_processing.py crappify)."""
    nd = img.ndim - 1
    zoom = [1.0 / resizing_factor] * nd + [1.0]
    small = ndimage.zoom(img, zoom, order=1)
    if noise_level > 0:
        small = small + rng.normal(0, noise_level * max(small.std(), 1e-6), small.shape)
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

            def unwrap(out):
                return out["pred"] if isinstance(out, dict) else out

            if ltype == "MSE":
                self.loss = lambda out, y: M.mse_metric(unwrap(out), y)
            else:
                self.loss = lambda out, y: M.mae_metric(unwrap(out), y)
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
        if gt is None:
            return {}
        from biapy_tpu.data.norm import normalize_image

        g, _ = normalize_image(gt.astype("float32"), self.norm_spec)
        return M.restoration_test_metrics(pred, g, self.cfg.TEST.METRICS)
