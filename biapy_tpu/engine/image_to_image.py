"""Image-to-image translation workflow.

Reference analog: biapy/engine/image_to_image.py (623 LoC): generic image
regression (e.g. stain translation), optional multi-head output
(PROBLEM.IMAGE_TO_IMAGE.CHANNELS_PER_HEAD_INFO / SEPARATED_DECODERS_PER_HEAD),
MAE/MSE losses, PSNR/SSIM evaluation.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from biapy_tpu.engine import metrics as M
from biapy_tpu.engine.base_workflow import Base_Workflow


class Image_to_Image_Workflow(Base_Workflow):
    def define_activations_and_channels(self):
        cfg = self.cfg
        i2i = cfg.PROBLEM.IMAGE_TO_IMAGE
        heads = list(i2i.CHANNELS_PER_HEAD_INFO) if i2i.CHANNELS_PER_HEAD_INFO else []
        if heads:
            self.output_channels = [int(h) for h in heads]
        else:
            self.output_channels = [int(i2i.OUTPUT_CHANNELS)]
        acts = list(i2i.OUTPUT_CHANNEL_ACT) if i2i.OUTPUT_CHANNEL_ACT else []
        self.activations = [str(a).lower() for a in acts] if acts else ["linear"] * len(self.output_channels)
        self.output_channel_info = [f"head{i}" for i in range(len(self.output_channels))]

        self.gt_as_image = True

    def define_metrics(self):
        ltype = (self.cfg.LOSS.TYPE or "MAE").upper()
        w = list(self.cfg.LOSS.WEIGHTS) if self.cfg.LOSS.WEIGHTS else [0.5, 0.5]

        def unwrap(out):
            return out["pred"] if isinstance(out, dict) else out

        if ltype == "MAE":
            self.loss = lambda out, y: M.mae_metric(unwrap(out), y)
        elif ltype == "MSE":
            self.loss = lambda out, y: M.mse_metric(unwrap(out), y)
        elif ltype == "SSIM":
            self.loss = lambda out, y: M.ssim_loss(unwrap(out), y)
        elif ltype == "W_MAE_SSIM":
            self.loss = lambda out, y: M.w_mae_ssim_loss(unwrap(out), y, w[0], w[1])
        elif ltype == "W_MSE_SSIM":
            self.loss = lambda out, y: M.w_mse_ssim_loss(unwrap(out), y, w[0], w[1])
        else:
            raise ValueError(f"Unsupported LOSS.TYPE for image-to-image: {ltype}")
        self.train_metrics = M.build_restoration_train_metrics(self.cfg.TRAIN.METRICS, unwrap)

    def prepare_targets_fn(self):
        # GT is a raw image: normalize it like the input rather than as a mask.
        from biapy_tpu.data.norm import normalize_image

        spec = self.norm_spec

        def target_fn(img, gt, rng):
            if gt is not None and gt.max() > 1.5:
                gt, _ = normalize_image(gt.astype(np.float32), spec)
            return img, gt

        return target_fn

    def metric_calculation(self, pred, gt):
        # TEST.METRICS selects which restoration metrics to report
        # (reference: check_configuration.py:1277 defaults psnr/mae/mse/ssim;
        # fid/is/lpips accumulate set-level via _update_perceptual)
        return self.restoration_metric_calculation(pred, gt)
