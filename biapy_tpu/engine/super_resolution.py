"""Super-resolution workflow.

Reference analog: biapy/engine/super_resolution.py (589 LoC): per-axis
upscaling factor paired through the data layer (LR input crops, HR GT
crops), MAE loss by default, PSNR/SSIM evaluation.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from biapy_tpu.engine import metrics as M
from biapy_tpu.engine.base_workflow import Base_Workflow


class Super_resolution_Workflow(Base_Workflow):
    def define_activations_and_channels(self):
        cfg = self.cfg
        out_c = int(cfg.DATA.PATCH_SIZE[-1])
        self.output_channels = [out_c]
        self.activations = ["linear"]
        self.output_channel_info = ["image"]
        self.y_upscaling = [int(u) for u in cfg.PROBLEM.SUPER_RESOLUTION.UPSCALING]

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
            raise ValueError(f"Unsupported LOSS.TYPE for super-resolution: {ltype}")
        self.train_metrics = M.build_restoration_train_metrics(self.cfg.TRAIN.METRICS, unwrap)

    def metric_calculation(self, pred, gt):
        return self.restoration_metric_calculation(pred, gt)
