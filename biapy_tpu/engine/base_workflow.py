"""Base workflow: shared train/test orchestration.

Reference analog: biapy/engine/base_workflow.py (Base_Workflow, 2749 LoC) —
model build (:894), train loop (:1007), test loop (:1445), per-image patch
inference + stitch (process_test_sample:1840), activation application
(apply_model_activations:1353), stats aggregation (:2272-2307).

TPU mapping: the torch DDP/per-batch Python loop becomes a jitted
``(state, batch, rng) -> (state, metrics)`` step over a device mesh; patch
inference is one jitted forward over sharded patch batches; stitching is the
spline-blend merge (host now, device scatter-add in ops/stitch.py).
"""

from __future__ import annotations

import json
import math
import os
import time
from abc import ABCMeta, abstractmethod
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from biapy_tpu.data.data_manipulation import (
    load_and_prepare_test_data,
    load_and_prepare_train_data,
    prepare_in_memory_test_data,
)
from biapy_tpu.data.generators import BatchLoader, PairDataset
from biapy_tpu.data.norm import build_norm_dict, denormalize, normalize_image
from biapy_tpu.data.patching import crop_data_with_overlap, merge_data_with_overlap
from biapy_tpu.engine import metrics as M
from biapy_tpu.engine.schedulers import (
    PlateauController,
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)
from biapy_tpu.engine.train_engine import TrainState, make_eval_step, make_predict_fn, make_train_step
from biapy_tpu.models import build_model
from biapy_tpu.parallel import barrier, data_axis_size, get_mesh, is_main_process, shard_batch
from biapy_tpu.utils.callbacks import EarlyStopping
from biapy_tpu.utils.misc import (
    JsonLogger,
    MetricLogger,
    TensorboardLogger,
    apply_checkpoint_params,
    get_checkpoint_path,
    load_checkpoint,
    save_model,
    set_seed,
)


def apply_activations(pred: jnp.ndarray, acts: List[str], channels: List[int], training: bool = False):
    """Apply per-head output activations (reference:
    apply_model_activations, base_workflow.py:1353). 'ce_*' activations are
    folded into the loss during training and applied only at inference."""
    outs = []
    off = 0
    for act, ch in zip(acts, channels):
        seg = pred[..., off : off + ch]
        a = act.lower()
        if a in ("ce_sigmoid", "sigmoid"):
            if not (training and a == "ce_sigmoid"):
                seg = jax.nn.sigmoid(seg)
        elif a in ("ce_softmax", "softmax"):
            if not (training and a == "ce_softmax"):
                seg = jax.nn.softmax(seg, axis=-1)
        elif a == "tanh":
            seg = jnp.tanh(seg)
        elif a in ("linear", "none"):
            pass
        else:
            raise ValueError(f"Unknown head activation: {act}")
        outs.append(seg)
        off += ch
    return jnp.concatenate(outs, axis=-1)


class Base_Workflow(metaclass=ABCMeta):
    """Shared workflow machinery; subclasses define channels/activations,
    losses/metrics, target compilation and post-processing hooks."""

    def __init__(self, cfg, job_identifier: str = "job", verbose: bool = True):
        self.cfg = cfg
        self.job_identifier = job_identifier
        self.verbose = verbose and is_main_process()
        self.is_3d = cfg.PROBLEM.NDIM == "3D"
        self.nd = 3 if self.is_3d else 2
        self.rng_np = set_seed(cfg.SYSTEM.SEED)
        # SYSTEM.SPATIAL_PARTITIONS > 1 builds a (data, space) mesh: the
        # patch's Y axis is GSPMD-sharded so one patch spans several chips'
        # HBM (TPU-native extension; the reference is DDP-only)
        self.mesh = get_mesh(spatial=int(getattr(cfg.SYSTEM, "SPATIAL_PARTITIONS", 1)))
        self.spatial_dim = 2 if self.is_3d else 1  # Y in NDHWC / NHWC
        self.norm_spec = build_norm_dict(cfg)
        # test-time norm spec: half-width blocks under TEST.REDUCE_MEMORY so
        # H2D ships bf16 and the device cast in predict_block_on_device is a
        # no-op (reference: float16 under the same flag, base_workflow.py:181)
        self.test_norm_spec = dict(self.norm_spec)
        if bool(cfg.TEST.REDUCE_MEMORY):
            self.test_norm_spec["out_dtype"] = "bfloat16"
        self.y_upscaling = [1] * self.nd

        # workflow contract (defaults first — the hooks below may override)
        self.activations: List[str] = []
        self.output_channels: List[int] = []
        self.output_channel_info: List[str] = []
        self.gt_as_image = False  # SR/I2I/SSL override: GT is an image, not a mask
        self.define_activations_and_channels()
        self.define_metrics()

        # state
        self.state: Optional[TrainState] = None
        self.model = None
        self.model_build_kwargs: Dict = {}
        self.start_epoch = 0
        self.plateau: Optional[PlateauController] = None
        self._predictions: List[Dict[str, Any]] = []
        self.save_to_disk = True
        self.metrics_per_test_file: List[Dict[str, float]] = []

    # ---------------------------------------------------------------- hooks
    @abstractmethod
    def define_activations_and_channels(self):
        """Set self.activations / output_channels / output_channel_info."""

    @abstractmethod
    def define_metrics(self):
        """Set self.loss (callable) and self.train_metrics dict."""

    def prepare_targets_fn(self) -> Optional[Callable]:
        """Return target_fn(img, mask, rng) -> (x, y) for the generator."""
        return None

    def metric_calculation(self, pred: np.ndarray, gt: np.ndarray) -> Dict[str, float]:
        """Per-image test metrics on stitched predictions."""
        return {}

    def restoration_metric_calculation(self, pred, gt) -> Dict[str, float]:
        """Shared per-image metrics for image-target workflows (SR / SSL /
        denoising): TEST.METRICS restoration metrics on the normalized GT
        (reference: check_configuration.py:1277 defaults psnr/mae/mse/ssim)."""
        if gt is None:
            return {}
        from biapy_tpu.data.norm import normalize_image
        from biapy_tpu.engine import metrics as _M

        g, _ = normalize_image(gt.astype("float32"), self.norm_spec)
        self._update_perceptual(pred, g)
        return _M.restoration_test_metrics(pred, g, self.cfg.TEST.METRICS)

    def _update_perceptual(self, pred, gt_norm) -> None:
        """Accumulate the set-level TEST.METRICS (fid / is / lpips) for this
        image; computed once in print_stats (reference: torchmetrics
        ``update`` per image + end-of-test ``compute``, image_to_image.py:
        355-371). No-op unless TEST.METRICS asks for them."""
        names = [str(n).lower() for n in (self.cfg.TEST.METRICS or [])]
        if not any(n in ("fid", "is", "lpips") for n in names):
            return
        if self._perceptual is None:
            from biapy_tpu.engine.perceptual import PerceptualMetricsAccumulator

            mw = self.cfg.TEST.METRIC_WEIGHTS
            self._perceptual = PerceptualMetricsAccumulator(
                names, inception_path=str(mw.INCEPTION),
                lpips_path=str(mw.LPIPS))
        self._perceptual.update(pred, gt_norm)

    def after_merge_patches(self, pred: np.ndarray, sample, fname: str) -> None:
        """Post-hook on the stitched prediction (reference: :2389)."""

    def after_all_images(self) -> None:
        """Post-hook after the whole test set (reference: :2415)."""

    def tta_spec(self):
        """Channel-semantics spec for TTA; None = all scalars. Instance seg
        overrides with its representation spec."""
        return None

    # ------------------------------------------------------------- model
    def prepare_model(self):
        if self.model is not None:
            return
        self.model, self.model_build_kwargs = build_model(
            self.cfg, self.output_channels, self.output_channel_info, self.activations
        )
        ps = tuple(self.cfg.DATA.PATCH_SIZE)
        example = jnp.zeros((1,) + ps, jnp.float32)
        rngs = {"params": jax.random.PRNGKey(self.cfg.SYSTEM.SEED), "dropout": jax.random.PRNGKey(0)}
        variables = self.model.init(rngs, example, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.verbose:
            n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
            print(f"Model: {self.cfg.MODEL.ARCHITECTURE} — {n:,} parameters")

        stu_pre = self.cfg.MODEL.STUNET.PRETRAINED
        if stu_pre and str(self.cfg.MODEL.ARCHITECTURE).lower() == "stunet" \
                and not self.cfg.MODEL.LOAD_CHECKPOINT:
            # reference downloads the released torch weights
            # (models/__init__.py:242); no egress here, so only a local file
            # converted via the ordered torch->flax importer is accepted.
            if not isinstance(stu_pre, str) or not os.path.exists(str(stu_pre)):
                raise ValueError(
                    "MODEL.STUNET.PRETRAINED: no network access in this "
                    "environment — download the STUNet checkpoint for variant "
                    f"'{self.cfg.MODEL.STUNET.VARIANT}' elsewhere and set this "
                    "key to the local .pth/.pt file path.")
            from biapy_tpu.models.stunet import load_stunet_pretrained

            params, _ = load_stunet_pretrained(
                str(stu_pre), params, variant=str(self.cfg.MODEL.STUNET.VARIANT),
                verbose=self.verbose)

        wsrc = str(self.cfg.MODEL.VIT_PRETRAINED_WEIGHTS)
        if wsrc and "sam3_vit" in (str(self.cfg.MODEL.VIT_MODEL).lower(),
                                   str(self.cfg.MODEL.UNETR_VIT_MODEL).lower()):
            # SAM3 pretrained encoder weights from a local file (reference:
            # MODEL.VIT_PRETRAINED_WEIGHTS, config.py:1418)
            from biapy_tpu.models.sam3_vit import load_sam3_weights

            sub = "sam3_encoder" if "sam3_encoder" in params else None
            tgt = params[sub] if sub else params
            loaded = load_sam3_weights(wsrc, tgt,
                                       patch_size=int(self.model_build_kwargs.get("patch_size", 14)))
            if sub:
                params = dict(params)
                params[sub] = loaded
            else:
                params = loaded
            if self.verbose:
                print(f"Loaded SAM3 encoder weights from {wsrc}")

        if str(self.cfg.MODEL.SOURCE).lower() == "torchvision":
            # torchvision import from a LOCAL state dict (reference downloads
            # DEFAULT weights, build_torchvision_model models/__init__.py:1609)
            tv_name = str(self.cfg.MODEL.TORCHVISION_MODEL_NAME).lower()
            if tv_name.startswith("deeplabv3"):
                from biapy_tpu.models.deeplab import load_torchvision_deeplabv3

                params, batch_stats, _ = load_torchvision_deeplabv3(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name.startswith("fcn_"):
                from biapy_tpu.models.deeplab import load_torchvision_fcn

                params, batch_stats, _ = load_torchvision_fcn(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name.startswith("lraspp"):
                from biapy_tpu.models.mobilenetv3 import load_torchvision_lraspp

                params, batch_stats, _ = load_torchvision_lraspp(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, verbose=self.verbose)
            elif tv_name.startswith("mobilenet_v3"):
                from biapy_tpu.models.mobilenetv3 import load_torchvision_mobilenetv3

                params, batch_stats, _ = load_torchvision_mobilenetv3(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name == "mobilenet_v2":
                from biapy_tpu.models.mobilenetv2 import load_torchvision_mobilenetv2

                params, batch_stats, _ = load_torchvision_mobilenetv2(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, verbose=self.verbose)
            elif tv_name.startswith("shufflenet"):
                from biapy_tpu.models.shufflenet import load_torchvision_shufflenet

                params, batch_stats, _ = load_torchvision_shufflenet(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name.startswith("mnasnet"):
                from biapy_tpu.models.mnasnet import load_torchvision_mnasnet

                params, batch_stats, _ = load_torchvision_mnasnet(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name == "googlenet":
                from biapy_tpu.models.googlenet import load_torchvision_googlenet

                params, batch_stats, _ = load_torchvision_googlenet(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, verbose=self.verbose)
            elif tv_name.startswith("regnet"):
                from biapy_tpu.models.regnet import load_torchvision_regnet

                params, batch_stats, _ = load_torchvision_regnet(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name.startswith("efficientnet_v2"):
                from biapy_tpu.models.efficientnet_v2 import \
                    load_torchvision_efficientnet_v2

                params, batch_stats, _ = load_torchvision_efficientnet_v2(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name.startswith("convnext"):
                from biapy_tpu.models.convnext_tv import load_torchvision_convnext

                params, batch_stats, _ = load_torchvision_convnext(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name.startswith("vit_"):
                from biapy_tpu.models.vit_tv import load_torchvision_vit

                params, batch_stats, _ = load_torchvision_vit(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name == "inception_v3":
                from biapy_tpu.models.inception import load_torchvision_inception

                params, batch_stats, _ = load_torchvision_inception(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, verbose=self.verbose)
            elif tv_name.startswith("swin_v2"):
                from biapy_tpu.models.swin import load_torchvision_swin_v2

                params, batch_stats, _ = load_torchvision_swin_v2(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name.startswith("swin"):
                from biapy_tpu.models.swin import load_torchvision_swin

                params, batch_stats, _ = load_torchvision_swin(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name == "alexnet":
                from biapy_tpu.models.alexnet import load_torchvision_alexnet

                params, batch_stats, _ = load_torchvision_alexnet(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, verbose=self.verbose)
            elif tv_name.startswith("densenet"):
                from biapy_tpu.models.densenet import load_torchvision_densenet

                params, batch_stats, _ = load_torchvision_densenet(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name.startswith("vgg"):
                from biapy_tpu.models.vgg import load_torchvision_vgg

                params, batch_stats, _ = load_torchvision_vgg(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name.startswith("squeezenet"):
                from biapy_tpu.models.squeezenet import load_torchvision_squeezenet

                params, batch_stats, _ = load_torchvision_squeezenet(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            elif tv_name.startswith(("resnet", "resnext", "wide_resnet")):
                from biapy_tpu.models.resnet import load_torchvision_resnet

                params, batch_stats, _ = load_torchvision_resnet(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params,
                    batch_stats, variant=tv_name, verbose=self.verbose)
            else:
                from biapy_tpu.models.efficientnet import load_torchvision_efficientnet

                params, batch_stats, _ = load_torchvision_efficientnet(
                    str(self.cfg.MODEL.TORCHVISION_WEIGHTS), params, batch_stats,
                    variant=tv_name, verbose=self.verbose)

        if str(self.cfg.MODEL.SOURCE).lower() == "bmz":
            # BMZ import (reference: build_bmz_model, models/__init__.py:943)
            from biapy_tpu.utils.bmz import load_bmz_model_weights

            params, batch_stats, self.bmz_torch_map = load_bmz_model_weights(
                str(self.cfg.MODEL.BMZ.SOURCE_MODEL_ID), params, batch_stats,
                verbose=self.verbose, return_map=True)

        steps_per_epoch = max(1, getattr(self, "_steps_per_epoch", 100))
        # list-valued TRAIN.OPTIMIZER/LR + a multi-head model -> one
        # optimizer per loss head (reference: prepare_optimizer over
        # model.param_groups, engine/__init__.py:21-106); ownership labels
        # come from a one-off structural gradient probe
        n_declared = max(len(self.cfg.TRAIN.OPTIMIZER), len(self.cfg.TRAIN.LR))
        self._multihead_opt = (n_declared > 1 and len(self.output_channels) > 1)
        if self._multihead_opt:
            from biapy_tpu.engine.schedulers import (build_multihead_optimizer,
                                                     head_param_labels)

            variables_l = {"params": params}
            if batch_stats:
                variables_l["batch_stats"] = batch_stats
            labels, n_heads = head_param_labels(
                self.model.apply, variables_l, example,
                self.output_channels, self.output_channel_info)
            tx, self.plateau = build_multihead_optimizer(
                self.cfg, steps_per_epoch, labels, n_heads)
            if self.verbose:
                import collections

                counts = collections.Counter(jax.tree.leaves(labels))
                print(f"Per-head optimizers: {dict(counts)} parameter leaves")
        else:
            tx, self.plateau = build_optimizer(self.cfg, steps_per_epoch)
        self.state = TrainState.create(self.model.apply, params, tx, batch_stats)

        # checkpoint loading (finetune / resume); MODEL.ITEMS_TO_LOAD_FROM_
        # CHECKPOINT selects what to restore and SKIP_UNMATCHED_LAYERS turns
        # shape mismatches from errors into skips (reference:
        # load_model_checkpoint, misc.py:516-660)
        if self.cfg.MODEL.LOAD_CHECKPOINT:
            path = get_checkpoint_path(self.cfg, self.job_identifier)
            if path and os.path.exists(path):
                ck = load_checkpoint(path)
                items = list(self.cfg.MODEL.ITEMS_TO_LOAD_FROM_CHECKPOINT or ["weights"])
                skip = bool(self.cfg.MODEL.SKIP_UNMATCHED_LAYERS)
                if "weights" in items:
                    self.state = self.state.replace(
                        params=apply_checkpoint_params(self.state.params, ck["params"],
                                                       skip_unmatched=skip),
                        batch_stats=ck.get("batch_stats") or batch_stats,
                    )
                if "optimizer" in items or "opts" in items:
                    saved = ck.get("opt_state")
                    if saved:
                        from flax import serialization as _ser

                        try:
                            self.state = self.state.replace(
                                opt_state=_ser.from_state_dict(self.state.opt_state, saved))
                            if self.verbose:
                                print("Optimizer state loaded from checkpoint")
                        except Exception as e:
                            if self.verbose:
                                print(f"Optimizer state in checkpoint incompatible, "
                                      f"reinitialized ({e})")
                if ("epoch" in items
                        or self.cfg.MODEL.LOAD_CHECKPOINT_EPOCH == "last_on_train"):
                    # checkpoints record the COMPLETED epoch index, so resume
                    # starts at the next one (the reference stores epoch+1 at
                    # save for the same effect, base_workflow.py:1095) — a
                    # finished run resumes as a no-op instead of re-training
                    # its final epoch
                    self.start_epoch = int(ck.get("epoch", -1)) + 1
                if self.verbose:
                    print(f"Loaded checkpoint {path} (epoch {self.start_epoch})")
            elif self.verbose:
                print("No checkpoint found to load")

    # ------------------------------------------------------------- training
    def train(self):
        cfg = self.cfg
        if self.verbose:
            print("###########################\n#  PREPARE TRAINING DATA  #\n###########################")
        train_ds, val_ds = load_and_prepare_train_data(cfg, self.norm_spec, self.y_upscaling,
                                                       gt_is_mask=not self.gt_as_image)
        n_classes = int(cfg.DATA.N_CLASSES)
        target_fn = self.prepare_targets_fn()
        ch_handler = getattr(self, "aug_channel_handler", None)
        train_data = PairDataset(train_ds, cfg, self.norm_spec, augment=True,
                                 random_crop=bool(cfg.DATA.TRAIN.EXTRACT_RANDOM_PATCH),
                                 target_fn=target_fn, n_classes=n_classes,
                                 y_upscaling=self.y_upscaling, seed=cfg.SYSTEM.SEED,
                                 gt_as_image=self.gt_as_image,
                                 gt_keep_labels=getattr(self, "gt_keep_labels", False),
                                 channel_handler=ch_handler)
        val_data = PairDataset(val_ds, cfg, self.norm_spec, augment=False,
                               random_crop=bool(cfg.DATA.TRAIN.EXTRACT_RANDOM_PATCH),
                               target_fn=target_fn, n_classes=n_classes,
                               y_upscaling=self.y_upscaling, seed=cfg.SYSTEM.SEED,
                               gt_as_image=self.gt_as_image,
                               gt_keep_labels=getattr(self, "gt_keep_labels", False),
                               channel_handler=ch_handler)
        bs = int(cfg.TRAIN.BATCH_SIZE)
        ndev = data_axis_size(self.mesh)  # global batch tiles the data axis
        gbs = max(bs, ndev) if bs % ndev else bs  # batch must tile the mesh
        if gbs % ndev:
            gbs = int(math.ceil(gbs / ndev) * ndev)
        train_loader = BatchLoader(train_data, gbs, num_workers=int(cfg.SYSTEM.NUM_WORKERS),
                                   shuffle=cfg.AUGMENTOR.SHUFFLE_TRAIN_DATA_EACH_EPOCH,
                                   seed=cfg.SYSTEM.SEED,
                                   replicate=max(1, int(cfg.DATA.TRAIN.REPLICATE or 0)))
        val_loader = BatchLoader(val_data, gbs,
                                 shuffle=bool(cfg.AUGMENTOR.SHUFFLE_VAL_DATA_EACH_EPOCH),
                                 seed=cfg.SYSTEM.SEED)
        self._steps_per_epoch = len(train_loader)

        # DATA.VAL.DIST_EVAL (reference: generators/__init__.py:489-503):
        # True = fast padded eval — the ragged final batch is filled with
        # duplicate samples so every step tiles the mesh (the reference pads
        # the DistributedSampler the same way and warns); False = exact eval —
        # the ragged batch is evaluated per sample (each real sample
        # replicated across the batch, so its metric is unbiased) and batch
        # metrics combine by true sample count.
        dist_eval = bool(cfg.DATA.VAL.DIST_EVAL)
        n_val_full, n_val_rem = divmod(len(val_data), gbs) if gbs else (0, 0)
        if dist_eval and n_val_rem and self.verbose:
            print("Warning: Enabling distributed evaluation with an eval "
                  "dataset not divisible by the global batch. This will "
                  "slightly alter validation results as extra duplicate "
                  "entries are added to achieve equal num of samples per "
                  "device. Set DATA.VAL.DIST_EVAL=False for exact metrics.")

        # runtime self-checks (reference: DATA.CHECK_GENERATORS dumps
        # generator output, generators/__init__.py:884; AUGMENTOR.AUG_SAMPLES
        # saves augmented examples, :404-412) — rank 0 only
        if is_main_process():
            from biapy_tpu.data.generators import (check_generator_consistence,
                                                   save_aug_samples)

            if cfg.DATA.CHECK_GENERATORS and cfg.PATHS.GEN_CHECKS:
                check_generator_consistence(train_loader, cfg.PATHS.GEN_CHECKS,
                                            mask_dir=cfg.PATHS.GEN_MASK_CHECKS or None)
            if cfg.AUGMENTOR.ENABLE and cfg.AUGMENTOR.AUG_SAMPLES and cfg.PATHS.DA_SAMPLES:
                save_aug_samples(train_data, cfg.PATHS.DA_SAMPLES,
                                 n=int(cfg.AUGMENTOR.AUG_NUM_SAMPLES),
                                 draw_grid=bool(cfg.AUGMENTOR.DRAW_GRID))

        if self.verbose:
            print(f"Train samples: {len(train_data)}, val samples: {len(val_data)}, "
                  f"global batch: {gbs} over {ndev} devices")

        self.prepare_model()
        from biapy_tpu.engine.train_engine import resolve_mixed_precision

        # pixel-contrastive memory bank: class queues live ON DEVICE and are
        # fed to every step as replicated batch entries; the step returns a
        # compact per-class enqueue payload and a jitted rotating-pointer
        # update folds it in (reference: MemoryBank + train_engine.py:130-146)
        contrast_on = bool(cfg.LOSS.CONTRAST.ENABLE)
        extra_keys: tuple = ()
        aux_fn = None
        queue_upd = None
        pixel_q = segment_q = None
        if contrast_on:
            ncc = max(int(cfg.DATA.N_CLASSES), 2)
            qdim = int(cfg.LOSS.CONTRAST.PROJ_DIM)
            msize = int(cfg.LOSS.CONTRAST.MEMORY_SIZE)
            k_upd = max(1, int(cfg.LOSS.CONTRAST.PIXEL_UPD_FREQ))
            qrng = np.random.default_rng(cfg.SYSTEM.SEED)

            def _qinit(shape):
                a = qrng.normal(size=shape).astype(np.float32)
                return jnp.asarray(a / np.maximum(
                    np.linalg.norm(a, axis=-1, keepdims=True), 1e-8))

            pixel_q = _qinit((ncc, msize, qdim))
            segment_q = _qinit((ncc, max(msize // 10, 1), qdim))
            queue_upd = jax.jit(M.update_contrast_queues, donate_argnums=(0, 1))

            def aux_fn(outputs, y, rng):
                if isinstance(outputs, dict) and "embed" in outputs:
                    return M.contrast_enqueue_samples(outputs["embed"], y, self.nd,
                                                      ncc, k_upd, rng)
                return {}

            extra_keys = ("pixel_queue", "segment_queue")

        train_step = make_train_step(
            self.loss, self.train_metrics, mesh=self.mesh,
            mixed_precision=resolve_mixed_precision(cfg.TRAIN.MIXED_PRECISION),
            extra_batch_rep_keys=extra_keys, aux_out_fn=aux_fn)
        eval_step = make_eval_step(self.loss, self.train_metrics, mesh=self.mesh,
                                   extra_batch_rep_keys=extra_keys)

        early = EarlyStopping(patience=int(cfg.TRAIN.PATIENCE)) if cfg.TRAIN.PATIENCE >= 0 else None
        jsonlog = JsonLogger(os.path.join(cfg.LOG.LOG_DIR, f"{self.job_identifier}_train.jsonl"))
        tb = TensorboardLogger(cfg.LOG.TENSORBOARD_LOG_DIR)
        key = jax.random.PRNGKey(cfg.SYSTEM.SEED)
        best_val = float("inf")
        history: List[Dict[str, float]] = []

        if self.verbose:
            print("#####################\n#  TRAIN THE MODEL  #\n#####################")
        # Real tracing — an improvement over the reference, whose profiler
        # hooks are dead comments (SURVEY.md §5.1; reference config.py:1789):
        # capture an xplane trace of a few steady-state steps of epoch 0.
        profile_steps = int(getattr(cfg.LOG, "PROFILE_STEPS", 0) or 0)
        prof_state = {"on": False, "done": profile_steps <= 0, "seen": 0}

        for epoch in range(self.start_epoch, int(cfg.TRAIN.EPOCHS)):
            t0 = time.time()
            train_loader.set_epoch(epoch)
            logger = MetricLogger(verbose=self.verbose)
            for batch in logger.log_every(train_loader, 10, header=f"Epoch: [{epoch}]"):
                if not prof_state["done"]:
                    prof_state["seen"] += 1
                    if prof_state["seen"] == 3 and not prof_state["on"]:
                        os.makedirs(cfg.PATHS.PROFILER, exist_ok=True)
                        jax.profiler.start_trace(cfg.PATHS.PROFILER)
                        prof_state["on"] = True
                    elif prof_state["on"] and prof_state["seen"] >= 3 + profile_steps:
                        jax.profiler.stop_trace()
                        prof_state.update(on=False, done=True)
                        if self.verbose:
                            print(f"Profiler trace written to {cfg.PATHS.PROFILER}")
                sb = shard_batch(batch, self.mesh, self.spatial_dim)
                if contrast_on:
                    sb["pixel_queue"], sb["segment_queue"] = pixel_q, segment_q
                self.state, mtr = train_step(self.state, sb, key)
                aux = {k: mtr.pop(k) for k in list(mtr) if k.startswith("_aux_")}
                if contrast_on and aux:
                    # state.step stays a device scalar — a python int here
                    # would bake a new constant and retrace every call
                    pixel_q, segment_q = queue_upd(pixel_q, segment_q, aux,
                                                   self.state.step)
                logger.update(**{k: float(v) for k, v in mtr.items()},
                              lr=get_learning_rate(self.state.opt_state) or 0.0)
            if not np.isfinite(logger.meters["loss"].global_avg):
                raise RuntimeError("Loss is NaN — stopping training (reference: train_engine.py:160)")

            record = {"epoch": epoch, **{k: m.global_avg for k, m in logger.meters.items()}}

            # validation
            if len(val_data) > 0:
                vals: Dict[str, List[float]] = {}
                wsum: List[float] = []

                def _eval_one(b, weight):
                    vb = shard_batch(b, self.mesh, self.spatial_dim)
                    if contrast_on:
                        vb["pixel_queue"], vb["segment_queue"] = pixel_q, segment_q
                    mtr = eval_step(self.state, vb)
                    for k, v in mtr.items():
                        vals.setdefault(k, []).append(float(v))
                    wsum.append(weight)

                for bi, batch in enumerate(val_loader):
                    if not dist_eval and n_val_rem and bi == n_val_full:
                        # exact eval of the ragged batch: each real sample
                        # replicated over the whole batch => its own metric
                        for j in range(n_val_rem):
                            _eval_one({k: np.repeat(v[j:j + 1], gbs, axis=0)
                                       for k, v in batch.items()}, 1.0)
                    else:
                        _eval_one(batch, float(gbs))
                val_metrics = {("val_" + k): float(np.average(v, weights=wsum))
                               for k, v in vals.items()}
                record.update(val_metrics)
                val_loss = val_metrics["val_loss"]
                if self.plateau is not None:
                    old_lr = self.plateau.lr
                    new_lr = self.plateau.step(val_loss)
                    if getattr(self, "_multihead_opt", False):
                        # rescale every head's lr by the same plateau factor
                        # so the configured per-head ratios survive decay
                        if new_lr != old_lr:
                            from biapy_tpu.engine.schedulers import scale_learning_rates

                            self.state = self.state.replace(
                                opt_state=scale_learning_rates(
                                    self.state.opt_state, new_lr / max(old_lr, 1e-30)))
                    else:
                        self.state = self.state.replace(
                            opt_state=set_learning_rate(self.state.opt_state, new_lr))
                # TRAIN.CHECKPOINT_MONITOR picks the best-checkpoint metric
                # (reference: config.py:1787); '*loss' minimizes, else maximizes
                monitor = str(cfg.TRAIN.CHECKPOINT_MONITOR or "val_loss")
                if not monitor.startswith("val_"):
                    monitor = "val_" + monitor
                if monitor in val_metrics:
                    mon_val = val_metrics[monitor]
                    score = mon_val if "loss" in monitor else -mon_val
                else:
                    # an absent metric falls back to the loss and must also
                    # MINIMIZE — negating the loss because the monitor NAME
                    # isn't 'loss' would freeze 'best' at epoch 0
                    if epoch == self.start_epoch and self.verbose:
                        print(f"WARNING: TRAIN.CHECKPOINT_MONITOR '{monitor}' is "
                              "not among the validation metrics "
                              f"{sorted(val_metrics)}; monitoring val_loss")
                    score = val_loss
                if score < best_val:
                    best_val = score
                    save_model(self.cfg, cfg.PATHS.CHECKPOINT, self.job_identifier,
                               self.state.params, epoch, self.state.batch_stats,
                               model_build_kwargs=self.model_build_kwargs, metric="best")
                if early is not None and early(val_loss):
                    if self.verbose:
                        print(f"Early stopping at epoch {epoch}")
                    break
            freq = int(cfg.MODEL.SAVE_CKPT_FREQ)  # -1 => only best + final
            if (freq > 0 and (epoch + 1) % freq == 0) or epoch == cfg.TRAIN.EPOCHS - 1:
                save_model(self.cfg, cfg.PATHS.CHECKPOINT, self.job_identifier,
                           self.state.params, epoch, self.state.batch_stats,
                           opt_state=self.state.opt_state,  # resume restores it
                           model_build_kwargs=self.model_build_kwargs)
            record["time"] = time.time() - t0
            jsonlog.write(record)
            tb.update(step=epoch, **{k: v for k, v in record.items() if isinstance(v, (int, float))})
            history.append(record)
            freq = int(cfg.LOG.CHART_CREATION_FREQ)
            if is_main_process() and freq > 0 and ((epoch + 1) % freq == 0 or epoch == cfg.TRAIN.EPOCHS - 1):
                from biapy_tpu.utils.util import create_plots

                create_plots(history, cfg.PATHS.CHARTS, self.job_identifier)
            if self.verbose:
                print(f"Epoch {epoch} done in {record['time']:.1f}s: "
                      + " ".join(f"{k}={v:.4f}" for k, v in record.items() if isinstance(v, float)))
        tb.close()

        # every rank reloads the best checkpoint below, but only rank 0
        # writes it — without a barrier a non-zero rank can reload an OLDER
        # best while rank 0 is still replacing it with the final epoch's
        # (caught by the real 2-process test: params diverged across ranks)
        barrier("checkpoints-written")

        # reload the best checkpoint for testing (reference: :1244)
        best_path = os.path.join(cfg.PATHS.CHECKPOINT, f"{self.job_identifier}-checkpoint-best.ckpt")
        if os.path.exists(best_path):
            ck = load_checkpoint(best_path)
            self.state = self.state.replace(
                params=apply_checkpoint_params(self.state.params, ck["params"]),
                batch_stats=ck.get("batch_stats") or self.state.batch_stats,
            )
            if self.verbose:
                print("Reloaded best checkpoint for testing")

    # ------------------------------------------------------------- inference
    def _ensure_model_for_test(self):
        if self.state is None:
            self.prepare_model()
            if not self.cfg.MODEL.LOAD_CHECKPOINT:
                path = get_checkpoint_path(self.cfg, self.job_identifier)
                if path and os.path.exists(path):
                    ck = load_checkpoint(path)
                    self.state = self.state.replace(
                        params=apply_checkpoint_params(self.state.params, ck["params"]),
                        batch_stats=ck.get("batch_stats") or self.state.batch_stats,
                    )
                    if self.verbose:
                        print(f"Loaded checkpoint {path} for inference")

    def _predict_fn(self):
        acts = self.activations
        chans = self.output_channels

        def apply_with_acts(variables, x, train=False):
            out = self.model.apply(variables, x, train=False)
            if isinstance(out, dict):
                cls = out.get("class")
                out = out["pred"]
                if cls is not None:
                    out = jnp.concatenate([out, cls], axis=-1)
            return apply_activations(out, acts, chans, training=False)

        return make_predict_fn(lambda v, x, train=False: apply_with_acts(v, x), mesh=self.mesh)

    def predict_block_on_device(self, block_n: np.ndarray,
                                batch_size: Optional[int] = None,
                                overlap: Optional[Sequence[float]] = None,
                                padding: Optional[Sequence[int]] = None,
                                device=None, sync: bool = True,
                                out_splits=None,
                                norm_stats=None,
                                pre_padded=False,
                                grid_overrides=None) -> Optional[np.ndarray]:
        """Whole-block sliding-window inference as ONE jitted program: the
        block lives in HBM, a lax.scan walks the patch grid, the model runs
        on the MXU (bf16 when TEST.REDUCE_MEMORY) and spline-blended patches
        scatter-add into the output — host transfers are one block in, one
        result out (vs the reference's per-patch GPU round-trips). Returns
        None when the device path doesn't apply (TTA on) so callers fall
        back to the host crop/merge path.

        ``norm_stats`` (a ``compute_norm_stats`` dict) moves normalization
        INTO the jitted program: the caller ships the RAW block (uint8 EM
        data travels at 1 byte/voxel instead of 2–4 pre-normalized) and the
        device fuses cast + clip + affine into one elementwise kernel ahead
        of the stitch. The transform is exactly ``normalize_image``'s
        (reference norm.py:38) with the same per-channel stats."""
        if self.cfg.TEST.AUGMENTATION:
            return None  # representation-aware TTA runs on the host path
        # workflows with exotic forward logic (e.g. SSL/MAE masking) keep
        # their overridden per-batch predict; instance seg's per-channel
        # activations are handled below via _act_channels
        if type(self)._predict_fn is not Base_Workflow._predict_fn and \
                not hasattr(self, "_act_channels"):
            return None
        self._ensure_model_for_test()
        import jax.numpy as jnp

        from biapy_tpu.ops.stitch import sliding_window_inference

        cfg = self.cfg
        acts = self.activations
        # instance seg applies activations per channel (_act_channels);
        # other workflows per head (output_channels)
        chans = getattr(self, "_act_channels", None) or self.output_channels
        reduce_mem = bool(cfg.TEST.REDUCE_MEMORY)
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        if reduce_mem:
            variables = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, variables)

        model = self.model

        def apply_fn(v, x):
            if reduce_mem:
                x = x.astype(jnp.bfloat16)
            out = model.apply(v, x, train=False)
            if isinstance(out, dict):
                cls = out.get("class")
                out = out["pred"]
                if cls is not None:
                    # separated class head travels flat after the main
                    # channels (multi-head instance/detection)
                    out = jnp.concatenate([out, cls], axis=-1)
            return apply_activations(out.astype(jnp.float32), acts, chans, training=False)

        ndev = data_axis_size(self.mesh)  # global batch tiles the data axis
        bs = batch_size or max(int(cfg.TRAIN.BATCH_SIZE), ndev)
        patch = tuple(cfg.DATA.PATCH_SIZE)[: self.nd]
        ov = tuple(overlap) if overlap is not None else tuple(cfg.DATA.TEST.OVERLAP)
        pad = tuple(padding) if padding is not None else tuple(cfg.DATA.TEST.PADDING)
        # cache the jitted stitch per geometry — a fresh trace per block would
        # recompile (~30s on the tunnel) for every tile/image
        splits = tuple(tuple(s) for s in out_splits) if out_splits is not None else None
        dev_norm = norm_stats is not None
        ppad = (tuple(bool(v) for v in pre_padded)
                if isinstance(pre_padded, (tuple, list))
                else (bool(pre_padded),) * self.nd)
        gov = (tuple(sorted((k, tuple(v)) for k, v in grid_overrides.items()))
               if grid_overrides else None)
        quant = bool(getattr(cfg.TEST, "OUTPUT_QUANT_UINT8", False))
        key = (tuple(block_n.shape), str(block_n.dtype), ov, pad, bs,
               reduce_mem, splits, bool(cfg.DATA.TEST.MEDIAN_PADDING), dev_norm,
               ppad, gov, quant)
        cache = getattr(self, "_stitch_cache", None)
        if cache is None:
            cache = self._stitch_cache = {}
        runner = cache.get(key)
        if runner is None:
            out_dt = jnp.bfloat16 if reduce_mem else jnp.float32
            pad_mode = "median" if cfg.DATA.TEST.MEDIAN_PADDING else "reflect"
            if dev_norm:
                # normalization stats travel as ONE runtime (4, C) array —
                # new tiles with different stats reuse the compiled program,
                # and the per-tile dispatch pays a single tiny H2D instead
                # of four (each costs a transport RTT on tunnel links). The
                # uint8->f32->clip->affine->bf16 chain fuses into a single
                # elementwise kernel; the volume is stored in HBM already at
                # the compute width.
                vol_dt = jnp.bfloat16 if reduce_mem else jnp.float32

                def _run(v, vol, aff):
                    lo, hi, sub, div = aff[0], aff[1], aff[2], aff[3]
                    x = jnp.clip(vol.astype(jnp.float32), lo, hi)
                    x = ((x - sub) / div).astype(vol_dt)
                    return sliding_window_inference(
                        apply_fn, v, x, patch, ov, pad,
                        out_channels=sum(chans), batch_size=bs, out_dtype=out_dt,
                        out_splits=splits, pad_mode=pad_mode, pre_padded=ppad,
                        grid_overrides=grid_overrides, quant_uint8=quant)

                runner = jax.jit(_run)
            else:
                runner = jax.jit(lambda v, vol: sliding_window_inference(
                    apply_fn, v, vol, patch, ov, pad,
                    out_channels=sum(chans), batch_size=bs, out_dtype=out_dt,
                    out_splits=splits, pad_mode=pad_mode, pre_padded=ppad,
                    grid_overrides=grid_overrides, quant_uint8=quant))
            cache[key] = runner
        # Zero host-side dtype work: a bfloat16 block ships as a pure memcpy
        # and anything else ships in its native width and casts ON DEVICE —
        # two host astype passes over a 100+ MB slab cost more than the wider
        # H2D, and the device cast overlaps earlier slabs' compute. (bf16
        # still halves HBM for the volume under REDUCE_MEMORY.)
        if dev_norm:
            import numpy as _np

            from biapy_tpu.data.norm import stats_to_affine

            norm_args = (jnp.asarray(_np.stack(
                [_np.broadcast_to(_np.asarray(a, _np.float32),
                                  (block_n.shape[-1],))
                 for a in stats_to_affine(norm_stats)])),)
        else:
            norm_args = ()
        block_j = block_n
        if device is not None:
            # tile parallelism across local chips: computation follows the
            # committed placement of its inputs. The per-device weight cache
            # is invalidated whenever self.state is a different OBJECT (an
            # id()-keyed cache would both leak old device copies and risk a
            # stale hit when CPython reuses a freed id after finetuning)
            vcache = getattr(self, "_var_device_cache", None)
            if vcache is None or vcache["state"] is not self.state:
                vcache = self._var_device_cache = {"state": self.state, "devices": {}}
            vd = vcache["devices"].get(device)
            if vd is None:
                vd = jax.device_put(variables, device)
                vcache["devices"][device] = vd
            blk = jax.device_put(block_j, device)
            if not dev_norm and reduce_mem and blk.dtype != jnp.bfloat16:
                blk = blk.astype(jnp.bfloat16)  # runs on `device` (committed)
            if dev_norm:
                na = tuple(jax.device_put(a, device) for a in norm_args)
                out = runner(vd, blk, *na)
            else:
                out = runner(vd, blk)
        else:
            blk = jnp.asarray(block_j)
            if not dev_norm and reduce_mem and blk.dtype != jnp.bfloat16:
                blk = blk.astype(jnp.bfloat16)
            out = runner(variables, blk, *norm_args)
        if not sync:
            return out
        if splits is not None:
            return np.concatenate([np.asarray(jax.device_get(c)).astype(np.float32)
                                   for c in out], axis=0)
        return np.asarray(jax.device_get(out)).astype(np.float32)

    def predict_patches(self, patches: np.ndarray, batch_size: Optional[int] = None) -> np.ndarray:
        """Run the jitted forward over all patches in sharded batches."""
        self._ensure_model_for_test()
        predict = getattr(self, "_cached_predict", None)
        if predict is None:
            predict = self._predict_fn()
            self._cached_predict = predict
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        ndev = data_axis_size(self.mesh)  # global batch tiles the data axis
        bs = batch_size or max(int(self.cfg.TRAIN.BATCH_SIZE), ndev)
        bs = int(math.ceil(bs / ndev) * ndev)

        def run_batches(p):
            outs = []
            for i in range(0, len(p), bs):
                chunk = p[i : i + bs]
                n = len(chunk)
                if n < bs:
                    chunk = np.concatenate([chunk, np.repeat(chunk[-1:], bs - n, axis=0)])
                sb = shard_batch(jnp.asarray(chunk), self.mesh, self.spatial_dim)
                out = np.asarray(jax.device_get(predict(variables, sb)))
                outs.append(out[:n])
            return np.concatenate(outs, axis=0)

        if self.cfg.TEST.AUGMENTATION:
            # representation-aware TTA (reference: ensemble_predictions,
            # post_processing.py:1371; tta.py)
            from biapy_tpu.data.tta import ensemble_predictions

            mode = (self.cfg.TEST.AUGMENTATION_MODE or "mean").lower()
            return ensemble_predictions(run_batches, patches, spec=self.tta_spec(),
                                        ndim=self.nd, mode=mode,
                                        group_level=str(self.cfg.TEST.AUGMENTATION_GROUP or "full"))
        return run_batches(patches)

    def before_test_sample(self, img: np.ndarray, gt: Optional[np.ndarray], fname: str):
        """Workflow hook run before inference on one image (e.g. the Cellpose
        test-time diameter rescale, reference: workflow_utils/cellpose.py)."""
        return img, gt

    def post_merge_transform(self, pred: np.ndarray, fname: str) -> np.ndarray:
        """Workflow hook run on the merged prediction before metrics and
        instance creation (e.g. resizing Cellpose flows back to native)."""
        return pred

    def _predict_block_multichip(self, img: np.ndarray, ov, pad, stats):
        """Per-image inference across ALL local chips (VERDICT r2 #5): the
        3D volume's z patch-rows are grouped contiguously, one group per
        chip, each slab carrying ``pad[0]`` rows of REAL halo from its
        neighbours and dispatched asynchronously (the by-chunks local-chip
        pattern, engine/chunked.py:179, applied to the common per-image
        path the reference serves single-GPU, base_workflow.py:1840).

        Result is IDENTICAL to the single-chip whole-volume stitch: with
        z-overlap 0 the whole-volume z grid is rows [0, c, 2c, ..., Z-c]
        (the last row shifted), and a slab covering any CONTIGUOUS row range
        with real halo reproduces exactly those rows at the same offsets —
        including the shifted final row's flat-window averaging, which stays
        inside the last group (equality pinned by
        tests/test_parallel_spatial.py::test_per_image_multichip_equals_single).

        Returns None when the decomposition doesn't apply (2D, one chip,
        z overlap != 0, or fewer than two patch rows).
        """
        import jax

        from biapy_tpu.data.patching import axis_grid

        devs = jax.local_devices()
        if not self.is_3d or len(devs) < 2 or ov[0] != 0:
            return None
        patch = tuple(self.cfg.DATA.PATCH_SIZE)
        core_z = patch[0] - 2 * pad[0]
        Z = int(img.shape[0])
        if core_z <= 0 or Z <= core_z:
            return None
        zg = axis_grid(Z, patch[0], ov[0], pad[0])
        if zg.n < 2 or zg.ov_px != 0:
            # redistributed z overlap blends EVERY adjacent row pair — no
            # split point exists without cross-device blending
            return None
        # the shifted final row averages with its predecessor inside their
        # shared flat-window overlap — they must land in the SAME group, so
        # the last "unit" spans both rows when the grid carries a last_shift
        n_units = zg.n if zg.last_shift == 0 else zg.n - 1
        if n_units < 2:
            return None
        n_dev = min(len(devs), n_units)
        halo = pad[0]
        outs = []
        for k in range(n_dev):
            u0, u1 = n_units * k // n_dev, n_units * (k + 1) // n_dev
            if u0 >= u1:
                continue
            z0 = u0 * zg.step
            is_last = u1 >= n_units
            z1 = Z if is_last else u1 * zg.step
            n_rows = (u1 - u0) + (1 if (is_last and zg.last_shift) else 0)
            h0, h1 = max(0, z0 - halo), min(Z, z1 + halo)
            slab = img[h0:h1]
            pad_lo, pad_hi = halo - (z0 - h0), halo - (h1 - z1)
            if pad_lo or pad_hi:
                pw = ((pad_lo, pad_hi),) + ((0, 0),) * (img.ndim - 1)
                slab = np.pad(slab, pw, mode="reflect")
            # the slab reproduces the GLOBAL grid's rows on its z range:
            # same step, the global last_shift on the final row only, flat
            # window (ov_px 0) — axis_grid on the slab extent alone would
            # redistribute the shift differently and change the blend
            gov = {0: (n_rows, zg.step,
                       zg.last_shift if is_last else 0, 0)}
            out = self.predict_block_on_device(
                slab, overlap=ov, padding=pad, device=devs[len(outs) % len(devs)],
                sync=False, norm_stats=stats, pre_padded=(True, False, False),
                grid_overrides=gov)
            if out is None:  # device path doesn't apply (TTA, exotic forward)
                return None
            outs.append(out)
        if len(outs) < 2:
            return None
        return np.concatenate([np.asarray(jax.device_get(o)) for o in outs], axis=0)

    def process_test_sample(self, img: np.ndarray, gt: Optional[np.ndarray], fname: str, sample=None):
        """Sliding-window inference on one image (reference:
        process_test_sample, base_workflow.py:1840)."""
        cfg = self.cfg
        ov = tuple(cfg.DATA.TEST.OVERLAP)
        pad = tuple(cfg.DATA.TEST.PADDING)
        crop_shape = tuple(cfg.DATA.PATCH_SIZE)

        if cfg.TEST.REUSE_PREDICTIONS:
            # Skip the model entirely: reload this image's saved prediction
            # and re-run only metrics + workflow post-processing (reference:
            # TEST.REUSE_PREDICTIONS, config.py:1861, base_workflow.py:1850) —
            # the recovery path for tweaking post-proc without re-predicting.
            from biapy_tpu.data.io import read_img_as_ndarray

            prev = os.path.join(cfg.PATHS.RESULT_DIR.PER_IMAGE, fname)
            if not os.path.exists(prev):
                prev = os.path.join(cfg.PATHS.RESULT_DIR.FULL_IMAGE, fname)
            if not os.path.exists(prev):
                raise FileNotFoundError(
                    f"TEST.REUSE_PREDICTIONS: no saved prediction for '{fname}' under "
                    f"{cfg.PATHS.RESULT_DIR.PER_IMAGE} — run a prediction pass first")
            merged = read_img_as_ndarray(prev, is_3d=self.is_3d).astype(np.float32)
            m = self.metric_calculation(merged, gt) if gt is not None else {}
            if m:
                self.metrics_per_test_file.append(m)
                if self.verbose:
                    print(f"  {fname} (reused): " + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
            self.after_merge_patches(merged, sample, fname)
            self._predictions.append({"role": "raw", "pred": merged, "file": fname, "metrics": m})
            return {"pred": merged}

        img, gt = self.before_test_sample(img, gt, fname)
        # Stats from the raw bytes; the device path ships the RAW image and
        # normalizes inside the jitted program (cast+clip+affine fuse into
        # one kernel — uint8 travels at 1 byte/voxel). Host fallbacks
        # (TTA/SR/FULL_IMG) normalize lazily with the same stats.
        from biapy_tpu.data.norm import compute_norm_stats

        stats = compute_norm_stats(img, self.test_norm_spec)
        img_n = None

        def _norm():
            return normalize_image(img, self.test_norm_spec, stats=stats)[0]

        if cfg.TEST.FULL_IMG and not self.is_3d:
            img_n = _norm()
            # whole-image forward (reference: TEST.FULL_IMG / after_full_image,
            # base_workflow.py:2401): pad to a stride-safe multiple, one pass.
            mult = 64
            pads = [(0, (-img_n.shape[d]) % mult) for d in range(self.nd)] + [(0, 0)]
            full = np.pad(img_n, pads, mode="reflect") if any(p[1] for p in pads) else img_n
            pred = self.predict_patches(full[None], batch_size=1)[0]
            up = self.y_upscaling
            pred = pred[tuple(slice(0, img.shape[d] * up[d]) for d in range(self.nd))]
            pred = self.post_merge_transform(pred, fname)
            merged = self.apply_roi_mask(pred, fname)
            m = self.metric_calculation(merged, gt) if gt is not None else {}
            if m:
                self.metrics_per_test_file.append(m)
            self.after_merge_patches(merged, sample, fname)
            self._predictions.append({"role": "raw", "pred": merged, "file": fname, "metrics": m})
            if self.save_to_disk:
                from biapy_tpu.data.io import save_tif

                save_tif(merged[None], cfg.PATHS.RESULT_DIR.FULL_IMAGE, [fname], verbose=False)
            return {"pred": merged}

        up = self.y_upscaling
        merged = None
        if all(u == 1 for u in up):
            # fast path: the whole image stitches in one jitted program on
            # the device (ops/stitch.py), normalization included — the raw
            # image ships narrow; TTA/SR fall back to host crop/merge.
            # 3D volumes slab in z across ALL local chips when possible
            # (identical result to single-chip, see _predict_block_multichip)
            merged = self._predict_block_multichip(img, ov, pad, stats)
            if merged is None:
                merged = self.predict_block_on_device(img, overlap=ov, padding=pad,
                                                      norm_stats=stats)
        if merged is None:
            if img_n is None:
                img_n = _norm()
            patches, _ = crop_data_with_overlap(
                img_n[None], crop_shape, overlap=ov, padding=pad,
                pad_type="median" if cfg.DATA.TEST.MEDIAN_PADDING else "reflect")
            preds = self.predict_patches(patches)
            out_ch = preds.shape[-1]
            out_spatial = tuple(img.shape[d] * up[d] for d in range(self.nd))
            if any(u != 1 for u in up):
                ov_scaled, pad_scaled = ov, tuple(p * u for p, u in zip(pad, up))
            else:
                ov_scaled, pad_scaled = ov, pad
            merged = merge_data_with_overlap(
                preds, (1,) + out_spatial + (out_ch,), overlap=ov_scaled, padding=pad_scaled
            )[0]
        merged = self.post_merge_transform(merged, fname)
        merged = self.apply_roi_mask(merged, fname)
        res = {"pred": merged}
        m = self.metric_calculation(merged, gt) if gt is not None else {}
        if m:
            self.metrics_per_test_file.append(m)
            if self.verbose:
                print(f"  {fname}: " + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
        self.after_merge_patches(merged, sample, fname)
        self._predictions.append({"role": "raw", "pred": merged, "file": fname, "metrics": m})
        if self.save_to_disk and cfg.TEST.SAVE_MODEL_RAW_OUTPUT:
            # raw (pre-post-processing) output next to the final artifacts
            # (reference: TEST.SAVE_MODEL_RAW_OUTPUT, base_workflow.py:2113)
            from biapy_tpu.data.io import save_tif

            save_tif(merged[None], cfg.PATHS.RESULT_DIR.PER_IMAGE, [fname], verbose=False)
        return res

    def test(self, image: Optional[np.ndarray] = None, gt: Optional[np.ndarray] = None):
        cfg = self.cfg
        self._predictions = []
        self.metrics_per_test_file = []
        self._perceptual = None
        self._ensure_model_for_test()
        if image is None and cfg.TEST.BY_CHUNKS.ENABLE and self.is_3d:
            self.process_test_by_chunks()
            return
        if image is not None:
            ds = prepare_in_memory_test_data(image, gt, self.is_3d)
        elif cfg.DATA.TEST.USE_VAL_AS_TEST:
            # the held-out validation split (or cross-val fold) is the test
            # set (reference: DATA.TEST.USE_VAL_AS_TEST, base_workflow.py:1283)
            _, ds = load_and_prepare_train_data(cfg, self.norm_spec, self.y_upscaling,
                                                gt_is_mask=not self.gt_as_image)
            if self.verbose:
                print(f"Using the validation split as test set ({len(ds.sample_list)} samples)")
        else:
            ds = load_and_prepare_test_data(cfg, self.norm_spec, gt_is_mask=not self.gt_as_image)
        if self.verbose:
            print("###############\n#  INFERENCE  #\n###############")
            print(f"Processing {len(ds.sample_list)} test images")
        if not is_main_process():
            # the per-image path runs on rank 0 only, like the reference
            # (base_workflow.py:1519 guards it with is_main_process; only
            # by-chunks distributes inference) — concurrent ranks would also
            # race on the same per-image output files
            barrier("per_image_test")
            return
        for i, s in enumerate(ds.sample_list):
            f = ds.dataset_info[s.fid]
            img, g = s.img, s.gt
            if img is None:
                from biapy_tpu.data.io import read_img_as_ndarray

                img = read_img_as_ndarray(f.path, is_3d=self.is_3d,
                                          data_path=f.data_path, axes_order=f.input_axes)
                if f.gt_path:
                    g = read_img_as_ndarray(f.gt_path, is_3d=self.is_3d,
                                            data_path=f.gt_data_path, axes_order=f.gt_input_axes)
                if cfg.DATA.PREPROCESS.TEST:
                    from biapy_tpu.data.pre_processing import preprocess_image

                    img = preprocess_image(cfg.DATA.PREPROCESS, img, is_2d=not self.is_3d)
                    if g is not None:
                        g = preprocess_image(cfg.DATA.PREPROCESS, g,
                                             is_mask=not self.gt_as_image,
                                             only_resize=True, is_2d=not self.is_3d)
                if s.coords is not None:  # patch sample (e.g. USE_VAL_AS_TEST)
                    from biapy_tpu.data.patching import extract_patch

                    img = extract_patch(img, s.coords)
                    if g is not None:
                        g = extract_patch(g, s.coords)
            fname = os.path.basename(f.path) if f.path != "<in_memory>" else f"pred_{i}.tif"
            if s.coords is not None:
                stem, ext = os.path.splitext(fname)
                fname = f"{stem}_sample{i}{ext or '.tif'}"
            self._current_test_file = f.path
            self.process_test_sample(img, g, fname, s)
        self.after_all_images()
        self.print_stats()
        barrier("per_image_test")  # pairs with the non-main early return

    def apply_roi_mask(self, pred: np.ndarray, fname: str) -> np.ndarray:
        """Restrict inference to a region-of-interest mask (reference:
        apply_roi_mask, base_workflow.py:1801; data/roi_mask.py): the
        prediction is zeroed outside the mask."""
        roi_cfg = self.cfg.DATA.TEST.ROI_MASK
        if not roi_cfg.ENABLE:
            return pred
        from biapy_tpu.data.io import list_image_files, read_img_as_ndarray

        path = str(roi_cfg.PATH)
        candidates = list_image_files(path) if os.path.isdir(path) else [path]
        # patch samples carry a '_sample{i}' suffix — strip it for matching
        base = fname
        stem, ext = os.path.splitext(fname)
        if "_sample" in stem:
            base = stem.rsplit("_sample", 1)[0] + ext
        match = [c for c in candidates if os.path.basename(c) in (fname, base)]
        if not match and len(candidates) == 1:
            match = candidates  # a single mask file serves every volume
        if not match:
            # same rule as the by-chunks path: never silently apply an
            # arbitrary mask out of several candidates
            print(f"WARNING: no ROI mask named {base} in {path} and several "
                  "candidates exist — skipping the ROI for this image")
            return pred
        roi = read_img_as_ndarray(match[0], is_3d=self.is_3d)
        m = (roi[..., :1] > 0).astype(pred.dtype)
        if m.shape[: self.nd] != pred.shape[: self.nd]:
            from scipy import ndimage

            zoom = [pred.shape[d] / m.shape[d] for d in range(self.nd)] + [1.0]
            m = (ndimage.zoom(m, zoom, order=0) > 0).astype(pred.dtype)
        return pred * m

    def process_test_by_chunks(self):
        """Tile-streamed inference over huge Zarr/H5 volumes (reference:
        process_test_sample_by_chunks, base_workflow.py:2469)."""
        import jax

        from biapy_tpu.data.io import list_image_files, open_lazy
        from biapy_tpu.engine.chunked import ChunkedInference

        cfg = self.cfg
        bc = cfg.TEST.BY_CHUNKS
        files = list_image_files(cfg.DATA.TEST.PATH)
        out_ch = sum(self.output_channels)
        phases = [str(p) for p in bc.PHASES]
        data_path = (str(cfg.DATA.TEST.INPUT_ZARR_MULTIPLE_DATA_RAW_PATH) or None
                     if cfg.DATA.TEST.INPUT_ZARR_MULTIPLE_DATA else None)
        for f in files:
            self._current_test_file = f
            base = os.path.splitext(os.path.basename(f))[0]
            out_dir = os.path.join(cfg.PATHS.RESULT_DIR.PER_IMAGE, base + "_chunks")
            ci = ChunkedInference(
                self, tuple(cfg.DATA.PATCH_SIZE)[: self.nd], tuple(cfg.DATA.TEST.OVERLAP),
                tuple(cfg.DATA.TEST.PADDING), tuple(bc.WORKFLOW_PROCESS.PATCHES_PER_TILE),
                out_ch, out_dir, rank=jax.process_index(), world=jax.process_count(),
            )
            raw_path = os.path.join(out_dir, "raw_pred.zarr")
            if "prediction" in phases:
                roi = roi_handle = None
                roi_cfg = cfg.DATA.TEST.ROI_MASK
                if roi_cfg.ENABLE:
                    # by-chunks skips tiles with no ROI overlap instead of
                    # zeroing after the fact (reference: config.py:934)
                    rpath = str(roi_cfg.PATH)
                    cands = list_image_files(rpath) if os.path.isdir(rpath) else [rpath]
                    match = [c for c in cands
                             if os.path.basename(c) == os.path.basename(f)]
                    if not match and len(cands) == 1:
                        match = cands  # a single mask file serves every volume
                    elif not match and cands:
                        print(f"WARNING: no ROI mask named {os.path.basename(f)} "
                              f"in {rpath} and several candidates exist — "
                              "skipping the ROI for this volume")
                    if match:
                        roi, roi_handle = open_lazy(match[0])
                ao = str(cfg.DATA.TEST.INPUT_IMG_AXES_ORDER) or None
                raw_path = ci.predict_volume(
                    f, z_range=(int(bc.Z_START), int(bc.Z_END)), verbose=self.verbose,
                    data_path=data_path, roi=roi, axes_order=ao,
                    axes_order_is_default=(ao == "TZCYX"),
                )
                if roi_handle is not None:
                    roi_handle.close()
                if bc.SAVE_OUT_TIF and is_main_process():
                    # whole-volume TIF of the raw prediction (reference:
                    # TEST.BY_CHUNKS.SAVE_OUT_TIF, base_workflow.py:2581)
                    from biapy_tpu.data.io import open_lazy, save_tif
                    from biapy_tpu.engine.chunked import dequant_pred

                    vol, handle = open_lazy(raw_path)
                    save_tif(dequant_pred(vol[:])[None],
                             cfg.PATHS.RESULT_DIR.PER_IMAGE,
                             [base + ".tif"], verbose=False)
                    if hasattr(handle, "close"):
                        handle.close()
            self.after_by_chunks_prediction(ci, raw_path, base)
        self.after_all_images()
        self.print_stats()

    def after_by_chunks_prediction(self, ci, raw_path: str, base: str) -> None:
        """Workflow hook after the raw-prediction Zarr exists (instance seg
        runs the tile watershed + merge here)."""

    def print_stats(self):
        """Aggregate per-image metrics + final CSV (reference: print_stats
        :2307 and the metrics_per_test_file CSV, base_workflow.py:1534)."""
        if not self.metrics_per_test_file or not is_main_process():
            return
        keys = self.metrics_per_test_file[0].keys()
        agg = {k: float(np.mean([m[k] for m in self.metrics_per_test_file])) for k in keys}
        for k, v in agg.items():
            print(f"Test {k} (per image): {v:.6f}")
        if self._perceptual is not None:
            # set-level metrics computed once over the whole test set
            # (reference: FID/IS/LPIPS compute at end, image_to_image.py)
            for k, v in self._perceptual.compute().items():
                print(f"Test {k} (whole set): {v:.6f}")
                agg[k] = v
        self.stats = agg
        if self.save_to_disk:
            import csv

            out = os.path.join(str(self.cfg.PATHS.RESULT_DIR.PATH),
                               f"{self.job_identifier}_per_image_metrics.csv")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=["image"] + list(keys))
                w.writeheader()
                files = [p.get("file", f"{i}") for i, p in enumerate(self._predictions)
                         if p.get("role") in ("raw",)]
                for i, m in enumerate(self.metrics_per_test_file):
                    w.writerow({"image": files[i] if i < len(files) else i, **m})
        return agg
