"""Denoising workflow (Noise2Void).

Reference analog: biapy/engine/denoising.py (1052 LoC): self-supervised
Noise2Void — a stratified subset of pixels is replaced by values drawn from
their neighbourhood (manipulators: uniform/normal/mean/median, with/without
the center pixel, optional struct-mask), and the loss is MSE restricted to
the manipulated pixels. The GAN (NAFNet+PatchGAN) supervised mode is a
separate path (denoising.py:191), arriving with the GAN engine.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from biapy_tpu.engine import metrics as M
from biapy_tpu.engine.base_workflow import Base_Workflow


def n2v_manipulate(
    img: np.ndarray,
    rng: np.random.Generator,
    perc_pix: float = 0.198,
    manipulator: str = "uniform_withCP",
    radius: int = 5,
    struct_mask: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stratified pixel manipulation (reference: denoising.py:499-1036).

    Returns (manipulated_img, target_values, mask) with channels-last shapes
    equal to ``img``; mask=1 where pixels were replaced.
    """
    spatial = img.shape[:-1]
    nd = len(spatial)
    out = img.copy()
    mask = np.zeros_like(img, dtype=np.float32)
    target = img.copy()

    # stratified sampling: one candidate per grid cell of size box
    # the reference uses round(sqrt(100/perc)) for BOTH 2D and 3D
    # (denoising.py:1013) — a cube-root 3D box manipulated ~2x more voxels
    box = max(2, int(round(np.sqrt(100.0 / perc_pix))))
    grids = [np.arange(0, s, box) for s in spatial]
    coords = np.meshgrid(*grids, indexing="ij")
    offsets = [rng.integers(0, box, c.shape) for c in coords]
    pix = [np.minimum(c + o, s - 1).reshape(-1) for c, o, s in zip(coords, offsets, spatial)]
    idx = tuple(pix)

    for c in range(img.shape[-1]):
        vals = _manipulated_values(img[..., c], idx, rng, manipulator, radius)
        out[..., c][idx] = vals
        mask[..., c][idx] = 1.0
    if struct_mask and nd >= 2:
        # structN2V blinds the +-4 x-neighbours IN THE INPUT with random
        # uniform values in [-2, 2) (reference apply_structN2Vmask,
        # denoising.py:915-980, default 1x11 mask with center/end zeros);
        # the LOSS mask stays at the manipulated centers. Extending the
        # loss mask instead (the old behavior) left the structured noise
        # visible and trained the identity at those pixels.
        w = spatial[nd - 1]
        for c in range(img.shape[-1]):
            for dx in (-4, -3, -2, -1, 1, 2, 3, 4):
                x = idx[nd - 1] + dx
                ok = (x >= 0) & (x < w)  # clip INSIDE bounds, never wrap or
                # collapse onto the center pixel
                if not ok.any():
                    continue
                nb = tuple(ax[ok] for ax in idx[: nd - 1]) + (x[ok],)
                out[..., c][nb] = rng.random(int(ok.sum())) * 4 - 2
    return out, target, mask


def _manipulated_values(ch: np.ndarray, idx, rng, manipulator: str, radius: int):
    n = len(idx[0])
    spatial = ch.shape
    nd = len(spatial)
    if manipulator.startswith("normal_additive"):
        return ch[idx] + rng.normal(0, ch.std(), n)
    # neighbourhood-based manipulators
    def sample_neigh():
        cols = []
        for d in range(nd):
            off = rng.integers(-radius, radius + 1, n)
            cols.append(np.clip(idx[d] + off, 0, spatial[d] - 1))
        return cols

    neigh_idx = sample_neigh()
    if "withoutCP" in manipulator:
        # resample coordinates that landed ON the center (after clipping!)
        # until every neighbour differs somewhere — the reference's
        # random_neighbor loop (denoising.py:551); forcing one axis off-zero
        # both skipped valid neighbours and let border clipping feed the
        # center value back in
        for _ in range(16):
            same = np.ones(n, bool)
            for d in range(nd):
                same &= neigh_idx[d] == idx[d]
            if not same.any():
                break
            redraw = sample_neigh()
            for d in range(nd):
                neigh_idx[d] = np.where(same, redraw[d], neigh_idx[d])
        else:
            for d in range(nd):  # guaranteed off-center fallback
                neigh_idx[d] = np.where(same & (idx[d] > 0), idx[d] - 1,
                                        np.where(same, idx[d] + 1, neigh_idx[d]))
                same &= neigh_idx[d] == idx[d]
    neigh_vals = ch[tuple(neigh_idx)]
    if manipulator.startswith(("uniform", "normal_withCP", "normal_withoutCP")):
        return neigh_vals
    if manipulator.startswith(("mean", "median")):
        # sample a small neighbourhood per pixel
        samples = [neigh_vals]
        for _ in range(4):
            alt = []
            for d in range(nd):
                off = rng.integers(-radius, radius + 1, n)
                alt.append(np.clip(idx[d] + off, 0, spatial[d] - 1))
            samples.append(ch[tuple(alt)])
        stack = np.stack(samples)
        return np.mean(stack, axis=0) if manipulator.startswith("mean") else np.median(stack, axis=0)
    return neigh_vals


class Denoising_Workflow(Base_Workflow):
    def _gan_mode(self) -> bool:
        """Supervised GAN denoising: NAFNet generator + PatchGAN
        discriminator, dual optimizers (reference: denoising.py:191)."""
        return (str(self.cfg.MODEL.ARCHITECTURE).lower() == "nafnet"
                and bool(self.cfg.PROBLEM.DENOISING.LOAD_GT_DATA))

    def define_activations_and_channels(self):
        out_c = int(self.cfg.DATA.PATCH_SIZE[-1])
        self.out_c = out_c
        self.output_channels = [out_c]
        self.activations = ["linear"]
        self.output_channel_info = ["image"]

        self.gt_as_image = True

    def define_metrics(self):
        c = int(self.cfg.DATA.PATCH_SIZE[-1])

        def loss(out, y):
            pred = out["pred"] if isinstance(out, dict) else out
            return M.n2v_loss_mse(pred, y[..., :c], y[..., c:])

        if self._gan_mode():
            self.loss = lambda out, y: M.mae_metric(out["pred"] if isinstance(out, dict) else out, y)
        else:
            self.loss = loss
        self.train_metrics = {}

    def prepare_targets_fn(self):
        if self._gan_mode():
            return None  # paired noisy/clean images straight through
        d = self.cfg.PROBLEM.DENOISING

        def target_fn(img, gt, rng):
            manip, target, mask = n2v_manipulate(
                img, rng, perc_pix=float(d.N2V_PERC_PIX), manipulator=str(d.N2V_MANIPULATOR),
                radius=int(d.N2V_NEIGHBORHOOD_RADIUS), struct_mask=bool(d.N2V_STRUCTMASK),
            )
            return manip, np.concatenate([target, mask], axis=-1)

        return target_fn

    # -- GAN training path --------------------------------------------------
    def train(self):
        if not self._gan_mode():
            return super().train()
        import math
        import os
        import time

        import jax

        from biapy_tpu.data.data_manipulation import load_and_prepare_train_data
        from biapy_tpu.data.generators import BatchLoader, PairDataset
        from biapy_tpu.engine.gan import GANTrainState, make_gan_train_step
        from biapy_tpu.engine.schedulers import build_optimizer
        from biapy_tpu.models import build_model
        from biapy_tpu.models.nafnet import PatchGANDiscriminator
        from biapy_tpu.parallel import data_axis_size, shard_batch
        from biapy_tpu.utils.misc import JsonLogger, MetricLogger, save_model

        cfg = self.cfg
        train_ds, val_ds = load_and_prepare_train_data(cfg, self.norm_spec)
        train_data = PairDataset(train_ds, cfg, self.norm_spec, augment=True,
                                 gt_as_image=True, seed=cfg.SYSTEM.SEED)
        ndev = data_axis_size(self.mesh)
        gbs = int(math.ceil(max(int(cfg.TRAIN.BATCH_SIZE), ndev) / ndev) * ndev)
        loader = BatchLoader(train_data, gbs, shuffle=True, seed=cfg.SYSTEM.SEED)
        self._steps_per_epoch = len(loader)

        self.model, self.model_build_kwargs = build_model(
            cfg, self.output_channels, self.output_channel_info, self.activations)
        import jax.numpy as jnp

        disc = PatchGANDiscriminator(base_filters=int(cfg.MODEL.NAFNET.PATCHGAN.BASE_FILTERS))
        ps = tuple(cfg.DATA.PATCH_SIZE)
        ex = jnp.zeros((1,) + ps, jnp.float32)
        rngs = {"params": jax.random.PRNGKey(cfg.SYSTEM.SEED), "dropout": jax.random.PRNGKey(1)}
        g_vars = self.model.init(rngs, ex, train=False)
        d_vars = disc.init(rngs, ex, train=False)
        g_tx, _ = build_optimizer(cfg, self._steps_per_epoch, head=0)
        d_tx, _ = build_optimizer(cfg, self._steps_per_epoch, head=1)
        gan = cfg.LOSS.CYCLEGAN
        perc_fn = None
        if float(gan.ALPHA_PERCEPTUAL) > 0:
            # VGG16 perceptual term from a local state dict (reference
            # downloads torchvision vgg16, metrics.py:2593)
            from biapy_tpu.engine.perceptual import VGGPerceptualLoss

            perc_fn = VGGPerceptualLoss(str(gan.PERCEPTUAL_WEIGHTS))
        gan_step = make_gan_train_step(
            lambda_gan=float(gan.LAMBDA_GAN), lambda_recon=float(gan.LAMBDA_RECON),
            gamma_ssim=float(gan.GAMMA_SSIM), delta_mse=float(gan.DELTA_MSE),
            alpha_perceptual=float(gan.ALPHA_PERCEPTUAL), perceptual_fn=perc_fn,
            mesh=self.mesh,
        )
        gstate = GANTrainState.create(self.model.apply, g_vars, g_tx, disc.apply, d_vars, d_tx)
        key = jax.random.PRNGKey(cfg.SYSTEM.SEED)
        jsonlog = JsonLogger(os.path.join(cfg.LOG.LOG_DIR, f"{self.job_identifier}_train.jsonl"))
        best = float("inf")
        for epoch in range(int(cfg.TRAIN.EPOCHS)):
            t0 = time.time()
            loader.set_epoch(epoch)
            logger = MetricLogger(verbose=self.verbose)
            for batch in logger.log_every(loader, 20, header=f"Epoch: [{epoch}]"):
                gstate, mtr = gan_step(gstate, shard_batch(batch, self.mesh), key)
                logger.update(**{k: float(v) for k, v in mtr.items()})
            record = {"epoch": epoch, **{k: m.global_avg for k, m in logger.meters.items()},
                      "time": time.time() - t0}
            jsonlog.write(record)
            if self.verbose:
                print(f"Epoch {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in record.items()
                                                    if isinstance(v, float)))
            if record["loss"] < best:
                best = record["loss"]
                save_model(cfg, cfg.PATHS.CHECKPOINT, self.job_identifier, gstate.g_params,
                           epoch, gstate.g_batch_stats,
                           model_build_kwargs=self.model_build_kwargs, metric="best")
        # expose the generator for inference through the standard path
        from biapy_tpu.engine.train_engine import TrainState

        self.state = TrainState.create(self.model.apply, gstate.g_params,
                                       optax_identity(), gstate.g_batch_stats)

    def metric_calculation(self, pred, gt):
        return self.restoration_metric_calculation(pred, gt)


def optax_identity():
    import optax

    return optax.identity()
