"""GAN training engine (generator + discriminator, dual optimizers).

Reference analog: the NAFNet+PatchGAN denoising path (denoising.py:191,
NAFNetGan_loss_wrapper; nafnet.py forward_loss:382; metrics.py CycleGAN
composite:2593) and the reference's one-optimizer-per-loss-head design
(engine/__init__.py:21, list-valued TRAIN.OPTIMIZER/LR).

One jitted step updates both networks: the discriminator on
real-vs-generated patches (LSGAN MSE objective), the generator on
adversarial + reconstruction (+SSIM) terms weighted by LOSS.CYCLEGAN.*.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from biapy_tpu.engine import metrics as M
from biapy_tpu.parallel import batch_sharding, replicated


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_batch_stats: Any
    g_opt_state: Any
    d_params: Any
    d_batch_stats: Any
    d_opt_state: Any
    g_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    g_apply: Callable = struct.field(pytree_node=False)
    d_apply: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, g_apply, g_vars, g_tx, d_apply, d_vars, d_tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            g_params=g_vars["params"], g_batch_stats=g_vars.get("batch_stats", {}),
            g_opt_state=g_tx.init(g_vars["params"]),
            d_params=d_vars["params"], d_batch_stats=d_vars.get("batch_stats", {}),
            d_opt_state=d_tx.init(d_vars["params"]),
            g_tx=g_tx, d_tx=d_tx, g_apply=g_apply, d_apply=d_apply,
        )


def _apply(apply_fn, params, batch_stats, x, train, rngs=None):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
        if train:
            out, upd = apply_fn(variables, x, train=True, rngs=rngs, mutable=["batch_stats"])
            return out, upd["batch_stats"]
        return apply_fn(variables, x, train=False), batch_stats
    return apply_fn(variables, x, train=train, rngs=rngs), batch_stats


def make_gan_train_step(
    lambda_gan: float = 1.0,
    lambda_recon: float = 10.0,
    gamma_ssim: float = 1.0,
    delta_mse: float = 0.0,
    alpha_perceptual: float = 0.0,
    perceptual_fn: Callable = None,
    mesh=None,
):
    """LSGAN objective (reference: CycleGAN_loss usage): D minimizes
    MSE(D(real),1)+MSE(D(fake),0); G minimizes lambda_gan*MSE(D(fake),1) +
    lambda_recon*L1 + gamma_ssim*(1-SSIM) + delta_mse*MSE +
    alpha_perceptual*VGG(fake, y) (the reference's CycleGanLoss VGG16
    relu3_3 term, metrics.py:2593,2668; ``perceptual_fn`` is a
    differentiable jit-friendly feature distance, engine/perceptual.py)."""

    def step(state: GANTrainState, batch: Dict[str, jnp.ndarray], rng):
        x, y = batch["x"], batch["y"]
        rng = jax.random.fold_in(rng, state.step)
        k1, k2 = jax.random.split(rng)

        # --- generator update -------------------------------------------
        def g_loss_fn(g_params):
            fake, new_gbs = _apply(state.g_apply, g_params, state.g_batch_stats, x, True,
                                   rngs={"dropout": k1})
            if isinstance(fake, dict):
                fake = fake["pred"]
            d_fake, _ = _apply(state.d_apply, state.d_params, state.d_batch_stats, fake, False)
            adv = jnp.mean(jnp.square(d_fake - 1.0))
            recon = M.mae_metric(fake, y)
            loss = lambda_gan * adv + lambda_recon * recon
            if gamma_ssim > 0:
                loss = loss + gamma_ssim * M.ssim_loss(fake, y)
            if delta_mse > 0:
                loss = loss + delta_mse * M.mse_metric(fake, y)
            if alpha_perceptual > 0 and perceptual_fn is not None:
                loss = loss + alpha_perceptual * perceptual_fn(fake, y)
            return loss, (fake, new_gbs)

        (g_loss, (fake, new_gbs)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
        g_updates, new_g_opt = state.g_tx.update(g_grads, state.g_opt_state, state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        # --- discriminator update ------------------------------------------
        def d_loss_fn(d_params):
            d_real, new_dbs = _apply(state.d_apply, d_params, state.d_batch_stats, y, True,
                                     rngs={"dropout": k2})
            d_fake, new_dbs = _apply(state.d_apply, d_params, new_dbs,
                                     jax.lax.stop_gradient(fake), True, rngs={"dropout": k2})
            loss = 0.5 * (jnp.mean(jnp.square(d_real - 1.0)) + jnp.mean(jnp.square(d_fake)))
            return loss, new_dbs

        (d_loss, new_dbs), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
        d_updates, new_d_opt = state.d_tx.update(d_grads, state.d_opt_state, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, g_batch_stats=new_gbs, g_opt_state=new_g_opt,
            d_params=new_d_params, d_batch_stats=new_dbs, d_opt_state=new_d_opt,
        )
        metrics = {"loss": g_loss, "d_loss": d_loss, "psnr": M.psnr_metric(fake, y)}
        return new_state, metrics

    if mesh is not None:
        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(step, in_shardings=(rep, {"x": bs, "y": bs}, rep),
                       out_shardings=(rep, rep), donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))
