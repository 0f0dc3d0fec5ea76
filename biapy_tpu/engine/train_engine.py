"""Jitted, mesh-sharded train/eval steps.

Reference analog: biapy/engine/train_engine.py (train_one_epoch:25,
evaluate:211). The torch per-batch loop (forward -> loss -> backward ->
clip -> step per optimizer, metric logging, NaN abort) maps to a single
pure function ``(state, batch, rng) -> (state, metrics)`` compiled once by
XLA and executed per batch; the DDP gradient all-reduce is implicit in the
'data'-axis sharding of the batch under GSPMD.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from biapy_tpu.parallel import SPACE_AXIS, batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    """Model + optimizer state (flax-struct so it shards/jits cleanly)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any  # empty dict when the model has no BN
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, tx, batch_stats=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats if batch_stats is not None else {},
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )


def _forward(state: TrainState, x, train: bool, rng=None):
    variables = {"params": state.params}
    has_bn = bool(state.batch_stats)
    if has_bn:
        variables["batch_stats"] = state.batch_stats
    if train and rng is not None:
        k1, k2 = jax.random.split(rng)
        rngs = {"dropout": k1, "mask": k2}  # 'mask' feeds MAE-style models
    else:
        rngs = None
    if train and has_bn:
        out, updates = state.apply_fn(variables, x, train=True, rngs=rngs, mutable=["batch_stats"])
        return out, updates["batch_stats"]
    out = state.apply_fn(variables, x, train=train, rngs=rngs)
    return out, state.batch_stats


def resolve_mixed_precision(setting) -> bool:
    """TRAIN.MIXED_PRECISION: True/False or 'auto' (bf16 compute on TPU,
    f32 elsewhere). A TPU-first extension over the reference (which trains
    fp32-only): params, optimizer state and gradients stay f32; the forward
    and backward matmuls run in bf16 on the MXU."""
    if isinstance(setting, str):
        s = setting.lower()
        if s == "auto":
            return jax.default_backend() not in ("cpu",)
        return s in ("1", "true", "yes")
    return bool(setting)


def _cast_tree(tree, dtype):
    return jax.tree.map(
        lambda p: p.astype(dtype) if hasattr(p, "dtype") and p.dtype == jnp.float32 else p,
        tree)


def make_train_step(
    loss_fn: Callable,
    metric_fns: Optional[Dict[str, Callable]] = None,
    mesh=None,
    donate: bool = True,
    mixed_precision: bool = False,
    extra_batch_rep_keys: Sequence[str] = (),
    aux_out_fn: Optional[Callable] = None,
):
    """Build the jitted train step.

    ``loss_fn(outputs, targets) -> scalar``; ``metric_fns`` maps names to
    ``fn(outputs, targets) -> scalar``. When ``mesh`` is given, the state is
    replicated and the batch sharded along the data axis; the mean loss and
    grads are globally correct because XLA reduces over the full sharded
    batch. With ``mixed_precision`` the forward/backward run in bf16 (master
    params, grads and update math stay f32 — classic AMP).

    A loss with ``needs_rng = True`` is called ``loss_fn(outputs, y, rng)``
    (e.g. contrastive anchor sampling). ``extra_batch_rep_keys`` names batch
    entries replicated across the mesh instead of batch-sharded (e.g. the
    contrastive memory queues). ``aux_out_fn(outputs, y, rng) -> dict`` adds
    device-side auxiliary outputs to the metrics dict (keys should start
    with '_aux_' so the host loop can separate them from scalars).
    """
    metric_fns = metric_fns or {}

    def call_loss(outputs, y, rng):
        if getattr(loss_fn, "needs_rng", False):
            return loss_fn(outputs, y, rng)
        return loss_fn(outputs, y)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        x, y = batch["x"], batch["y"]
        rng = jax.random.fold_in(rng, state.step)
        extras = {k: batch[k] for k in extra_batch_rep_keys if k in batch}

        def compute_loss(params):
            if mixed_precision:
                st = state.replace(params=_cast_tree(params, jnp.bfloat16))
                outputs, new_bs = _forward(st, x.astype(jnp.bfloat16), train=True, rng=rng)
                # losses/metrics accumulate in f32
                outputs = jax.tree.map(
                    lambda o: o.astype(jnp.float32)
                    if hasattr(o, "dtype") and o.dtype == jnp.bfloat16 else o,
                    outputs)
            else:
                st = state.replace(params=params)
                outputs, new_bs = _forward(st, x, train=True, rng=rng)
            if extras and isinstance(outputs, dict):
                outputs = {**outputs, **extras}
            return call_loss(outputs, y, rng), (outputs, new_bs)

        (loss, (outputs, new_bs)), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # NaN guard (reference: train_engine.py:160 hard-aborts on NaN loss;
        # here the step is skipped on device and the host checks the flag).
        loss_ok = jnp.isfinite(loss)
        new_params = jax.tree.map(lambda n, o: jnp.where(loss_ok, n, o), new_params, state.params)
        new_opt = jax.tree.map(lambda n, o: jnp.where(loss_ok, n, o), new_opt, state.opt_state)

        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt, batch_stats=new_bs
        )
        metrics = {"loss": loss}
        for name, fn in metric_fns.items():
            metrics[name] = fn(outputs, y)
        if aux_out_fn is not None:
            metrics.update(aux_out_fn(outputs, y, rng))
        return new_state, metrics

    if mesh is not None:
        rep = replicated(mesh)
        if SPACE_AXIS in mesh.axis_names:
            # spatial partitioning: the batch keeps the committed sharding
            # placed by shard_batch (image leaves split over 'space')
            return jax.jit(step, in_shardings=(rep, None, rep),
                           out_shardings=(rep, rep),
                           donate_argnums=(0,) if donate else ())
        bs = batch_sharding(mesh)
        batch_sh = {"x": bs, "y": bs, **{k: rep for k in extra_batch_rep_keys}}
        return jax.jit(
            step,
            in_shardings=(rep, batch_sh, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(loss_fn: Callable, metric_fns: Optional[Dict[str, Callable]] = None, mesh=None,
                   extra_batch_rep_keys: Sequence[str] = ()):
    metric_fns = metric_fns or {}

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        outputs, _ = _forward(state, batch["x"], train=False)
        extras = {k: batch[k] for k in extra_batch_rep_keys if k in batch}
        if extras and isinstance(outputs, dict):
            outputs = {**outputs, **extras}
        if getattr(loss_fn, "needs_rng", False):
            loss = loss_fn(outputs, batch["y"], jax.random.PRNGKey(0))
        else:
            loss = loss_fn(outputs, batch["y"])
        metrics = {"loss": loss}
        for name, fn in metric_fns.items():
            metrics[name] = fn(outputs, batch["y"])
        return metrics

    if mesh is not None:
        rep = replicated(mesh)
        if SPACE_AXIS in mesh.axis_names:
            return jax.jit(step, in_shardings=(rep, None), out_shardings=rep)
        bs = batch_sharding(mesh)
        batch_sh = {"x": bs, "y": bs, **{k: rep for k in extra_batch_rep_keys}}
        return jax.jit(step, in_shardings=(rep, batch_sh), out_shardings=rep)
    return jax.jit(step)


def make_predict_fn(apply_fn: Callable, mesh=None, activations: Optional[Callable] = None):
    """Jitted inference: variables replicated, patch batch sharded on data."""

    def predict(variables, x):
        out = apply_fn(variables, x, train=False)
        if activations is not None:
            out = activations(out)
        return out

    if mesh is not None:
        rep = replicated(mesh)
        if SPACE_AXIS in mesh.axis_names:
            return jax.jit(predict, in_shardings=(rep, None))
        bs = batch_sharding(mesh)
        return jax.jit(predict, in_shardings=(rep, bs), out_shardings=bs)
    return jax.jit(predict)
