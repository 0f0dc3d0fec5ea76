"""Learning-rate schedules and the optimizer factory.

Reference analog: biapy/engine/__init__.py:21-106 (prepare_optimizer, one
optimizer per loss head via timm's create_optimizer_v2) and
biapy/engine/schedulers/* (warmupcosine / onecycle / reduceonplateau /
warmupreduceonplateau).

optax mapping: warm-up cosine and one-cycle are pure optax schedules
(compiled into the update); the two plateau-driven schedules are host-side
controllers that scale an ``inject_hyperparams`` learning-rate field after
each validation — the same split the reference has between per-iteration
and per-epoch schedulers.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import optax


def _min_lr(sch, head: int) -> float:
    """MIN_LR indexed per optimizer head (reference: engine/__init__.py:82)."""
    v = sch.MIN_LR
    if isinstance(v, (list, tuple)):
        v = v[min(head, len(v) - 1)] if len(v) else -1.0
    return float(v)


def build_schedule(cfg, lr: float, steps_per_epoch: int, head: int = 0):
    """Return (schedule-or-float, plateau controller or None, warmup steps).
    The warmup-step count is consumed by build_optimizer for the plateau
    variant, whose lr is a host-mutable scalar rather than a schedule."""
    sch = cfg.TRAIN.LR_SCHEDULER
    name = (sch.NAME or "").lower()
    epochs = cfg.TRAIN.EPOCHS
    if not name:
        return lr, None, 0
    if name == "warmupcosine":
        min_lr = _min_lr(sch, head)
        warm_e = sch.WARMUP_COSINE_DECAY_EPOCHS
        warm_steps = max(1, warm_e * steps_per_epoch)
        total = max(warm_steps + 1, epochs * steps_per_epoch)
        return (
            optax.warmup_cosine_decay_schedule(
                init_value=min_lr if min_lr != -1.0 else 0.0,
                peak_value=lr,
                warmup_steps=warm_steps,
                decay_steps=total,
                end_value=min_lr if min_lr != -1.0 else 0.0,
            ),
            None,
            0,
        )
    if name == "onecycle":
        total = max(2, epochs * steps_per_epoch)
        return optax.cosine_onecycle_schedule(transition_steps=total, peak_value=lr), None, 0
    if name in ("reduceonplateau", "warmupreduceonplateau"):
        warm = 0
        if name == "warmupreduceonplateau":
            warm = max(1, sch.WARMUP_COSINE_DECAY_EPOCHS * steps_per_epoch)
        ctrl = PlateauController(
            factor=float(sch.REDUCEONPLATEAU_FACTOR),
            patience=int(sch.REDUCEONPLATEAU_PATIENCE),
            min_lr=_min_lr(sch, head),
            base_lr=lr,
        )
        return lr, ctrl, warm
    raise ValueError(f"Unknown LR scheduler: {name}")


class PlateauController:
    """Host-side ReduceLROnPlateau (reference: schedulers/ + torch's
    ReduceLROnPlateau stepped in evaluate, train_engine.py:324)."""

    def __init__(self, factor: float = 0.5, patience: int = 10, min_lr: float = 0.0, base_lr: float = 1e-3):
        self.factor = factor
        self.patience = patience
        self.min_lr = max(min_lr, 0.0) if min_lr != -1.0 else 0.0
        self.lr = base_lr
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, val_loss: float) -> float:
        """Update with the epoch's validation loss; returns the current lr.
        Improvement uses torch ReduceLROnPlateau's default RELATIVE
        threshold (1e-4): noise-level drifts must not reset patience."""
        if val_loss < self.best * (1 - 1e-4):
            self.best = val_loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


def build_optimizer(cfg, steps_per_epoch: int, head: int = 0):
    """Build one optax optimizer (+ optional plateau controller) for loss
    head ``head`` (reference: prepare_optimizer, engine/__init__.py:21)."""
    name = cfg.TRAIN.OPTIMIZER[min(head, len(cfg.TRAIN.OPTIMIZER) - 1)].upper()
    lr = float(cfg.TRAIN.LR[min(head, len(cfg.TRAIN.LR) - 1)])
    wd = float(cfg.TRAIN.W_DECAY)
    betas = cfg.TRAIN.OPT_BETAS
    if betas and isinstance(betas[0], (list, tuple)):
        betas = betas[min(head, len(betas) - 1)]
    b1, b2 = (betas[0], betas[1]) if betas and len(betas) >= 2 else (0.9, 0.999)

    schedule, plateau, warm_steps = build_schedule(cfg, lr, steps_per_epoch, head)
    if plateau is not None:
        # lr is a mutable hyperparam the host scales after validation.
        schedule = lr

    # TRAIN.W_DECAY reaches EVERY optimizer like the reference's timm
    # create_optimizer_v2 (engine/__init__.py:66): decoupled for ADAMW,
    # classic L2-in-grad for ADAM/SGD (torch semantics)
    if name == "ADAMW":
        opt_fn = lambda learning_rate, b1=b1: optax.adamw(
            learning_rate, b1=b1, b2=b2, weight_decay=wd)
    elif name == "ADAM":
        opt_fn = lambda learning_rate, b1=b1: optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(learning_rate, b1=b1, b2=b2))
    elif name == "SGD":
        # reference builds SGD with nesterov=True (engine/__init__.py:66)
        opt_fn = lambda learning_rate, b1=b1: optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(learning_rate, momentum=0.9, nesterov=True))
    else:
        raise ValueError(f"Unknown optimizer: {name} (expected SGD/ADAM/ADAMW)")

    inject_kwargs = {"learning_rate": schedule}
    if (cfg.TRAIN.LR_SCHEDULER.NAME or "").lower() == "onecycle" and name != "SGD":
        # torch OneCycleLR also cycles momentum in antiphase with the LR
        # (cycle_momentum default): beta1 0.95 -> 0.85 at peak -> 0.95
        lr_sched = schedule
        inject_kwargs["b1"] = lambda step: 0.95 - 0.10 * lr_sched(step) / max(lr, 1e-12)
    tx = optax.inject_hyperparams(opt_fn)(**inject_kwargs)
    if plateau is not None and warm_steps:
        # per-iteration warmup for warmupreduceonplateau (reference ramps
        # 0 -> LR over the first epochs, warmup_reduce_on_plateau.py +
        # train_engine.py:113): scale the UPDATES by a 0->1 ramp so the
        # host-mutable plateau lr stays a plain scalar
        ramp = optax.linear_schedule(0.0, 1.0, warm_steps)
        tx = optax.chain(tx, optax.scale_by_schedule(ramp))
    clip = float(cfg.TRAIN.GRADIENT_CLIP_NORM or 0.0)
    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)

    # MODEL.FREEZE_LAYERS_MATCHING: regex-frozen parameter groups get a
    # zero-update transform so neither gradients nor weight decay touch them
    # (reference: layer freezing post-load, base_workflow.py:966-978)
    patterns = list(cfg.MODEL.FREEZE_LAYERS_MATCHING or [])
    if patterns:
        import re as _re

        import jax as _jax

        regs = [_re.compile(p) for p in patterns]

        def labels(params):
            def lab(path, _):
                p = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
                return "frozen" if any(r.search(p) for r in regs) else "train"
            return _jax.tree_util.tree_map_with_path(lab, params)

        tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, labels)
    return tx, plateau


def head_param_labels(apply_fn, variables, example, output_channels,
                      output_channel_info):
    """Label every parameter leaf with the loss head that owns it.

    Reference analog: prepare_optimizer builds one optimizer per entry of
    list-valued TRAIN.OPTIMIZER over ``model.param_groups``
    (engine/__init__.py:21-106). Flax modules have no param_groups, so
    ownership is derived STRUCTURALLY: differentiate the sum of each head's
    output once on the init example — a parameter whose gradient is nonzero
    for exactly one head belongs to that head; anything shared (the
    backbone) belongs to head 0, like the reference's param_groups[0].

    Returns (labels pytree of 'h<i>' strings, n_heads).
    """
    import jax as _jax
    import jax.numpy as _jnp
    import numpy as _np

    n_heads = len(output_channels)
    # channel slices inside the concatenated "pred" / "class" outputs
    slices = []
    pred_off = cls_off = 0
    for ch, info in zip(output_channels, output_channel_info):
        is_cls = "class" in str(info)
        off = cls_off if is_cls else pred_off
        slices.append(("class" if is_cls else "pred", off, off + int(ch)))
        if is_cls:
            cls_off += int(ch)
        else:
            pred_off += int(ch)

    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def head_scalar(p, i):
        out = apply_fn({"params": p, **rest}, example, train=False)
        key, c0, c1 = slices[i]
        o = out[key] if isinstance(out, dict) else out
        return _jnp.sum(o[..., c0:c1].astype(_jnp.float32))

    masks = []
    for i in range(n_heads):
        g = _jax.grad(lambda p: head_scalar(p, i))(params)
        masks.append(_jax.tree.map(lambda a: bool(_np.any(_np.asarray(a))), g))

    def label(*leaf_used):
        owners = [i for i, u in enumerate(leaf_used) if u]
        return f"h{owners[0]}" if len(owners) == 1 else "h0"

    labels = _jax.tree.map(label, *masks)
    return labels, n_heads


def build_multihead_optimizer(cfg, steps_per_epoch: int, labels, n_heads: int):
    """One optimizer per loss head via optax.multi_transform on the head
    labels from :func:`head_param_labels` (reference: engine/__init__.py:21).
    Returns (tx, plateau) — the plateau controller is head 0's; on plateau
    the epoch loop RESCALES every head's lr by the same factor, so relative
    per-head LRs are preserved (per-head MIN_LR clamps only head 0)."""
    txs = {}
    plateau = None
    for i in range(n_heads):
        tx_i, pl_i = build_optimizer(cfg, steps_per_epoch, head=i)
        txs[f"h{i}"] = tx_i
        if i == 0:
            plateau = pl_i
    return optax.multi_transform(txs, lambda params: labels), plateau


def scale_learning_rates(opt_state, scale: float):
    """Multiply EVERY injected learning rate by ``scale`` (plateau decay in
    multi-head mode: keeps per-head LR ratios)."""
    import jax.numpy as jnp

    def rebuild(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            hp = dict(s.hyperparams)
            cur = jnp.asarray(hp["learning_rate"])
            hp["learning_rate"] = (cur * scale).astype(cur.dtype)
            return s._replace(hyperparams=hp)
        if hasattr(s, "inner_states"):
            return s._replace(inner_states={k: rebuild(v) for k, v in dict(s.inner_states).items()})
        if hasattr(s, "inner_state") and hasattr(s, "_replace"):
            return s._replace(inner_state=rebuild(s.inner_state))
        if isinstance(s, dict):
            return {k: rebuild(v) for k, v in s.items()}
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            return tuple(rebuild(x) for x in s)
        return s

    return rebuild(opt_state)


def _find_inject_states(opt_state):
    """Yield every Inject*HyperparamsState holding a learning_rate, at any
    nesting level (optax chains wrap states in plain tuples; the inject state
    itself is a NamedTuple, so check for .hyperparams before iterating)."""
    if hasattr(opt_state, "hyperparams") and "learning_rate" in opt_state.hyperparams:
        yield opt_state
        return
    if hasattr(opt_state, "inner_states"):  # optax.multi_transform (freeze)
        for s in dict(opt_state.inner_states).values():
            yield from _find_inject_states(s)
        return
    if isinstance(opt_state, dict):
        for s in opt_state.values():
            yield from _find_inject_states(s)
        return
    if hasattr(opt_state, "inner_state"):  # optax MaskedState
        yield from _find_inject_states(opt_state.inner_state)
        return
    if isinstance(opt_state, tuple):
        for s in opt_state:
            yield from _find_inject_states(s)


def set_learning_rate(opt_state, new_lr: float):
    """Update the injected learning-rate hyperparameter in an opt state
    (used by the plateau controllers). Returns a new state tree."""
    import jax.numpy as jnp

    def rebuild(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            hp = dict(s.hyperparams)
            hp["learning_rate"] = jnp.asarray(new_lr, dtype=jnp.asarray(hp["learning_rate"]).dtype)
            return s._replace(hyperparams=hp)
        if hasattr(s, "inner_states"):  # optax.multi_transform (freeze)
            return s._replace(inner_states={k: rebuild(v) for k, v in dict(s.inner_states).items()})
        if hasattr(s, "inner_state") and hasattr(s, "_replace"):  # MaskedState
            return s._replace(inner_state=rebuild(s.inner_state))
        if isinstance(s, dict):
            return {k: rebuild(v) for k, v in s.items()}
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            return tuple(rebuild(x) for x in s)
        return s

    return rebuild(opt_state)


def get_learning_rate(opt_state) -> Optional[float]:
    for s in _find_inject_states(opt_state):
        return float(s.hyperparams["learning_rate"])
    return None
