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


def build_schedule(cfg, lr: float, steps_per_epoch: int):
    """Return (optax schedule or float, host_plateau_controller or None)."""
    sch = cfg.TRAIN.LR_SCHEDULER
    name = (sch.NAME or "").lower()
    epochs = cfg.TRAIN.EPOCHS
    if not name:
        return lr, None
    if name == "warmupcosine":
        min_lr = sch.MIN_LR[0] if isinstance(sch.MIN_LR, (list, tuple)) else sch.MIN_LR
        warm_e = sch.WARMUP_COSINE_DECAY_EPOCHS
        warm_steps = max(1, warm_e * steps_per_epoch)
        total = max(warm_steps + 1, epochs * steps_per_epoch)
        return (
            optax.warmup_cosine_decay_schedule(
                init_value=float(min_lr) if min_lr != -1.0 else 0.0,
                peak_value=lr,
                warmup_steps=warm_steps,
                decay_steps=total,
                end_value=float(min_lr) if min_lr != -1.0 else 0.0,
            ),
            None,
        )
    if name == "onecycle":
        total = max(2, epochs * steps_per_epoch)
        return optax.cosine_onecycle_schedule(transition_steps=total, peak_value=lr), None
    if name in ("reduceonplateau", "warmupreduceonplateau"):
        warm = 0
        if name == "warmupreduceonplateau":
            warm = max(1, sch.WARMUP_COSINE_DECAY_EPOCHS * steps_per_epoch)
        ctrl = PlateauController(
            factor=float(sch.REDUCEONPLATEAU_FACTOR),
            patience=int(sch.REDUCEONPLATEAU_PATIENCE),
            min_lr=float(sch.MIN_LR[0] if isinstance(sch.MIN_LR, (list, tuple)) else sch.MIN_LR),
            base_lr=lr,
        )
        if warm:
            schedule = optax.linear_schedule(init_value=0.0, end_value=1.0, transition_steps=warm)
            ctrl.warmup_schedule = schedule
        return lr, ctrl
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
        self.warmup_schedule = None

    def step(self, val_loss: float) -> float:
        """Update with the epoch's validation loss; returns the current lr."""
        if val_loss < self.best - 1e-12:
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

    schedule, plateau = build_schedule(cfg, lr, steps_per_epoch)
    if plateau is not None:
        # lr is a mutable hyperparam the host scales after validation.
        schedule = lr

    if name == "ADAMW":
        opt_fn = lambda learning_rate: optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=wd)
    elif name == "ADAM":
        opt_fn = lambda learning_rate: optax.adam(learning_rate, b1=b1, b2=b2)
    elif name == "SGD":
        opt_fn = lambda learning_rate: optax.sgd(learning_rate, momentum=0.9)
    else:
        raise ValueError(f"Unknown optimizer: {name} (expected SGD/ADAM/ADAMW)")

    tx = optax.inject_hyperparams(opt_fn)(learning_rate=schedule)
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
