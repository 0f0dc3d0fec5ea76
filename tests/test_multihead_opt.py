"""Per-head optimizers (VERDICT r2 #9; reference engine/__init__.py:21-106):
list-valued TRAIN.OPTIMIZER/LR -> one optimizer per loss head via
optax.multi_transform on structurally-derived head param labels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_head_param_labels_unet_class_head():
    from biapy_tpu.engine.schedulers import head_param_labels
    from biapy_tpu.models.unet_family import UNetFamily

    m = UNetFamily(variant="unet", ndim=2, feature_maps=(8, 16),
                   drop_values=(0.0, 0.0), conv_layers=(1, 1),
                   yx_down=(2, 2), z_down=(2, 2), isotropy=(True, True),
                   output_channels=(2, 3), output_channel_info=("BC", "class"))
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 1), np.float32))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, train=False)
    labels, n_heads = head_param_labels(m.apply, v, x, [2, 3], ["BC", "class"])
    assert n_heads == 2
    flat = jax.tree.leaves(labels)
    # backbone is shared (h0); exactly the class head's conv (kernel+bias)
    # belongs to h1
    assert flat.count("h1") == 2
    assert set(flat) == {"h0", "h1"}
    # the h1 leaves are the final class conv: kernel maps ->3 channels
    with_path = jax.tree_util.tree_leaves_with_path(labels)
    params_with_path = dict(jax.tree_util.tree_leaves_with_path(v["params"]))
    for path, lab in with_path:
        if lab == "h1":
            leaf = params_with_path[path]
            assert leaf.shape[-1] == 3, (path, leaf.shape)


def test_multihead_optimizer_applies_per_head_lr():
    import optax

    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.schedulers import build_multihead_optimizer

    cfg = get_cfg_defaults()
    cfg.defrost()
    cfg.TRAIN.OPTIMIZER = ["SGD", "SGD"]
    cfg.TRAIN.LR = [1.0, 0.1]
    cfg.TRAIN.W_DECAY = 0.0
    params = {"backbone": jnp.ones((3,)), "cls": jnp.ones((3,))}
    labels = {"backbone": "h0", "cls": "h1"}
    tx, plateau = build_multihead_optimizer(cfg, 10, labels, 2)
    st = tx.init(params)
    g = {"backbone": jnp.ones((3,)), "cls": jnp.ones((3,))}
    upd, _ = tx.update(g, st, params)
    # SGD(momentum): first update = -lr * grad ... optax sgd with momentum
    # applies trace; first step trace == grad -> update = -lr * grad (nesterov
    # doubles-ish); just assert the RATIO between heads is the LR ratio
    r = float(upd["backbone"][0] / upd["cls"][0])
    assert abs(r - 10.0) < 1e-4, r


def test_scale_learning_rates_keeps_ratio():
    import optax

    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.schedulers import (build_multihead_optimizer,
                                             get_learning_rate,
                                             scale_learning_rates)

    cfg = get_cfg_defaults()
    cfg.defrost()
    cfg.TRAIN.OPTIMIZER = ["ADAMW", "ADAMW"]
    cfg.TRAIN.LR = [1e-3, 1e-4]
    params = {"a": jnp.ones((2,)), "b": jnp.ones((2,))}
    labels = {"a": "h0", "b": "h1"}
    tx, _ = build_multihead_optimizer(cfg, 10, labels, 2)
    st = tx.init(params)
    st2 = scale_learning_rates(st, 0.5)
    from biapy_tpu.engine.schedulers import _find_inject_states

    lrs = sorted(float(s.hyperparams["learning_rate"])
                 for s in _find_inject_states(st2))
    assert np.allclose(lrs, [5e-5, 5e-4])
