"""STUNet pretrained-encoder loading from a local OrgMIM-format torch
checkpoint (reference: load_stunet_pretrained_encoder_from_ckpt,
stunet.py:481; build_stunet pretrained :571)."""

import numpy as np
import pytest


def _synthetic_orgmim_ckpt(flax_params, depth):
    """Build an OrgMIM-style torch checkpoint whose encoder tensors mirror
    the flax tree's shapes, with distinct random values."""
    import torch

    rng = np.random.default_rng(5)
    sd = {}
    mod_of = {"Conv_0": "conv1", "GroupNorm_0": "norm1",
              "Conv_1": "conv2", "GroupNorm_1": "norm2", "Conv_2": "conv3"}
    role_of = {"kernel": "weight", "scale": "weight", "bias": "bias"}
    # walk flax encoder blocks -> torch (stage, i) keys
    n_enc = sum(depth)
    for b in range(n_enc):
        stage, off = 0, 0
        while b - off >= depth[stage]:
            off += depth[stage]
            stage += 1
        i = b - off
        blk = flax_params[f"BasicResBlock_{b}"]
        for sub, leaves in blk.items():
            for role, arr in leaves.items():
                w = rng.normal(size=arr.shape).astype(np.float32)
                if role == "kernel":  # flax (*k, I, O) -> torch (O, I, *k)
                    w = np.transpose(w, (w.ndim - 1, w.ndim - 2) + tuple(range(w.ndim - 2)))
                key = (f"encoder.sp_cnn.conv_blocks_context.{stage}.{i}."
                       f"{mod_of[sub]}.{role_of[role]}")
                sd[key] = torch.from_numpy(w)
    # decoder noise the loader must ignore (strict=False parity)
    sd["decoder.some_head.weight"] = torch.zeros(3, 3)
    return {"model_weights": sd, "epoch": 7}


def test_load_stunet_pretrained_orgmim(tmp_path):
    import jax
    import jax.numpy as jnp
    import torch

    from biapy_tpu.models.stunet import STUNet, VARIANTS, load_stunet_pretrained

    model = STUNet(ndim=3, variant="small", output_channels=(1,),
                   z_down=(2, 2, 2, 2, 2))
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    depth = list(VARIANTS["small"]["depth"])

    ckpt = _synthetic_orgmim_ckpt(params, depth)
    path = str(tmp_path / "orgmim_small.ckpt")
    torch.save(ckpt, path)

    new, n = load_stunet_pretrained(path, params, variant="small")
    # every encoder tensor placed
    n_expected = sum(len(leaves) for b in range(sum(depth))
                     for leaves in params[f"BasicResBlock_{b}"].values())
    assert n == n_expected

    # bit-exact placement: torch conv1 of stage 2 block 0 lands on the right
    # flax block with the (O,I,*k)->(*k,I,O) transpose
    sd = ckpt["model_weights"]
    b2 = sum(depth[:2])
    tw = sd[f"encoder.sp_cnn.conv_blocks_context.2.0.conv1.weight"].numpy()
    fw = np.asarray(new[f"BasicResBlock_{b2}"]["Conv_0"]["kernel"])
    assert np.array_equal(fw, np.transpose(tw, (2, 3, 4, 1, 0)))
    # norm scale/bias land on GroupNorm scale/bias (not swapped)
    ts = sd["encoder.sp_cnn.conv_blocks_context.0.0.norm2.weight"].numpy()
    tb = sd["encoder.sp_cnn.conv_blocks_context.0.0.norm2.bias"].numpy()
    assert np.array_equal(np.asarray(new["BasicResBlock_0"]["GroupNorm_1"]["scale"]), ts)
    assert np.array_equal(np.asarray(new["BasicResBlock_0"]["GroupNorm_1"]["bias"]), tb)

    # decoder params untouched (encoder-only, strict=False parity)
    n_enc = sum(depth)
    dec_key = f"BasicResBlock_{n_enc}"
    assert np.array_equal(np.asarray(new[dec_key]["Conv_0"]["kernel"]),
                          np.asarray(params[dec_key]["Conv_0"]["kernel"]))

    # loaded params still run
    out = model.apply({"params": new}, x, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_load_stunet_pretrained_wrong_variant(tmp_path):
    import jax
    import jax.numpy as jnp
    import torch

    from biapy_tpu.models.stunet import STUNet, VARIANTS, load_stunet_pretrained

    model = STUNet(ndim=3, variant="small", output_channels=(1,))
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    ckpt = _synthetic_orgmim_ckpt(params, list(VARIANTS["small"]["depth"]))
    path = str(tmp_path / "orgmim.ckpt")
    torch.save(ckpt, path)
    # base dims don't match a small checkpoint -> clear error, not silence
    base = STUNet(ndim=3, variant="base", output_channels=(1,))
    bparams = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    with pytest.raises(ValueError, match="VARIANT"):
        load_stunet_pretrained(path, bparams, variant="base")


def test_load_stunet_pretrained_missing_file():
    from biapy_tpu.models.stunet import load_stunet_pretrained

    with pytest.raises(FileNotFoundError, match="No network access"):
        load_stunet_pretrained("/nonexistent/stunet.ckpt", {}, variant="base")
