"""Parameter-count parity vs the reference torch models (VERDICT r2 #8).

Two layers of defense:
- fast pinned goldens (these numbers were verified EXACT against the live
  reference models; provenance per family in docs/PARITY.md), and
- live comparisons that instantiate the reference torch model from
  /root/reference and count parameters (slow marker: they import torch
  modules through tests/_reference_loader).

The U-Net family's goldens live in tests/test_models_unet.py.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def n_params(v):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))


# ---------------------------------------------------------------------------
# fast: pinned goldens (verified exact vs the reference, see docs/PARITY.md)
# ---------------------------------------------------------------------------
def _build(name):
    from biapy_tpu.models.hrnet import HRNet
    from biapy_tpu.models.mae import MAE
    from biapy_tpu.models.sr_models import DFCAN, EDSR, RCAN, WDSR
    from biapy_tpu.models.stunet import STUNet
    from biapy_tpu.models.unetr import UNETR

    if name == "stunet_small":
        m = STUNet(ndim=3, variant="small", output_channels=(1,), z_down=(1, 2, 2, 2, 2))
        return m, jnp.zeros((1, 16, 64, 64, 1)), RNGS
    if name == "stunet_base":
        m = STUNet(ndim=3, variant="base", output_channels=(1,), z_down=(1, 2, 2, 2, 2))
        return m, jnp.zeros((1, 16, 64, 64, 1)), RNGS
    if name.startswith("hrnet"):
        m = HRNet(ndim=2, variant=name[5:], output_channels=(2,), normalization="bn")
        return m, jnp.zeros((1, 64, 64, 1)), RNGS
    if name == "unetr":
        m = UNETR(ndim=2, img_size=64, patch_size=16, embed_dim=96, depth=4,
                  num_heads=4, norm="bn")
        return m, jnp.zeros((1, 64, 64, 1)), RNGS
    if name == "mae":
        m = MAE(ndim=2, img_size=64, patch_size=16, embed_dim=96, depth=4,
                num_heads=4, dec_embed_dim=64, dec_depth=2, dec_num_heads=4)
        return m, jnp.zeros((1, 64, 64, 1)), {**RNGS, "mask": jax.random.PRNGKey(2)}
    if name == "edsr":
        return EDSR(ndim=2, scale=2, num_filters=32, num_res_blocks=4), jnp.zeros((1, 32, 32, 1)), RNGS
    if name == "rcan":
        return RCAN(ndim=2, scale=2, filters=16, num_rg=2, num_rcab=2, reduction=4), jnp.zeros((1, 32, 32, 1)), RNGS
    if name == "wdsr":
        return WDSR(ndim=2, scale=2, num_filters=16, num_res_blocks=3,
                    res_block_expansion=6), jnp.zeros((1, 32, 32, 1)), RNGS
    if name == "dfcan":
        return DFCAN(ndim=2, scale=2, n_resgroup=2, n_rcab=2), jnp.zeros((1, 32, 32, 1)), RNGS
    raise KeyError(name)


GOLDEN = {
    "stunet_small": 14_544_355,
    "stunet_base": 58_158_019,
    "hrnet18": 9_561_650,
    "hrnet32": 29_305_346,
    "unetr": 1_517_921,
    "mae": 598_048,
    "edsr": 120_833,
    "rcan": 35_697,
    "wdsr": 84_484,
    "dfcan": 594_385,
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_param_count_golden(name):
    m, x, rngs = _build(name)
    v = m.init(rngs, x, train=False)
    assert n_params(v) == GOLDEN[name], name


# ---------------------------------------------------------------------------
# slow: live comparison against the reference torch models
# ---------------------------------------------------------------------------
def _ref_env():
    """Load the reference package env: biapy.models.* resolvable, timm
    replaced by param-equivalent stand-ins (timm is not installed; its ViT
    Block/Mlp parameter structure is standard and reproduced exactly)."""
    import torch.nn as tnn

    import _reference_loader as RL

    class Block(tnn.Module):
        def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=True,
                     norm_layer=tnn.LayerNorm, **kw):
            super().__init__()
            self.norm1 = norm_layer(dim)
            self.qkv = tnn.Linear(dim, 3 * dim, bias=qkv_bias)
            self.proj = tnn.Linear(dim, dim)
            self.norm2 = norm_layer(dim)
            h = int(dim * mlp_ratio)
            self.fc1 = tnn.Linear(dim, h)
            self.fc2 = tnn.Linear(h, dim)

    class Mlp(tnn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     bias=True, **kw):
            super().__init__()
            self.fc1 = tnn.Linear(in_features, hidden_features or in_features, bias=bias)
            self.fc2 = tnn.Linear(hidden_features or in_features,
                                  out_features or in_features, bias=bias)

    tvt = types.ModuleType("timm.models.vision_transformer")
    tvt.Block = Block
    tvt.VisionTransformer = type("VisionTransformer", (tnn.Module,), {})
    tlayers = types.ModuleType("timm.layers")
    tlayers.Mlp = Mlp
    timm_mod = types.ModuleType("timm")
    timm_mod.__path__ = []
    timm_models = types.ModuleType("timm.models")
    timm_models.__path__ = []
    for k, v in [("timm", timm_mod), ("timm.models", timm_models),
                 ("timm.models.vision_transformer", tvt), ("timm.layers", tlayers)]:
        sys.modules[k] = v
    if "biapy" not in sys.modules:
        pkg = types.ModuleType("biapy")
        pkg.__path__ = ["/root/reference/biapy"]
        sys.modules["biapy"] = pkg
        mpkg = types.ModuleType("biapy.models")
        mpkg.__path__ = ["/root/reference/biapy/models"]
        sys.modules["biapy.models"] = mpkg
        RL.load_ref("biapy/models/blocks.py", "biapy.models.blocks")
        RL.load_ref("biapy/models/heads.py", "biapy.models.heads")
        RL.load_ref("biapy/models/tr_layers.py", "biapy.models.tr_layers")
        RL.load_ref("biapy/models/sam3_vit.py", "biapy.models.sam3_vit")
    return RL


def _nref(net):
    return sum(p.numel() for p in net.parameters())


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["small", "base", "large"])
def test_stunet_live_parity(variant):
    RL = _ref_env()
    m = RL.load_ref("biapy/models/stunet.py", "ref_stunet_live")
    cls = {"small": m.STUNet_small, "base": m.STUNet_base, "large": m.STUNet_large}[variant]
    net = cls(image_shape=(16, 64, 64, 1), output_channels=[1], deep_supervision=False)
    from biapy_tpu.models.stunet import STUNet

    mm = STUNet(ndim=3, variant=variant, output_channels=(1,), z_down=(1, 2, 2, 2, 2))
    v = mm.init(RNGS, jnp.zeros((1, 16, 64, 64, 1)), train=False)
    assert n_params(v) == _nref(net)


@pytest.mark.slow
@pytest.mark.parametrize("base,oc", [(18, 2), (32, 1)])
def test_hrnet_live_parity(base, oc):
    RL = _ref_env()
    m = RL.load_ref("biapy/models/hrnet.py", "ref_hrnet_live")
    nb = [2, 3, 4]
    cfgd = {"Z_DOWN": [2, 2, 2], "YX_DOWN": [2, 2, 2], "BLOCK_TYPE": "BASIC",
            "NUM_STAGES": 3, "NUM_MODULES": [1, 4, 3], "NUM_BRANCHES": nb,
            "NUM_BLOCKS": [[4] * b for b in nb],
            "NUM_CHANNELS": [[base * (2 ** i) for i in range(b)] for b in nb]}
    net = m.HighResolutionNet(cfg=cfgd, image_shape=(64, 64, 1),
                              normalization="bn", output_channels=[oc],
                              head_type="FCN")
    from biapy_tpu.models.hrnet import HRNet

    mm = HRNet(ndim=2, variant=str(base), output_channels=(oc,), normalization="bn")
    v = mm.init(RNGS, jnp.zeros((1, 64, 64, 1)), train=False)
    assert n_params(v) == _nref(net)


@pytest.mark.slow
def test_sr_family_live_parity():
    RL = _ref_env()
    from biapy_tpu.models.sr_models import DFCAN, EDSR, RCAN, WDSR

    m = RL.load_ref("biapy/models/edsr.py", "ref_edsr_live")
    net = m.EDSR(ndim=2, num_filters=32, num_of_residual_blocks=4,
                 upsampling_factor=2, num_channels=1)
    v = EDSR(ndim=2, scale=2, num_filters=32, num_res_blocks=4).init(
        RNGS, jnp.zeros((1, 32, 32, 1)), train=False)
    assert n_params(v) == _nref(net)

    m = RL.load_ref("biapy/models/rcan.py", "ref_rcan_live")
    net = m.rcan(ndim=2, num_channels=1, filters=16, scale=2, num_rg=2,
                 num_rcab=2, reduction=4)
    v = RCAN(ndim=2, scale=2, filters=16, num_rg=2, num_rcab=2, reduction=4).init(
        RNGS, jnp.zeros((1, 32, 32, 1)), train=False)
    assert n_params(v) == _nref(net)

    m = RL.load_ref("biapy/models/wdsr.py", "ref_wdsr_live")
    net = m.wdsr(scale=2, num_filters=16, num_res_blocks=3,
                 res_block_expansion=6, num_channels=1)
    v = WDSR(ndim=2, scale=2, num_filters=16, num_res_blocks=3,
             res_block_expansion=6).init(RNGS, jnp.zeros((1, 32, 32, 1)), train=False)
    assert n_params(v) == _nref(net)

    m = RL.load_ref("biapy/models/dfcan.py", "ref_dfcan_live")
    net = m.DFCAN(ndim=2, input_shape=(32, 32, 1), scale=2, n_ResGroup=2, n_RCAB=2)
    v = DFCAN(ndim=2, scale=2, n_resgroup=2, n_rcab=2).init(
        RNGS, jnp.zeros((1, 32, 32, 1)), train=False)
    assert n_params(v) == _nref(net)


@pytest.mark.slow
def test_mae_unetr_live_parity():
    RL = _ref_env()
    m = RL.load_ref("biapy/models/mae.py", "ref_mae_live")
    net = m.MaskedAutoencoderViT(img_size=64, patch_size=16, in_chans=1, ndim=2,
                                 embed_dim=96, depth=4, num_heads=4,
                                 decoder_embed_dim=64, decoder_depth=2,
                                 decoder_num_heads=4)
    from biapy_tpu.models.mae import MAE

    mm = MAE(ndim=2, img_size=64, patch_size=16, embed_dim=96, depth=4,
             num_heads=4, dec_embed_dim=64, dec_depth=2, dec_num_heads=4)
    v = mm.init({**RNGS, "mask": jax.random.PRNGKey(2)},
                jnp.zeros((1, 64, 64, 1)), train=False)
    assert n_params(v) == _nref(net)

    m = RL.load_ref("biapy/models/unetr.py", "ref_unetr_live")
    from biapy_tpu.models.unetr import UNETR

    for norm in ("bn", "none"):
        net = m.UNETR(input_shape=(64, 64, 1), patch_size=16, embed_dim=96,
                      depth=4, num_heads=4, normalization=norm)
        mm = UNETR(ndim=2, img_size=64, patch_size=16, embed_dim=96, depth=4,
                   num_heads=4, norm=norm)
        v = mm.init(RNGS, jnp.zeros((1, 64, 64, 1)), train=False)
        assert n_params(v) == _nref(net), norm
