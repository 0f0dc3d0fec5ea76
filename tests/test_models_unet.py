import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biapy_tpu.models.unet_family import UNetFamily

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def build(variant, **kw):
    base = dict(
        variant=variant, ndim=2, feature_maps=(16, 32, 64), drop_values=(0.1,) * 3,
        conv_layers=(2, 2, 2), yx_down=(2, 2, 2), z_down=(2, 2, 2), isotropy=(True,),
        normalization="none", output_channels=(1,), activation="elu",
    )
    base.update(kw)
    return UNetFamily(**base)


def n_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


# Golden parameter counts verified bit-exact against the reference torch
# models (biapy/models/{unet,resunet,seunet,attention_unet,resunet_se}.py)
# with feature_maps=[16,32,64], conv_layers=[2,2,2], larger_io=True.
GOLDEN = {
    ("unet", "none"): 125_745,
    ("unet", "bn"): 126_545,
    ("resunet", "none"): 154_369,
    ("seunet", "none"): 127_409,
    ("attention_unet", "none"): 127_099,
    ("resunet_se", "none"): 208_449,
}


@pytest.mark.parametrize("variant,norm", list(GOLDEN))
def test_param_count_parity(variant, norm):
    m = build(variant, normalization=norm)
    v = m.init(RNGS, jnp.zeros((1, 64, 64, 1)), train=False)
    assert n_params(v) == GOLDEN[(variant, norm)]


@pytest.mark.parametrize("variant", ["unet", "resunet", "seunet", "resunet_se", "attention_unet"])
def test_forward_2d(variant):
    m = build(variant)
    x = jnp.zeros((2, 64, 64, 1))
    v = m.init(RNGS, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 64, 64, 1)


def test_forward_3d_anisotropic_multihead():
    m = UNetFamily(
        variant="resunet", ndim=3, feature_maps=(8, 16, 32), drop_values=(0, 0, 0),
        conv_layers=(2, 2, 2), yx_down=(2, 2, 2), z_down=(1, 2, 2),
        isotropy=(False, True, True), output_channels=(2, 1), output_channel_info=("F", "D"),
    )
    x = jnp.zeros((1, 8, 32, 32, 1))
    v = m.init(RNGS, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 8, 32, 32, 3)


def test_class_head_and_contrast():
    m = build("unet", output_channels=(3,), contrast=True, contrast_proj_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 1))
    v = m.init(RNGS, x, train=False)
    out = m.apply(v, x, train=False)
    assert set(out) == {"pred", "embed"}
    assert out["pred"].shape == (1, 32, 32, 3)
    assert out["embed"].shape == (1, 32, 32, 64)
    # embeddings are L2-normalized
    norms = jnp.linalg.norm(out["embed"], axis=-1)
    assert np.allclose(np.asarray(norms), 1.0, atol=1e-4)


def test_separated_decoders_and_sr():
    m = build(
        "unet", output_channels=(1, 1), output_channel_info=("F", "D"),
        separated_decoders=True, divide_decoder_feature_maps=True,
        upsampling_factor=(2, 2), upsampling_position="post",
    )
    x = jnp.zeros((1, 32, 32, 1))
    v = m.init(RNGS, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 2)


def test_batchnorm_train_updates_stats():
    m = build("unet", normalization="bn")
    x = jnp.ones((2, 32, 32, 1))
    v = m.init(RNGS, x, train=True)
    assert "batch_stats" in v
    out, updates = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
    assert "batch_stats" in updates


def test_upsampling_mode():
    m = build("unet", upsample_layer="upsampling")
    x = jnp.zeros((1, 32, 32, 1))
    v = m.init(RNGS, x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 32, 32, 1)


def test_jit_forward():
    m = build("unet")
    x = jnp.zeros((1, 64, 64, 1))
    v = m.init(RNGS, x, train=False)
    f = jax.jit(lambda vv, xx: m.apply(vv, xx, train=False))
    out = f(v, x)
    assert out.shape == (1, 64, 64, 1)


def test_stunet_3d():
    from biapy_tpu.models.stunet import STUNet

    m = STUNet(ndim=3, variant="small", output_channels=(1,), z_down=(1, 2, 2, 2, 2))
    x = jnp.zeros((1, 8, 64, 64, 1))
    v = m.init(RNGS, x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 8, 64, 64, 1)


def test_hrnet_2d():
    from biapy_tpu.models.hrnet import HRNet

    m = HRNet(ndim=2, variant="18", output_channels=(2,))
    x = jnp.zeros((1, 64, 64, 1))
    v = m.init(RNGS, x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 64, 64, 2)


def test_zoo_small_models():
    from biapy_tpu.models.multiresunet import MultiResUNet
    from biapy_tpu.models.nafnet import NAFNet, PatchGANDiscriminator
    from biapy_tpu.models.resunet_pp import ResUNetPlusPlus
    from biapy_tpu.models.simple_cnn import SimpleCNN
    from biapy_tpu.models.sr_models import DFCAN, EDSR, RCAN, WDSR
    from biapy_tpu.models.unext import UNeXt
    from biapy_tpu.models.unetr import UNETR
    from biapy_tpu.models.vit import ViT

    x = jnp.zeros((1, 32, 32, 1))
    cases = [
        (ResUNetPlusPlus(ndim=2, feature_maps=(8, 16, 32, 64), drop_values=(0,) * 4,
                         conv_layers=(1, 1, 1, 1), yx_down=(2, 2, 2, 2), z_down=(2, 2, 2, 2),
                         isotropy=(True,)), (1, 32, 32, 1)),
        (UNeXt(version=1, ndim=2, feature_maps=(8, 16), cn_layers=(1, 1),
               yx_down=(2, 2), z_down=(2, 2)), (1, 32, 32, 1)),
        (EDSR(ndim=2, scale=2, num_res_blocks=1), (1, 64, 64, 1)),
        (RCAN(ndim=2, scale=2, num_rg=1, num_rcab=1), (1, 64, 64, 1)),
        (WDSR(ndim=2, scale=2, num_res_blocks=1), (1, 64, 64, 1)),
        (DFCAN(ndim=2, scale=2, n_resgroup=1, n_rcab=1), (1, 64, 64, 1)),
        (NAFNet(width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)), (1, 32, 32, 1)),
        (UNETR(ndim=2, img_size=32, patch_size=16, embed_dim=64, depth=4, num_heads=4), (1, 32, 32, 1)),
        (MultiResUNet(ndim=2, input_channels=1, z_down=(2, 2, 2, 2)), (1, 32, 32, 1)),
    ]
    for m, want in cases:
        v = m.init(RNGS, x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == want, (type(m).__name__, out.shape)
    # classifiers
    m = SimpleCNN(ndim=2, n_classes=3)
    v = m.init(RNGS, x, train=False)
    assert m.apply(v, x, train=False)["class"].shape == (1, 3)
    m = ViT(ndim=2, img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4, n_classes=3)
    v = m.init(RNGS, x, train=False)
    assert m.apply(v, x, train=False)["class"].shape == (1, 3)
    m = PatchGANDiscriminator(base_filters=8)
    v = m.init(RNGS, x, train=False)
    assert m.apply(v, x, train=False).shape[0] == 1


def test_sam3_vit_encoder_forward():
    """SAM3 encoder builds and runs (tiny grid), windowed + global blocks
    both exercised; UNETR integrates it as a backbone."""
    import jax
    import jax.numpy as jnp
    from biapy_tpu.models.sam3_vit import SAM3ViTEncoder, axial_rope_tables

    cos, sin = axial_rope_tables(64, 4, 4)
    assert cos.shape == (16, 32) and abs(float(cos[0, 0]) - 1.0) < 1e-6

    # shrink the geometry for test speed by monkeypatching params
    import biapy_tpu.models.sam3_vit as sv

    orig = dict(sv.SAM3_VIT_PARAMS)
    sv.SAM3_VIT_PARAMS.update(depth=3, embed_dim=64, num_heads=4,
                              window_size=2, global_attn_indexes=(1,))
    try:
        enc = SAM3ViTEncoder(img_size=56, patch_size=14, in_channels=1,
                             save_layers=(1, 2))
        v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 1)))
        out, saved = enc.apply(v, jnp.zeros((2, 56, 56, 1)), features=True,
                               save_layers=(1, 2))
        assert out.shape == (2, 16, 64)
        assert len(saved) == 2 and saved[0].shape == (2, 16, 64)
    finally:
        sv.SAM3_VIT_PARAMS.update(orig)


def test_unetr_sam3_backbone_builds():
    import jax, jax.numpy as jnp
    import biapy_tpu.models.sam3_vit as sv
    from biapy_tpu.models.unetr import UNETR

    orig = dict(sv.SAM3_VIT_PARAMS)
    sv.SAM3_VIT_PARAMS.update(depth=4, embed_dim=64, num_heads=4,
                              window_size=2, global_attn_indexes=(1,))
    try:
        m = UNETR(ndim=2, img_size=64, patch_size=16, in_channels=1,
                  embed_dim=64, depth=4, num_heads=4, output_channels=(1,),
                  backbone="sam3_vit", vit_hidden_multiple=1, decoder_filters=4)
        v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   jnp.zeros((1, 64, 64, 1)), train=False)
        y = m.apply(v, jnp.zeros((1, 64, 64, 1)), train=False)
        y = y["pred"] if isinstance(y, dict) else y
        assert y.shape == (1, 64, 64, 1)
    finally:
        sv.SAM3_VIT_PARAMS.update(orig)


def test_efficientnet_builds_and_forwards():
    """EfficientNet classifier (reference wraps torchvision; ours is a
    first-party Flax implementation, models/efficientnet.py)."""
    import jax
    import numpy as np

    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.models import build_model

    cfg = get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "CLASSIFICATION", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (64, 64, 3), "N_CLASSES": 4},
        "MODEL": {"ARCHITECTURE": "efficientnet_b0"},
    })
    m, _ = build_model(cfg, [4], ["class"], ["linear"])
    v = m.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=False)
    out = m.apply(v, np.zeros((2, 64, 64, 3), np.float32), train=False)
    out = out["class"] if isinstance(out, dict) else out
    assert out.shape == (2, 4)


@pytest.mark.parametrize("head", ["FCN", "ASPP", "PSP", "OCR"])
def test_hrnet_head_types(head):
    """Every accepted MODEL.HRNET.HEAD_TYPE must change the graph (VERDICT
    r2 #4; reference hrnet.py:675-725) and still emit output_channels
    logits at full resolution."""
    from biapy_tpu.models.hrnet import HRNet

    m = HRNet(ndim=2, variant="18", output_channels=(3,), num_stages=1,
              num_modules=(1,), num_blocks=1, head_type=head)
    x = jnp.zeros((1, 32, 32, 1))
    v = m.init(RNGS, x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 32, 32, 3)
    names = {k for k in jax.tree_util.tree_leaves_with_path(v["params"])
             for k in [jax.tree_util.keystr(k[0])]}
    joined = " ".join(sorted(names))
    if head == "OCR":
        assert "OCRHead_0" in joined
    elif head == "PSP":
        assert "PSP_0" in joined
    elif head == "ASPP":
        assert "ASPP_0" in joined
    else:
        assert "OCRHead" not in joined and "PSP_0" not in joined


@pytest.mark.parametrize("head", ["ASPP", "PSP"])
def test_hrnet_head_types_3d(head):
    from biapy_tpu.models.hrnet import HRNet

    m = HRNet(ndim=3, variant="18", output_channels=(2,), num_stages=1,
              num_modules=(1,), num_blocks=1, head_type=head)
    x = jnp.zeros((1, 16, 16, 16, 1))
    v = m.init(RNGS, x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 16, 16, 16, 2)


@pytest.mark.parametrize("bt", ["BOTTLENECK", "CONVNEXT_V1", "CONVNEXT_V2"])
def test_hrnet_block_types(bt):
    """MODEL.HRNET.BLOCK_TYPE selects the branch block (reference
    hrnet.py:551); BOTTLENECK widens branches x4 (hrnet.py:638)."""
    from biapy_tpu.models.hrnet import HRNet

    m = HRNet(ndim=2, variant="18", output_channels=(1,), num_stages=1,
              num_modules=(1,), num_blocks=1, block_type=bt)
    x = jnp.zeros((1, 32, 32, 1))
    v = m.init(RNGS, x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 32, 32, 1)
    joined = " ".join(jax.tree_util.keystr(p)
                      for p, _ in jax.tree_util.tree_leaves_with_path(v["params"]))
    if bt == "BOTTLENECK":
        assert "Bottleneck" in joined.replace("HRModule_0", "")
    else:
        assert "ConvNeXtBlock" in joined


def test_hrnet_ocr_rejects_many_heads():
    from biapy_tpu.models import build_model
    from biapy_tpu.config.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.defrost()
    cfg.MODEL.ARCHITECTURE = "hrnet18"
    cfg.MODEL.HRNET.HEAD_TYPE = "OCR"
    with pytest.raises(ValueError, match="at most two"):
        build_model(cfg, [2, 1, 1], ["F", "class", "x"], [None, None, None])


# ---------------------------------------------------------------------------
# z-folded 4D mode (models/blocks.py fold3d): bit-equivalence vs the 5D path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("variant", ["unet", "resunet", "seunet",
                                     "resunet_se", "attention_unet"])
def test_fold3d_matches_5d(monkeypatch, variant):
    """BIAPY_TPU_FOLD3D=1 (the TPU default) must reproduce the 5D path's
    forward exactly for every UNet-family variant, batch 1 and 2 (seam
    masks), through pooling/upsampling depth changes."""
    import os

    import jax

    from biapy_tpu.models.unet_family import UNetFamily

    rng = np.random.default_rng(3)
    m = UNetFamily(variant=variant, ndim=3, feature_maps=(8, 16),
                   drop_values=(0.0, 0.0), normalization="bn",
                   conv_layers=(2, 2), z_down=(2,), yx_down=(2,),
                   larger_io=True)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 1)), jnp.float32)
    monkeypatch.setenv("BIAPY_TPU_FOLD3D", "0")
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y5 = m.apply(v, x, train=False)
    y5t, bs5 = m.apply(v, x, train=True, mutable=["batch_stats"])
    monkeypatch.setenv("BIAPY_TPU_FOLD3D", "1")
    # identical param tree: fold must not change module structure
    v1 = m.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_map(lambda a: a.shape, v) == \
        jax.tree_util.tree_map(lambda a: a.shape, v1)
    y4 = m.apply(v, x, train=False)
    y4t, bs4 = m.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y5), np.asarray(y4), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y5t), np.asarray(y4t), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs5), jax.tree_util.tree_leaves(bs4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fold3d_gradients_match_5d(monkeypatch):
    """Folded-mode gradients equal the 5D path's (custom vjps + seam masks
    differentiate correctly)."""
    import jax

    from biapy_tpu.models.unet_family import UNetFamily

    rng = np.random.default_rng(4)
    m = UNetFamily(variant="resunet", ndim=3, feature_maps=(8, 16),
                   drop_values=(0.0, 0.0), normalization="bn",
                   conv_layers=(2, 2), z_down=(2,), yx_down=(2,))
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 1)), jnp.float32)

    def loss(params, bs):
        out, _ = m.apply({"params": params, "batch_stats": bs}, x, train=True,
                         mutable=["batch_stats"])
        return jnp.mean((out - y) ** 2)

    monkeypatch.setenv("BIAPY_TPU_FOLD3D", "0")
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    g5 = jax.grad(loss)(v["params"], v.get("batch_stats", {}))
    monkeypatch.setenv("BIAPY_TPU_FOLD3D", "1")
    g4 = jax.grad(loss)(v["params"], v.get("batch_stats", {}))
    for a, b in zip(jax.tree_util.tree_leaves(g5), jax.tree_util.tree_leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fold3d_convtranspose_and_pool_units(monkeypatch):
    """Folded ConvTranspose (per-z-tap 2D transposed convs + row interleave)
    and folded max_pool are bit-exact vs their 5D references across scales,
    including anisotropic (1, 2, 2)."""
    import jax
    from flax import linen as nn

    from biapy_tpu.models import blocks as B

    rng = np.random.default_rng(5)
    for b, scale in [(1, (2, 2, 2)), (2, (2, 2, 2)), (2, (1, 2, 2)),
                     (1, (3, 2, 2))]:
        d, h, w, cin, co = 4, 6, 6, 5, 7
        x = jnp.asarray(rng.standard_normal((b, d, h, w, cin)), jnp.float32)
        ref_m = nn.ConvTranspose(co, kernel_size=scale, strides=scale)
        m = B.ConvTranspose(co, kernel_size=scale, strides=scale)
        v = ref_m.init(jax.random.PRNGKey(1), x)
        ref = ref_m.apply(v, x)
        with B.fold3d(b):
            got = m.apply(v, x.reshape((b * d, h, w, cin)))
        np.testing.assert_allclose(np.asarray(ref),
                                   np.asarray(got.reshape(ref.shape)), atol=1e-5)
    for b, win in [(1, (2, 2, 2)), (2, (2, 2, 2)), (2, (1, 2, 2))]:
        d, h, w, c = 4, 8, 8, 3
        x = jnp.asarray(rng.standard_normal((b, d, h, w, c)), jnp.float32)
        ref = B.max_pool(x, win)
        with B.fold3d(b):
            got = B.max_pool(x.reshape((b * d, h, w, c)), win)
        np.testing.assert_allclose(np.asarray(ref),
                                   np.asarray(got.reshape(ref.shape)), atol=0)


def test_fold3d_convtranspose_fusedxla_equivalent(monkeypatch):
    """BIAPY_TPU_CONVT=fusedxla (one wide 2D transposed conv + XLA z
    depth-to-space, the r5 TPU default) must match the per-tap formulation
    (BIAPY_TPU_CONVT=pertap) bit-for-bit."""
    import numpy as np

    import biapy_tpu.models.blocks as B

    rng = np.random.default_rng(0)
    b, d, h, w, cin, co = 2, 4, 6, 6, 5, 7
    x = jnp.asarray(rng.standard_normal((b * d, h, w, cin)).astype(np.float32))
    m = B.ConvTranspose(co, kernel_size=(2, 2, 2), strides=(2, 2, 2))
    monkeypatch.setenv("BIAPY_TPU_CONVT", "pertap")
    with B.fold3d(b):
        v = m.init(jax.random.PRNGKey(0), x)
        base = np.asarray(m.apply(v, x))
    monkeypatch.setenv("BIAPY_TPU_CONVT", "fusedxla")
    with B.fold3d(b):
        alt = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(alt, base, rtol=1e-6, atol=1e-6)
