"""FID / IS / LPIPS test metrics and the VGG perceptual GAN term, loaded
from LOCAL torch checkpoints (reference: torchmetrics nets in
image_to_image.py:176-213; VGG perceptual, metrics.py:2593).

No torchvision in this environment, so the fixtures are synthetic state
dicts emitted in the exact torchvision / lpips-package key format from the
flax trees' shapes — this pins the name mapping and every transpose."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


def _synth_vgg16_sd(params):
    import torch

    sd = {}
    for name, leaves in params.items():
        idx = int(name.replace("conv", ""))
        k = np.asarray(leaves["kernel"])
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            np.random.default_rng(idx).normal(0, 0.05, k.shape).astype(np.float32)
            .transpose(3, 2, 0, 1).copy())
        sd[f"features.{idx}.bias"] = torch.zeros(k.shape[-1])
    return sd


def _synth_inception_sd(params):
    import torch

    rng = np.random.default_rng(0)

    def emit(prefix, node, sd):
        for k, v in node.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                emit(p, v, sd)
                continue
            a = rng.normal(0, 0.05, np.shape(v)).astype(np.float32)
            if p.endswith("conv.kernel"):
                sd[p.replace("conv.kernel", "conv.weight")] = torch.from_numpy(
                    a.transpose(3, 2, 0, 1).copy())
            elif p == "fc.kernel":
                sd["fc.weight"] = torch.from_numpy(a.T.copy())
            elif p == "fc.bias":
                sd["fc.bias"] = torch.from_numpy(a)
            elif p.endswith("bn.scale"):
                sd[p.replace("bn.scale", "bn.weight")] = torch.from_numpy(np.abs(a) + 0.5)
            elif p.endswith("bn.bias"):
                sd[p.replace("bn.bias", "bn.bias")] = torch.from_numpy(a)
            elif p.endswith("bn.mean"):
                sd[p.replace("bn.mean", "bn.running_mean")] = torch.from_numpy(a)
            elif p.endswith("bn.var"):
                sd[p.replace("bn.var", "bn.running_var")] = torch.from_numpy(np.abs(a) + 1.0)
        return sd

    return emit("", params, {})


def _synth_lpips_sd(params):
    """lpips-package format: backbone under net.slice{k}.{feat_idx}.*, lin
    calibration under lin{k}.model.1.weight."""
    import torch

    from biapy_tpu.models.feature_nets import (SQUEEZE_LPIPS_CHANNELS,
                                               _SQUEEZE_LAYOUT)

    rng = np.random.default_rng(1)
    # feature idx -> lpips slice number (slice boundaries of squeezenet1_1)
    slice_of = {0: 1, 3: 2, 4: 2, 6: 3, 7: 3, 9: 4, 10: 5, 11: 6, 12: 7}
    sd = {}
    for idx, kind, _ in _SQUEEZE_LAYOUT:
        if kind == "pool":
            continue
        sl = slice_of[idx]
        node = params[f"f{idx}"]
        if kind == "conv":
            k = np.asarray(node["kernel"])
            sd[f"net.slice{sl}.{idx}.weight"] = torch.from_numpy(
                rng.normal(0, 0.05, k.shape).astype(np.float32).transpose(3, 2, 0, 1).copy())
            sd[f"net.slice{sl}.{idx}.bias"] = torch.zeros(k.shape[-1])
        else:
            for sub in ("squeeze", "expand1x1", "expand3x3"):
                k = np.asarray(node[sub]["kernel"])
                sd[f"net.slice{sl}.{idx}.{sub}.weight"] = torch.from_numpy(
                    rng.normal(0, 0.05, k.shape).astype(np.float32).transpose(3, 2, 0, 1).copy())
                sd[f"net.slice{sl}.{idx}.{sub}.bias"] = torch.zeros(k.shape[-1])
    for i, c in enumerate(SQUEEZE_LPIPS_CHANNELS):
        sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.normal(0.1, 0.02, (1, c, 1, 1))).astype(np.float32))
    return sd


@pytest.fixture(scope="module")
def vgg_file(tmp_path_factory):
    import torch

    from biapy_tpu.models.feature_nets import VGG16Features, VGG16_RELU3_3

    net = VGG16Features(taps=(VGG16_RELU3_3,))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    p = str(tmp_path_factory.mktemp("w") / "vgg16.pth")
    torch.save(_synth_vgg16_sd(params), p)
    return p


def test_vgg16_perceptual_loss(vgg_file):
    from biapy_tpu.engine.perceptual import VGGPerceptualLoss

    loss = VGGPerceptualLoss(vgg_file)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 64, 1), np.float32))
    y = jnp.asarray(rng.random((2, 64, 64, 1), np.float32))
    same = float(loss(x, x))
    diff = float(loss(x, y))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > 1e-5
    # differentiable (usable inside the GAN generator loss)
    g = jax.grad(lambda a: loss(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    # 3D volumes fold depth into batch (reference: metrics.py VGG forward)
    v = jnp.asarray(rng.random((1, 4, 64, 64, 1), np.float32))
    assert np.isfinite(float(loss(v, v)))


def test_vgg16_relu3_3_channels(vgg_file):
    """features[:16] tap must be 256-channel at 1/4 resolution (torchvision
    vgg16 relu3_3) — pins the architecture."""
    from biapy_tpu.models.feature_nets import (VGG16Features, VGG16_RELU3_3,
                                               load_vgg16_weights)

    net = VGG16Features(taps=(VGG16_RELU3_3,))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    params, n = load_vgg16_weights(vgg_file, params)
    assert n == 14  # 7 convs x (kernel, bias) through relu3_3
    f = net.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))[0]
    assert f.shape == (1, 16, 16, 256)


def test_inception_v3_shapes_and_load(tmp_path):
    import torch

    from biapy_tpu.models.feature_nets import (InceptionV3,
                                               inception_preprocess,
                                               load_inception_weights)

    net = InceptionV3()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
    sd = _synth_inception_sd(params)
    # torchvision key-format sanity
    assert "Conv2d_1a_3x3.conv.weight" in sd
    assert "Mixed_5b.branch5x5_1.bn.running_mean" in sd
    assert "Mixed_7c.branch_pool.conv.weight" in sd
    p = str(tmp_path / "inception_v3.pth")
    torch.save(sd, p)
    params, n = load_inception_weights(p, params)
    assert n == len(sd)
    x = inception_preprocess(jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 1), np.float32)))
    assert x.shape == (2, 299, 299, 3)
    pool, logits = net.apply({"params": params}, x)
    assert pool.shape == (2, 2048) and logits.shape == (2, 1000)
    assert np.isfinite(np.asarray(pool)).all()


def test_fid_is_accumulator(tmp_path):
    import torch

    from biapy_tpu.engine.perceptual import PerceptualMetricsAccumulator
    from biapy_tpu.models.feature_nets import InceptionV3

    net = InceptionV3()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
    p = str(tmp_path / "inc.pth")
    torch.save(_synth_inception_sd(params), p)

    rng = np.random.default_rng(0)
    imgs = [rng.random((48, 48, 1), np.float32) for _ in range(4)]

    acc = PerceptualMetricsAccumulator(["fid", "is"], inception_path=p)
    for im in imgs:
        acc.update(im, im)  # identical sets
    out = acc.compute()
    assert out["fid"] == pytest.approx(0.0, abs=1e-3)
    assert np.isfinite(out["is"]) and out["is"] >= 1.0 - 1e-6

    acc2 = PerceptualMetricsAccumulator(["fid"], inception_path=p)
    for im in imgs:
        acc2.update(rng.random((48, 48, 1), np.float32) ** 3, im)
    assert acc2.compute()["fid"] > out["fid"]


def test_lpips_accumulator(tmp_path):
    import torch

    from biapy_tpu.engine.perceptual import PerceptualMetricsAccumulator
    from biapy_tpu.models.feature_nets import SqueezeNetFeatures

    net = SqueezeNetFeatures()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    p = str(tmp_path / "lpips_squeeze.pth")
    torch.save(_synth_lpips_sd(params), p)

    rng = np.random.default_rng(0)
    a = rng.random((64, 64, 1), np.float32)
    b = rng.random((64, 64, 1), np.float32)

    acc = PerceptualMetricsAccumulator(["lpips"], lpips_path=p)
    acc.update(a, a)
    assert acc.compute()["lpips"] == pytest.approx(0.0, abs=1e-6)
    acc2 = PerceptualMetricsAccumulator(["lpips"], lpips_path=p)
    acc2.update(a, b)
    assert acc2.compute()["lpips"] > 0


def test_fid_and_lpips_together(tmp_path):
    """Both metric families in ONE accumulator — regression for the
    late-binding closure bug where the LPIPS block's ``net`` rebinding leaked
    into the inception closure."""
    import torch

    from biapy_tpu.engine.perceptual import PerceptualMetricsAccumulator
    from biapy_tpu.models.feature_nets import InceptionV3, SqueezeNetFeatures

    inc = InceptionV3()
    ipar = inc.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
    p_inc = str(tmp_path / "inc.pth")
    torch.save(_synth_inception_sd(ipar), p_inc)
    sq = SqueezeNetFeatures()
    spar = sq.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    p_lp = str(tmp_path / "lp.pth")
    torch.save(_synth_lpips_sd(spar), p_lp)

    rng = np.random.default_rng(0)
    acc = PerceptualMetricsAccumulator(["fid", "is", "lpips"],
                                       inception_path=p_inc, lpips_path=p_lp)
    for _ in range(3):
        im = rng.random((48, 48, 1), np.float32)
        acc.update(im, im)
    out = acc.compute()
    assert set(out) == {"fid", "is", "lpips"}
    assert out["fid"] == pytest.approx(0.0, abs=1e-3)
    assert out["lpips"] == pytest.approx(0.0, abs=1e-6)


def test_squeezenet_tap_channels(tmp_path):
    from biapy_tpu.models.feature_nets import (SQUEEZE_LPIPS_CHANNELS,
                                               SqueezeNetFeatures)

    net = SqueezeNetFeatures()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    taps = net.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))
    assert tuple(t.shape[-1] for t in taps) == SQUEEZE_LPIPS_CHANNELS


def test_metric_weights_validation(tmp_path):
    """fid/is/lpips are accepted only with a local weights file (and 2D)."""
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.check_configuration import check_configuration

    def cfg_with(metrics, weights=None, ndim="2D"):
        cfg = get_cfg_defaults()
        cfg.merge_from_dict({
            "PROBLEM": {"TYPE": "IMAGE_TO_IMAGE", "NDIM": ndim},
            "DATA": {"PATCH_SIZE": [64, 64, 1] if ndim == "2D" else [8, 64, 64, 1],
                     "TRAIN": {"PATH": "/tmp/x", "GT_PATH": "/tmp/y"}},
            "MODEL": {"ARCHITECTURE": "multiresunet", "FEATURE_MAPS": [8, 16],
                      "Z_DOWN": [1]},
            "TRAIN": {"ENABLE": True},
            "TEST": {"ENABLE": True, "METRICS": list(metrics),
                     **({"METRIC_WEIGHTS": weights} if weights else {})},
        })
        return cfg

    with pytest.raises(Exception, match="METRIC_WEIGHTS"):
        check_configuration(cfg_with(["psnr", "fid"]))
    with pytest.raises(Exception, match="2D"):
        w = str(tmp_path / "inc.pth")
        open(w, "w").close()
        check_configuration(cfg_with(["fid"], {"INCEPTION": w}, ndim="3D"))
    w = str(tmp_path / "inc2.pth")
    open(w, "w").close()
    check_configuration(cfg_with(["psnr", "fid"], {"INCEPTION": w}))  # ok


@pytest.mark.slow
def test_gan_denoising_with_vgg_perceptual(tmp_path, vgg_file):
    """GAN denoising e2e exercising the ALPHA_PERCEPTUAL VGG term
    (reference: CycleGanLoss w_vgg, metrics.py:2668)."""
    import os

    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.data.tiff import write_tiff

    rng = np.random.default_rng(16)
    root = str(tmp_path)
    os.makedirs(f"{root}/train/x")
    os.makedirs(f"{root}/train/y")
    for i in range(8):
        clean = rng.random((64, 64), np.float32)
        noisy = clean + rng.normal(0, 0.15, clean.shape)
        write_tiff(f"{root}/train/x/{i}.tif", (noisy * 180).clip(0, 255).astype(np.uint8))
        write_tiff(f"{root}/train/y/{i}.tif", (clean * 180).clip(0, 255).astype(np.uint8))
    cfg = {
        "PROBLEM": {"TYPE": "DENOISING", "NDIM": "2D", "DENOISING": {"LOAD_GT_DATA": True}},
        "DATA": {"PATCH_SIZE": (32, 32, 1),
                 "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y", "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.2}},
        "MODEL": {"ARCHITECTURE": "nafnet",
                  "NAFNET": {"WIDTH": 8, "MIDDLE_BLK_NUM": 1, "ENC_BLK_NUMS": [1, 1],
                             "DEC_BLK_NUMS": [1, 1], "PATCHGAN": {"BASE_FILTERS": 8}}},
        "LOSS": {"CYCLEGAN": {"ALPHA_PERCEPTUAL": 0.5, "PERCEPTUAL_WEIGHTS": vgg_file}},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": ["ADAMW", "ADAMW"], "LR": [1.0e-3, 1.0e-3],
                  "BATCH_SIZE": 8, "EPOCHS": 2},
        "TEST": {"ENABLE": False},
    }
    job = BiaPy(cfg, result_dir=os.path.join(root, "results"), name="ganvgg", silent=True)
    job.run_job()
    assert job.workflow.state is not None


@pytest.mark.slow
def test_i2i_fid_is_lpips_e2e(tmp_path):
    """i2i e2e computing fid/is/lpips from local weight fixtures
    (reference: TEST.METRICS via torchmetrics, image_to_image.py:205-213)."""
    import os

    import torch

    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.data.tiff import write_tiff
    from biapy_tpu.models.feature_nets import InceptionV3, SqueezeNetFeatures

    inc = InceptionV3()
    ipar = inc.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
    inc_file = str(tmp_path / "inc.pth")
    torch.save(_synth_inception_sd(ipar), inc_file)
    sq = SqueezeNetFeatures()
    spar = sq.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    lp_file = str(tmp_path / "lpips.pth")
    torch.save(_synth_lpips_sd(spar), lp_file)

    rng = np.random.default_rng(3)
    root = str(tmp_path)
    for d, n in [("train", 6), ("test", 3)]:
        os.makedirs(f"{root}/{d}/x")
        os.makedirs(f"{root}/{d}/y")
        for i in range(n):
            a = rng.random((48, 48), np.float32)
            write_tiff(f"{root}/{d}/x/{i}.tif", (a * 200).astype(np.uint8))
            write_tiff(f"{root}/{d}/y/{i}.tif", ((1 - a) * 200).astype(np.uint8))
    cfg = {
        "PROBLEM": {"TYPE": "IMAGE_TO_IMAGE", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (48, 48, 1),
                 "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y", "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.34},
                 "TEST": {"PATH": f"{root}/test/x", "GT_PATH": f"{root}/test/y",
                          "IN_MEMORY": True, "LOAD_GT": True}},
        "MODEL": {"ARCHITECTURE": "multiresunet", "FEATURE_MAPS": [8, 16],
                  "Z_DOWN": [2]},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": "ADAMW", "LR": 1.0e-3,
                  "BATCH_SIZE": 4, "EPOCHS": 2},
        "TEST": {"ENABLE": True, "METRICS": ["psnr", "fid", "is", "lpips"],
                 "METRIC_WEIGHTS": {"INCEPTION": inc_file, "LPIPS": lp_file}},
    }
    job = BiaPy(cfg, result_dir=os.path.join(root, "results"), name="i2iperc", silent=True)
    job.run_job()
    stats = job.workflow.stats
    for k in ("psnr", "fid", "is", "lpips"):
        assert k in stats and np.isfinite(stats[k]), stats
    assert stats["lpips"] > 0 and stats["fid"] > 0
