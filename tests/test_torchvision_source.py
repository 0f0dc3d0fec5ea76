"""MODEL.SOURCE='torchvision': local torchvision efficientnet state-dict
import onto the first-party Flax EfficientNet (reference:
build_torchvision_model, models/__init__.py:1609 — downloads DEFAULT weights;
here they come from a LOCAL file, like the BMZ/STUNet/SAM3 loaders).

No torchvision in this environment, so the fixture is a synthetic state dict
emitted in the exact torchvision key format from the flax tree's shapes —
this pins the name mapping and every transpose."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


def _synth_torchvision_sd(variant="efficientnet_b0", n_classes=1000, seed=0):
    """Build a torchvision-format efficientnet state dict whose values encode
    their own key index, so placement is verifiable tensor by tensor."""
    import torch

    from biapy_tpu.models.efficientnet import EfficientNet, torchvision_key_map

    net = EfficientNet(variant=variant, n_classes=n_classes)
    variables = net.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
    from flax.traverse_util import flatten_dict

    pflat = flatten_dict(variables["params"])
    sflat = flatten_dict(variables.get("batch_stats", {}))
    pa, sa = torchvision_key_map(variant)
    sd = {}
    for i, (fpath, tkey, tf) in enumerate(pa + sa):
        src = pflat if (fpath, tkey, tf) in pa else sflat
        shape = np.shape(src[fpath])
        a = np.full(shape, float(i + 1), np.float32)
        if tf == "conv":
            a = a.transpose(3, 2, 0, 1)
        elif tf == "dense":
            a = a.T
        sd[tkey] = torch.from_numpy(np.ascontiguousarray(a))
    return sd, variables


def test_key_map_matches_torchvision_format():
    """Spot-check the emitted key names against torchvision's real layout."""
    from biapy_tpu.models.efficientnet import torchvision_key_map

    pa, sa = torchvision_key_map("efficientnet_b0")
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    # stem / head / classifier
    assert "features.0.0.weight" in keys
    assert "features.0.1.running_mean" in keys
    assert "features.8.0.weight" in keys
    assert "classifier.1.weight" in keys
    # first block has no expand conv: block.0 is the depthwise stack
    assert "features.1.0.block.0.0.weight" in keys
    assert "features.1.0.block.1.fc1.weight" in keys  # SE
    assert "features.1.0.block.2.0.weight" in keys  # project
    assert "features.1.0.block.3.0.weight" not in keys
    # expanded blocks: expand / depthwise / SE / project
    assert "features.2.0.block.0.0.weight" in keys
    assert "features.2.0.block.1.0.weight" in keys
    assert "features.2.0.block.2.fc1.weight" in keys
    assert "features.2.0.block.3.0.weight" in keys
    # b0 has 16 MBConv blocks
    mb = {p[0] for p, _, _ in pa if p[0].startswith("MBConv_")}
    assert mb == {f"MBConv_{i}" for i in range(16)}


def test_load_torchvision_efficientnet_bit_exact(tmp_path):
    import torch

    from biapy_tpu.models.efficientnet import (EfficientNet,
                                               load_torchvision_efficientnet,
                                               torchvision_key_map)
    from flax.traverse_util import flatten_dict

    sd, variables = _synth_torchvision_sd(n_classes=1000)
    p = str(tmp_path / "effb0.pth")
    torch.save(sd, p)

    params, stats, n = load_torchvision_efficientnet(
        p, variables["params"], variables.get("batch_stats", {}),
        variant="efficientnet_b0")
    pa, sa = torchvision_key_map("efficientnet_b0")
    assert n == len(pa) + len(sa)
    pflat = flatten_dict(params)
    sflat = flatten_dict(stats)
    # every tensor landed in the right slot with the right transpose:
    # value i+1 at assignment index i
    for i, (fpath, tkey, tf) in enumerate(pa + sa):
        tgt = pflat if (fpath, tkey, tf) in pa else sflat
        got = np.asarray(tgt[fpath])
        assert np.all(got == float(i + 1)), (fpath, tkey)
    # model runs with the loaded weights
    net = EfficientNet(variant="efficientnet_b0", n_classes=1000)
    out = net.apply({"params": params, "batch_stats": stats},
                    jnp.zeros((1, 64, 64, 3)), train=False)
    assert out["class"].shape == (1, 1000)


def test_load_torchvision_head_replaced(tmp_path, capsys):
    """n_classes != 1000 -> backbone loads, classifier skipped with the
    reference's finetuning warning (models/__init__.py:1712)."""
    import torch

    from biapy_tpu.models.efficientnet import (EfficientNet,
                                               load_torchvision_efficientnet)

    sd, _ = _synth_torchvision_sd(n_classes=1000)
    p = str(tmp_path / "effb0.pth")
    torch.save(sd, p)

    net = EfficientNet(variant="efficientnet_b0", n_classes=3)
    variables = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    before = np.asarray(variables["params"]["Dense_0"]["kernel"])
    params, stats, n = load_torchvision_efficientnet(
        p, variables["params"], variables.get("batch_stats", {}),
        variant="efficientnet_b0")
    assert "finetunning is required" in capsys.readouterr().out
    # head untouched, backbone loaded
    assert np.array_equal(np.asarray(params["Dense_0"]["kernel"]), before)
    assert float(np.unique(np.asarray(params["Conv_0"]["kernel"]))) == 1.0


def test_missing_key_rejected(tmp_path):
    import torch

    from biapy_tpu.models.efficientnet import (EfficientNet,
                                               load_torchvision_efficientnet)

    sd, variables = _synth_torchvision_sd()
    del sd["features.3.0.block.1.0.weight"]
    p = str(tmp_path / "bad.pth")
    torch.save(sd, p)
    with pytest.raises(ValueError, match="missing key"):
        load_torchvision_efficientnet(p, variables["params"],
                                      variables.get("batch_stats", {}))


def test_torchvision_source_validation(tmp_path):
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.check_configuration import check_configuration

    def cfg_with(**model):
        cfg = get_cfg_defaults()
        cfg.merge_from_dict({
            "PROBLEM": {"TYPE": model.pop("problem", "CLASSIFICATION"),
                        "NDIM": model.pop("ndim", "2D")},
            "DATA": {"PATCH_SIZE": [64, 64, 3], "N_CLASSES": 3,
                     "TRAIN": {"PATH": "/tmp/x"}},
            "MODEL": {"SOURCE": "torchvision", **model},
            "TRAIN": {"ENABLE": True},
        })
        return cfg

    w = str(tmp_path / "effb0.pth")
    open(w, "w").close()
    # a name outside the supported namespace (every real torchvision
    # classification family IS supported now — timm's resnet200 is not a
    # torchvision model)
    with pytest.raises(Exception, match="not supported"):
        check_configuration(cfg_with(TORCHVISION_MODEL_NAME="resnet200",
                                     TORCHVISION_WEIGHTS=w))
    # maxvit is a documented guided rejection
    with pytest.raises(Exception, match="maxvit"):
        check_configuration(cfg_with(TORCHVISION_MODEL_NAME="maxvit_t",
                                     TORCHVISION_WEIGHTS=w))
    # missing local weights
    with pytest.raises(Exception, match="TORCHVISION_WEIGHTS"):
        check_configuration(cfg_with(TORCHVISION_MODEL_NAME="efficientnet_b0"))
    # wrong workflow
    with pytest.raises(Exception, match="classification"):
        check_configuration(cfg_with(TORCHVISION_MODEL_NAME="efficientnet_b0",
                                     TORCHVISION_WEIGHTS=w,
                                     problem="SEMANTIC_SEG"))
    # ok
    check_configuration(cfg_with(TORCHVISION_MODEL_NAME="efficientnet_b0",
                                 TORCHVISION_WEIGHTS=w))


@pytest.mark.slow
def test_torchvision_classification_e2e(tmp_path):
    """Classification e2e with MODEL.SOURCE='torchvision' (reference Test
    analog: torchvision classification jobs in run_checks.py)."""
    import os

    import torch

    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.data.tiff import write_tiff

    sd, _ = _synth_torchvision_sd(n_classes=1000)
    wpath = str(tmp_path / "effb0.pth")
    torch.save(sd, wpath)

    rng = np.random.default_rng(5)
    root = str(tmp_path)
    for split, n in [("train", 8), ("test", 4)]:
        for cls in ("0", "1"):
            os.makedirs(f"{root}/{split}/{cls}", exist_ok=True)
            for i in range(n):
                base = 40 if cls == "0" else 180
                img = (rng.random((64, 64, 3)) * 40 + base).astype(np.uint8)
                write_tiff(f"{root}/{split}/{cls}/{i}.tif", img)
    cfg = {
        "PROBLEM": {"TYPE": "CLASSIFICATION", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (64, 64, 3), "N_CLASSES": 2,
                 "TRAIN": {"PATH": f"{root}/train", "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.25},
                 "TEST": {"PATH": f"{root}/test", "IN_MEMORY": True,
                          "LOAD_GT": True}},
        "MODEL": {"SOURCE": "torchvision",
                  "TORCHVISION_MODEL_NAME": "efficientnet_b0",
                  "TORCHVISION_WEIGHTS": wpath},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": "ADAMW", "LR": 1.0e-3,
                  "BATCH_SIZE": 4, "EPOCHS": 1},
        "TEST": {"ENABLE": True},
    }
    job = BiaPy(cfg, result_dir=os.path.join(root, "results"), name="tvcls",
                silent=True)
    job.run_job()
    assert "accuracy" in job.workflow.stats


def _torch_resnet18_sd(n_classes=1000, seed=0):
    """A torchvision-format resnet18 state dict from a real torch module
    (standard ResNet definition — torchvision is not installed), plus the
    module itself for numeric comparison."""
    import torch
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, inp, out, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(out)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(out)
            self.downsample = None
            if stride != 1 or inp != out:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, out, 1, stride, bias=False),
                    tnn.BatchNorm2d(out))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            h = self.relu(self.bn1(self.conv1(x)))
            h = self.bn2(self.conv2(h))
            return self.relu(h + idn)

    class ResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
            self.layer2 = tnn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128))
            self.layer3 = tnn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256))
            self.layer4 = tnn.Sequential(BasicBlock(256, 512, 2), BasicBlock(512, 512))
            self.fc = tnn.Linear(512, n_classes)

        def forward(self, x):
            h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            h = self.layer4(self.layer3(self.layer2(self.layer1(h))))
            return self.fc(h.mean(dim=(2, 3)))

    torch.manual_seed(seed)
    net = ResNet18().eval()
    # randomize running stats so bn placement is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    return net.state_dict(), net


def test_load_torchvision_resnet18_numeric(tmp_path):
    """resnet18 weight import is numerically exact: the Flax forward on the
    imported weights matches the torch module's eval forward."""
    import jax
    import numpy as np
    import torch

    from biapy_tpu.models.resnet import ResNet, load_torchvision_resnet

    sd, net = _torch_resnet18_sd(n_classes=1000)
    p = str(tmp_path / "resnet18.pth")
    torch.save(sd, p)

    m = ResNet(variant="resnet18", n_classes=1000)
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params, stats, n = load_torchvision_resnet(p, v["params"],
                                               v.get("batch_stats", {}),
                                               variant="resnet18")
    assert n == len([k for k in sd if not k.endswith("num_batches_tracked")])
    out = m.apply({"params": params, "batch_stats": stats}, x,
                  train=False)["class"]
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_load_torchvision_resnet_head_replaced(tmp_path, capsys):
    import jax
    import numpy as np
    import torch

    from biapy_tpu.models.resnet import ResNet, load_torchvision_resnet

    sd, _ = _torch_resnet18_sd(n_classes=1000)
    p = str(tmp_path / "resnet18.pth")
    torch.save(sd, p)
    m = ResNet(variant="resnet18", n_classes=3)
    v = m.init({"params": jax.random.PRNGKey(0)},
               np.zeros((1, 64, 64, 3), np.float32), train=False)
    params, stats, n = load_torchvision_resnet(p, v["params"],
                                               v.get("batch_stats", {}),
                                               variant="resnet18")
    assert "finetunning is required" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# deeplabv3 segmentation family (reference: build_torchvision_model
# segmentation branch, biapy/models/__init__.py:1678)
# ---------------------------------------------------------------------------


def _synth_deeplab_sd(variant="deeplabv3_resnet50", n_classes=21):
    """torchvision-format deeplabv3 state dict with index-encoded values."""
    import torch

    from biapy_tpu.models.deeplab import deeplabv3_key_map

    pa, sa = deeplabv3_key_map(variant, n_classes)
    from biapy_tpu.models.deeplab import DeepLabV3

    net = DeepLabV3(variant=variant, n_classes=n_classes)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    from flax.traverse_util import flatten_dict

    pflat = flatten_dict(variables["params"])
    sflat = flatten_dict(variables["batch_stats"])
    sd = {}
    for i, (fpath, tkey, tf) in enumerate(pa + sa):
        src = pflat if (fpath, tkey, tf) in pa else sflat
        a = np.full(np.shape(src[fpath]), float(i + 1), np.float32)
        if tf == "conv":
            a = a.transpose(3, 2, 0, 1)
        sd[tkey] = torch.from_numpy(np.ascontiguousarray(a))
    return sd, variables


def test_deeplab_key_map_matches_torchvision_format():
    from biapy_tpu.models.deeplab import deeplabv3_key_map

    pa, sa = deeplabv3_key_map("deeplabv3_resnet50")
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    # backbone (dilated resnet50)
    assert "backbone.conv1.weight" in keys
    assert "backbone.layer1.0.downsample.0.weight" in keys
    assert "backbone.layer4.2.conv3.weight" in keys
    assert "backbone.layer4.0.downsample.1.running_var" in keys
    # ASPP branches + pooling branch offsets (convs.4.0 is the pool layer)
    assert "classifier.0.convs.0.0.weight" in keys
    assert "classifier.0.convs.3.0.weight" in keys
    assert "classifier.0.convs.4.1.weight" in keys
    assert "classifier.0.convs.4.2.running_mean" in keys
    assert "classifier.0.project.0.weight" in keys
    # head + final conv (with bias) + aux head
    assert "classifier.1.weight" in keys
    assert "classifier.2.running_mean" in keys
    assert "classifier.4.weight" in keys and "classifier.4.bias" in keys
    assert "aux_classifier.0.weight" in keys
    assert "aux_classifier.4.bias" in keys
    # no fc: segmentation backbones drop the classifier head
    assert not any("fc" in k for k in keys)


def test_load_torchvision_deeplabv3_bit_exact(tmp_path):
    import torch

    from biapy_tpu.models.deeplab import (DeepLabV3, deeplabv3_key_map,
                                          load_torchvision_deeplabv3)
    from flax.traverse_util import flatten_dict

    sd, variables = _synth_deeplab_sd()
    p = str(tmp_path / "dl3.pth")
    torch.save(sd, p)
    params, stats, n = load_torchvision_deeplabv3(
        p, variables["params"], variables["batch_stats"],
        variant="deeplabv3_resnet50")
    pa, sa = deeplabv3_key_map("deeplabv3_resnet50")
    assert n == len(pa) + len(sa)
    pflat = flatten_dict(params)
    sflat = flatten_dict(stats)
    for i, (fpath, tkey, tf) in enumerate(pa + sa):
        tgt = pflat if (fpath, tkey, tf) in pa else sflat
        assert np.all(np.asarray(tgt[fpath]) == float(i + 1)), (fpath, tkey)
    net = DeepLabV3(variant="deeplabv3_resnet50", n_classes=21)
    out = net.apply({"params": params, "batch_stats": stats},
                    jnp.ones((1, 64, 64, 3)) * 0.01, train=False)
    assert out.shape == (1, 64, 64, 21)


def test_deeplab_head_replaced_warning(tmp_path, capsys):
    import torch

    from biapy_tpu.models.deeplab import DeepLabV3, load_torchvision_deeplabv3

    sd, _ = _synth_deeplab_sd(n_classes=21)
    p = str(tmp_path / "dl3.pth")
    torch.save(sd, p)
    net = DeepLabV3(variant="deeplabv3_resnet50", n_classes=1)
    variables = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    params, stats, n = load_torchvision_deeplabv3(
        p, variables["params"], variables["batch_stats"],
        variant="deeplabv3_resnet50")
    assert "finetunning is required" in capsys.readouterr().out
    # backbone landed
    assert float(np.unique(np.asarray(params["backbone"]["conv1"]["kernel"]))) == 1.0


@pytest.mark.slow
def test_deeplabv3_semantic_seg_e2e(tmp_path):
    """MODEL.SOURCE=torchvision + deeplabv3_resnet50 runs a 2D semantic-seg
    job end-to-end from a LOCAL state dict (reference:
    biapy/models/__init__.py:1678)."""
    import os

    import torch

    from biapy_tpu.data.tiff import write_tiff

    sd, _ = _synth_deeplab_sd()
    w = str(tmp_path / "dl3.pth")
    torch.save(sd, w)
    rng = np.random.default_rng(5)
    root = str(tmp_path)
    for d, n in [("train", 4), ("test", 1)]:
        os.makedirs(f"{root}/{d}/x"); os.makedirs(f"{root}/{d}/y")
        for i in range(n):
            img = rng.random((64, 64, 3), np.float32)
            lab = (img[..., :1] > 0.5).astype(np.uint8)
            write_tiff(f"{root}/{d}/x/{i}.tif", img)
            write_tiff(f"{root}/{d}/y/{i}.tif", lab)
    from biapy_tpu._biapy import BiaPy

    cfg = {
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (64, 64, 3),
                 "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y",
                           "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.25},
                 "TEST": {"PATH": f"{root}/test/x", "GT_PATH": f"{root}/test/y",
                          "IN_MEMORY": True, "LOAD_GT": True}},
        "MODEL": {"SOURCE": "torchvision",
                  "TORCHVISION_MODEL_NAME": "deeplabv3_resnet50",
                  "TORCHVISION_WEIGHTS": w},
        "TRAIN": {"ENABLE": True, "BATCH_SIZE": 2, "EPOCHS": 2},
        "TEST": {"ENABLE": True},
    }
    job = BiaPy(cfg, result_dir=root + "/results", name="dl3", silent=True)
    job.run_job()
    # placement happened (pretrained backbone values survive into the state)
    k = np.asarray(job.workflow.state.params["backbone"]["conv1"]["kernel"])
    assert k.shape == (7, 7, 3, 64)
    assert job.workflow.metrics_per_test_file, "no test metrics produced"


# ---------------------------------------------------------------------------
# fcn_resnet50/101 + mobilenet_v3 + lraspp_mobilenet_v3_large (reference:
# build_torchvision_model, biapy/models/__init__.py:1676,1745-1752)
# ---------------------------------------------------------------------------


def _synth_tv_sd(pa, sa, variables):
    """torchvision-format state dict with index-encoded values for any
    static key map (shapes derived from the flax tree)."""
    import torch
    from flax.traverse_util import flatten_dict

    pflat = flatten_dict(variables["params"])
    sflat = flatten_dict(variables.get("batch_stats", {}))
    sd = {}
    for i, (fpath, tkey, tf) in enumerate(list(pa) + list(sa)):
        src = pflat if (fpath, tkey, tf) in pa else sflat
        a = np.full(np.shape(src[tuple(fpath)]), float(i + 1), np.float32)
        if tf == "conv":
            a = a.transpose(3, 2, 0, 1)
        elif tf == "linear":
            a = a.transpose(1, 0)
        sd[tkey] = torch.from_numpy(np.ascontiguousarray(a))
    return sd


def test_fcn_key_map_matches_torchvision_format():
    from biapy_tpu.models.deeplab import fcn_key_map

    pa, sa = fcn_key_map("fcn_resnet50")
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    assert "backbone.conv1.weight" in keys
    assert "backbone.layer4.2.conv3.weight" in keys
    # FCNHead: Sequential(conv3x3, BN, ReLU, Dropout, conv1x1)
    assert "classifier.0.weight" in keys
    assert "classifier.1.running_mean" in keys
    assert "classifier.4.weight" in keys and "classifier.4.bias" in keys
    assert "aux_classifier.0.weight" in keys
    # no ASPP modules in FCN
    assert not any("convs" in k or "project" in k for k in keys)


def test_load_torchvision_fcn_bit_exact(tmp_path):
    import torch

    from biapy_tpu.models.deeplab import FCN, fcn_key_map, load_torchvision_fcn
    from flax.traverse_util import flatten_dict

    net = FCN(variant="fcn_resnet50", n_classes=21)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pa, sa = fcn_key_map("fcn_resnet50")
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "fcn.pth")
    torch.save(sd, p)
    params, stats, n = load_torchvision_fcn(
        p, variables["params"], variables["batch_stats"], variant="fcn_resnet50")
    assert n == len(pa) + len(sa)
    pflat = flatten_dict(params)
    sflat = flatten_dict(stats)
    for i, (fpath, tkey, tf) in enumerate(pa + sa):
        tgt = pflat if (fpath, tkey, tf) in pa else sflat
        assert np.all(np.asarray(tgt[tuple(fpath)]) == float(i + 1)), (fpath, tkey)
    out = net.apply({"params": params, "batch_stats": stats},
                    jnp.ones((1, 64, 64, 3)) * 0.01, train=False)
    assert out.shape == (1, 64, 64, 21)


def test_mobilenetv3_param_count_golden():
    """Param parity vs torchvision's published counts: mobilenet_v3_large =
    5,483,032 and _small = 2,542,856 at 1000 classes; at 10 classes the
    classifier.3 head shrinks by 1280*990+990 / 1024*990+990."""
    from biapy_tpu.models.mobilenetv3 import MobileNetV3

    for variant, want_1000, hidden in (
            ("mobilenet_v3_large", 5_483_032, 1280),
            ("mobilenet_v3_small", 2_542_856, 1024)):
        net = MobileNetV3(variant=variant, n_classes=10)
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(v["params"]))
        head_delta = hidden * 990 + 990
        assert n == want_1000 - head_delta, (variant, n)


def test_mobilenetv3_key_map_matches_torchvision_format():
    from biapy_tpu.models.mobilenetv3 import mobilenetv3_key_map

    pa, sa = mobilenetv3_key_map("mobilenet_v3_large")
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    assert "features.0.0.weight" in keys
    # block 1 (16->16, no expand, no SE): dw at block.0, project at block.1
    assert "features.1.block.0.0.weight" in keys
    assert "features.1.block.1.1.running_mean" in keys
    # block 4 (C2, SE): expand .0, dw .1, SE .2, project .3
    assert "features.4.block.2.fc1.weight" in keys
    assert "features.4.block.2.fc2.bias" in keys
    assert "features.4.block.3.0.weight" in keys
    # last conv + classifier
    assert "features.16.0.weight" in keys
    assert "classifier.0.weight" in keys and "classifier.3.bias" in keys


def test_load_torchvision_mobilenetv3_bit_exact(tmp_path):
    import torch

    from biapy_tpu.models.mobilenetv3 import (MobileNetV3, mobilenetv3_key_map,
                                              load_torchvision_mobilenetv3)
    from flax.traverse_util import flatten_dict

    net = MobileNetV3(variant="mobilenet_v3_small", n_classes=1000)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    pa, sa = mobilenetv3_key_map("mobilenet_v3_small", n_classes=1000)
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "mnv3.pth")
    torch.save(sd, p)
    params, stats, n = load_torchvision_mobilenetv3(
        p, variables["params"], variables["batch_stats"],
        variant="mobilenet_v3_small")
    assert n == len(pa) + len(sa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey


def test_lraspp_key_map_matches_torchvision_format():
    from biapy_tpu.models.mobilenetv3 import lraspp_key_map

    pa, sa = lraspp_key_map()
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    # backbone features relocated under backbone.{idx}: torchvision's
    # IntermediateLayerGetter indexes model.features' children directly,
    # so there is NO "features." segment in the segmentation state dicts
    assert "backbone.0.0.weight" in keys
    assert "backbone.16.0.weight" in keys
    assert not any(".features." in k for k in keys)
    # LRASPPHead: cbr conv+bn, scale conv (after the pool at .0),
    # low/high classifiers with bias
    assert "classifier.cbr.0.weight" in keys
    assert "classifier.cbr.1.running_var" in keys
    assert "classifier.scale.1.weight" in keys
    assert "classifier.low_classifier.weight" in keys
    assert "classifier.low_classifier.bias" in keys
    assert "classifier.high_classifier.weight" in keys
    # classification head is dropped
    assert not any(k.startswith("classifier.0") or "classifier.3" in k
                   for k in keys)


def test_load_torchvision_lraspp_bit_exact(tmp_path):
    import torch

    from biapy_tpu.models.mobilenetv3 import (LRASPP, lraspp_key_map,
                                              load_torchvision_lraspp)
    from flax.traverse_util import flatten_dict

    net = LRASPP(n_classes=21)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pa, sa = lraspp_key_map(21)
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "lraspp.pth")
    torch.save(sd, p)
    params, stats, n = load_torchvision_lraspp(
        p, variables["params"], variables["batch_stats"])
    assert n == len(pa) + len(sa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey
    out = net.apply({"params": params, "batch_stats": stats},
                    jnp.ones((1, 64, 64, 3)) * 0.01, train=False)
    assert out.shape == (1, 64, 64, 21)


@pytest.mark.slow
@pytest.mark.parametrize("tv_name", ["fcn_resnet50", "lraspp_mobilenet_v3_large"])
def test_fcn_lraspp_semantic_seg_e2e(tmp_path, tv_name):
    """MODEL.SOURCE=torchvision + fcn/lraspp run 2D semantic-seg jobs
    end-to-end from LOCAL state dicts (reference models/__init__.py:1745-1752)."""
    import os

    import torch

    from biapy_tpu.data.tiff import write_tiff

    if tv_name == "fcn_resnet50":
        from biapy_tpu.models.deeplab import FCN, fcn_key_map

        net = FCN(variant=tv_name, n_classes=21)
        pa, sa = fcn_key_map(tv_name)
    else:
        from biapy_tpu.models.mobilenetv3 import LRASPP, lraspp_key_map

        net = LRASPP(n_classes=21)
        pa, sa = lraspp_key_map(21)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = _synth_tv_sd(pa, sa, variables)
    w = str(tmp_path / "weights.pth")
    torch.save(sd, w)

    rng = np.random.default_rng(5)
    root = str(tmp_path)
    for d, n in [("train", 4), ("test", 1)]:
        os.makedirs(f"{root}/{d}/x"); os.makedirs(f"{root}/{d}/y")
        for i in range(n):
            img = rng.random((64, 64, 3), np.float32)
            lab = (img[..., :1] > 0.5).astype(np.uint8)
            write_tiff(f"{root}/{d}/x/{i}.tif", img)
            write_tiff(f"{root}/{d}/y/{i}.tif", lab)
    from biapy_tpu._biapy import BiaPy

    cfg = {
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (64, 64, 3),
                 "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y",
                           "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.25},
                 "TEST": {"PATH": f"{root}/test/x", "GT_PATH": f"{root}/test/y",
                          "IN_MEMORY": True, "LOAD_GT": True}},
        "MODEL": {"SOURCE": "torchvision",
                  "TORCHVISION_MODEL_NAME": tv_name,
                  "TORCHVISION_WEIGHTS": w},
        "TRAIN": {"ENABLE": True, "BATCH_SIZE": 2, "EPOCHS": 2},
        "TEST": {"ENABLE": True},
    }
    job = BiaPy(cfg, result_dir=root + "/results", name=tv_name, silent=True)
    job.run_job()
    assert job.workflow.metrics_per_test_file, "no test metrics produced"


def test_convnext_key_map_matches_torchvision_format():
    from biapy_tpu.models.convnext_tv import convnext_key_map

    pa, sa = convnext_key_map("convnext_tiny")
    assert sa == []  # LayerNorm only — no running stats
    keys = {t for _, t, _ in pa}
    assert "features.0.0.weight" in keys and "features.0.1.weight" in keys
    # CNBlock: dw conv .0, LN .2, Linear .3/.5, layer_scale
    assert "features.1.0.block.0.weight" in keys
    assert "features.1.0.block.2.weight" in keys
    assert "features.1.0.block.3.weight" in keys
    assert "features.1.0.block.5.bias" in keys
    assert "features.1.0.layer_scale" in keys
    # stage 3 (features.5) has 9 blocks in tiny
    assert "features.5.8.block.0.weight" in keys
    assert "features.5.9.block.0.weight" not in keys
    # downsample between stages: LN .0 + conv .1
    assert "features.2.0.weight" in keys and "features.2.1.weight" in keys
    assert "classifier.0.weight" in keys and "classifier.2.bias" in keys


def test_convnext_param_count_golden():
    """convnext_tiny at 1000 classes must hit torchvision's published
    28,589,128 parameters exactly."""
    from biapy_tpu.models.convnext_tv import ConvNeXt

    net = ConvNeXt(variant="convnext_tiny", n_classes=1000)
    v = net.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == 28_589_128, n


def test_load_torchvision_convnext_bit_exact(tmp_path):
    import torch

    from biapy_tpu.models.convnext_tv import (ConvNeXt, convnext_key_map,
                                              load_torchvision_convnext)
    from flax.traverse_util import flatten_dict

    net = ConvNeXt(variant="convnext_tiny", n_classes=1000)
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 32, 32, 3)))
    pa, sa = convnext_key_map("convnext_tiny")
    # synth with torch-side shapes (incl. layer_scale (C,1,1) -> 'flat')
    pflat = flatten_dict(variables["params"])
    sd = {}
    for i, (fpath, tkey, tf) in enumerate(pa):
        a = np.full(np.shape(pflat[tuple(fpath)]), float(i + 1), np.float32)
        if tf == "conv":
            a = a.transpose(3, 2, 0, 1)
        elif tf == "linear":
            a = a.transpose(1, 0)
        elif tf == "flat":
            a = a.reshape(a.shape[0], 1, 1)
        sd[tkey] = torch.from_numpy(np.ascontiguousarray(a))
    p = str(tmp_path / "cn.pth")
    torch.save(sd, p)
    params, stats, n = load_torchvision_convnext(p, variables["params"])
    assert n == len(pa)
    pflat2 = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat2[tuple(fpath)]) == float(i + 1)), tkey
    y = net.apply({"params": params}, jnp.ones((1, 32, 32, 3)) * 0.01)
    assert y.shape == (1, 1000)


@pytest.mark.parametrize("variant,want", [("squeezenet1_0", 1_248_424),
                                          ("squeezenet1_1", 1_235_496)])
def test_squeezenet_param_count_golden(variant, want):
    """torchvision's published counts: 1_0 = 1,248,424 / 1_1 = 1,235,496."""
    from biapy_tpu.models.squeezenet import SqueezeNet

    net = SqueezeNet(variant=variant, n_classes=1000)
    v = net.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == want, n


def test_load_torchvision_squeezenet_bit_exact(tmp_path):
    import torch

    from biapy_tpu.models.squeezenet import (SqueezeNet, squeezenet_key_map,
                                             load_torchvision_squeezenet)
    from flax.traverse_util import flatten_dict

    net = SqueezeNet(variant="squeezenet1_1", n_classes=1000)
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 64, 64, 3)))
    pa, sa = squeezenet_key_map("squeezenet1_1")
    keys = {t for _, t, _ in pa}
    # torchvision fire layout: squeeze/expand1x1/expand3x3, 1_1 pools at 2/5/8
    assert "features.3.squeeze.weight" in keys
    assert "features.12.expand3x3.bias" in keys
    assert "classifier.1.weight" in keys
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "sq.pth")
    torch.save(sd, p)
    params, _, n = load_torchvision_squeezenet(p, variables["params"],
                                               variant="squeezenet1_1")
    assert n == len(pa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey
    y = net.apply({"params": params}, jnp.ones((1, 64, 64, 3)) * 0.01)
    assert y.shape == (1, 1000)


def test_squeezenet_head_replacement_warns(tmp_path, capsys):
    """n_classes != 1000 swaps the 1x1 conv head (reference special-case,
    models/__init__.py:1711) — loader skips it with the warning."""
    import torch

    from biapy_tpu.models.squeezenet import (SqueezeNet, squeezenet_key_map,
                                             load_torchvision_squeezenet)

    donor = SqueezeNet(variant="squeezenet1_1", n_classes=1000)
    dv = donor.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)))
    pa, sa = squeezenet_key_map("squeezenet1_1")
    sd = _synth_tv_sd(pa, sa, dv)
    p = str(tmp_path / "sq.pth")
    torch.save(sd, p)
    net = SqueezeNet(variant="squeezenet1_1", n_classes=5)
    variables = net.init({"params": jax.random.PRNGKey(1)},
                         jnp.zeros((1, 64, 64, 3)))
    params, _, n = load_torchvision_squeezenet(p, variables["params"],
                                               variant="squeezenet1_1")
    assert "finetunning is required" in capsys.readouterr().out
    assert n == len(pa) - 2  # head kernel+bias skipped


@pytest.mark.parametrize("variant,want", [
    ("resnext50_32x4d", 25_028_904),
    ("wide_resnet50_2", 68_883_240),
])
def test_resnext_wide_param_count_golden(variant, want):
    """Grouped/wider bottlenecks on the shared ResNet skeleton must hit
    torchvision's published counts exactly."""
    from biapy_tpu.models.resnet import ResNet

    net = ResNet(variant=variant, n_classes=1000)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == want, n


def test_load_torchvision_resnext_bit_exact(tmp_path):
    """The mechanical key translation covers the grouped variants too (same
    module names as resnet50)."""
    import torch

    from biapy_tpu.models.resnet import ResNet, load_torchvision_resnet
    from flax.traverse_util import flatten_dict

    net = ResNet(variant="resnext50_32x4d", n_classes=1000)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    pflat = flatten_dict(variables["params"])
    sflat = flatten_dict(variables["batch_stats"])
    sd = {}
    # reconstruct the torch state dict from the flax tree (inverse of the
    # loader's mechanical translation)
    for path, a in list(pflat.items()) + list(sflat.items()):
        a = np.asarray(a)
        mod = list(path[:-1])
        leaf = path[-1]
        tparts = []
        for m in mod:
            if m.startswith("layer") and "_" in m:
                st, bi = m.split("_")
                tparts += [st, bi]
            elif m == "downsample_conv":
                tparts += ["downsample", "0"]
            elif m == "downsample_bn":
                tparts += ["downsample", "1"]
            else:
                tparts.append(m)
        tl = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "mean": "running_mean", "var": "running_var"}[leaf]
        if leaf == "kernel" and a.ndim == 4:
            a = a.transpose(3, 2, 0, 1)
        elif leaf == "kernel" and a.ndim == 2:
            a = a.transpose(1, 0)
        sd[".".join(tparts + [tl])] = torch.from_numpy(np.ascontiguousarray(a))
    p = str(tmp_path / "rx.pth")
    torch.save(sd, p)
    params, stats, n = load_torchvision_resnet(
        p, variables["params"], variables["batch_stats"],
        variant="resnext50_32x4d")
    for path, a in flatten_dict(params).items():
        assert np.array_equal(np.asarray(a), np.asarray(pflat[path])), path


@pytest.mark.parametrize("variant,want", [
    ("vgg11", 132_863_336), ("vgg16", 138_357_544),
    ("vgg16_bn", 138_365_992), ("vgg19", 143_667_240)])
def test_vgg_param_count_golden(variant, want):
    from biapy_tpu.models.vgg import VGG

    net = VGG(variant=variant, n_classes=1000)
    v = net.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == want, n


def test_load_torchvision_vgg_bit_exact_and_flatten_order(tmp_path):
    """The classifier.0 import permutes torch's (C,7,7) flatten order into
    this model's (7,7,C) — verified numerically: a torch-built VGG11 and
    the imported flax one must produce identical logits."""
    import torch

    from biapy_tpu.models.vgg import VGG, load_torchvision_vgg

    torch.manual_seed(0)
    # build a REAL torch vgg11 (torchvision-layout) to generate both the
    # state dict and the reference logits
    cfg = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]
    layers = []
    in_c = 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers += [torch.nn.Conv2d(in_c, v, 3, padding=1),
                       torch.nn.ReLU(inplace=True)]
            in_c = v
    tnet = torch.nn.Sequential()
    tnet.features = torch.nn.Sequential(*layers)
    tnet.avgpool = torch.nn.AdaptiveAvgPool2d((7, 7))
    tnet.classifier = torch.nn.Sequential(
        torch.nn.Linear(512 * 49, 4096), torch.nn.ReLU(True), torch.nn.Dropout(),
        torch.nn.Linear(4096, 4096), torch.nn.ReLU(True), torch.nn.Dropout(),
        torch.nn.Linear(4096, 1000))
    tnet.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        h = tnet.features(x)
        h = tnet.avgpool(h)
        ref = tnet.classifier(torch.flatten(h, 1)).numpy()

    sd = {f"features.{k}": v for k, v in tnet.features.state_dict().items()}
    sd.update({f"classifier.{k}": v for k, v in tnet.classifier.state_dict().items()})
    p = str(tmp_path / "vgg11.pth")
    torch.save(sd, p)

    net = VGG(variant="vgg11", n_classes=1000)
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 64, 64, 3)))
    params, _, n = load_torchvision_vgg(p, variables["params"], variant="vgg11")
    out = np.asarray(net.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_densenet_param_count_golden():
    """densenet121 at 1000 classes = torchvision's published 7,978,856."""
    from biapy_tpu.models.densenet import DenseNet

    net = DenseNet(variant="densenet121", n_classes=1000)
    v = net.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == 7_978_856, n


def test_load_torchvision_densenet_bit_exact(tmp_path):
    import torch

    from biapy_tpu.models.densenet import (DenseNet, densenet_key_map,
                                           load_torchvision_densenet)
    from flax.traverse_util import flatten_dict

    net = DenseNet(variant="densenet121", n_classes=1000)
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 32, 32, 3)))
    pa, sa = densenet_key_map("densenet121")
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    assert "features.denseblock1.denselayer1.norm1.weight" in keys
    assert "features.denseblock4.denselayer16.conv2.weight" in keys
    assert "features.transition3.conv.weight" in keys
    assert "features.norm5.running_var" in keys
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "dn.pth")
    torch.save(sd, p)
    params, stats, n = load_torchvision_densenet(
        p, variables["params"], variables["batch_stats"])
    assert n == len(pa) + len(sa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey


def test_alexnet_param_golden_and_numeric_import(tmp_path):
    """AlexNet = torchvision's published 61,100,840 params; import verified
    NUMERICALLY against a live torch-built AlexNet (flatten-order fixup)."""
    import torch

    from biapy_tpu.models.alexnet import AlexNet, load_torchvision_alexnet

    net = AlexNet(n_classes=1000)
    v = net.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == 61_100_840, n

    torch.manual_seed(0)
    feats = torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, 11, 4, 2), torch.nn.ReLU(True),
        torch.nn.MaxPool2d(3, 2),
        torch.nn.Conv2d(64, 192, 5, padding=2), torch.nn.ReLU(True),
        torch.nn.MaxPool2d(3, 2),
        torch.nn.Conv2d(192, 384, 3, padding=1), torch.nn.ReLU(True),
        torch.nn.Conv2d(384, 256, 3, padding=1), torch.nn.ReLU(True),
        torch.nn.Conv2d(256, 256, 3, padding=1), torch.nn.ReLU(True),
        torch.nn.MaxPool2d(3, 2))
    cls = torch.nn.Sequential(
        torch.nn.Dropout(), torch.nn.Linear(256 * 36, 4096), torch.nn.ReLU(True),
        torch.nn.Dropout(), torch.nn.Linear(4096, 4096), torch.nn.ReLU(True),
        torch.nn.Linear(4096, 1000))
    feats.eval(); cls.eval()
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        h = feats(x)
        h = torch.nn.AdaptiveAvgPool2d((6, 6))(h)
        ref = cls(torch.flatten(h, 1)).numpy()
    sd = {f"features.{k}": w for k, w in feats.state_dict().items()}
    sd.update({f"classifier.{k}": w for k, w in cls.state_dict().items()})
    p = str(tmp_path / "alex.pth")
    torch.save(sd, p)
    params, _, _ = load_torchvision_alexnet(p, v["params"])
    out = np.asarray(net.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_tv_vit_param_golden_and_bit_exact_import(tmp_path):
    """vit_b_16 = torchvision's published 86,567,656 params; the packed
    in_proj q/k/v split + (D,H,hd) reshape is bit-exact (the reshape
    convention itself is verified numerically against
    torch.nn.MultiheadAttention in the module's development checks)."""
    import torch

    from biapy_tpu.models.vit_tv import (build_tv_vit, vit_key_map,
                                         load_torchvision_vit)
    from flax.traverse_util import flatten_dict

    net = build_tv_vit("vit_b_16", 1000)
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 224, 224, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n == 86_567_656, n

    # synth a torchvision-format state dict (packed in_proj)
    pa, sa = vit_key_map("vit_b_16")
    pflat = flatten_dict(variables["params"])
    vals = {}
    sd = {}
    packed = {}
    for i, (fpath, tkey, tf) in enumerate(pa):
        shape = np.shape(pflat[tuple(fpath)])
        a = np.full(shape, float(i + 1), np.float32)
        vals[tuple(fpath)] = float(i + 1)
        if "__" in tkey:  # goes into the packed in_proj tensor
            base, syn, leaf = tkey.rsplit(".", 2)
            packed.setdefault((base, leaf), {})[syn] = a
            continue
        if tf == "conv":
            a = a.transpose(3, 2, 0, 1)
        elif tf in ("linear", "linear_flat"):
            a = a.reshape(shape[0], -1).transpose(1, 0)
        sd[tkey] = torch.from_numpy(np.ascontiguousarray(a))
    for (base, leaf), roles in packed.items():
        rows = []
        for syn in ("__q__", "__k__", "__v__"):
            a = roles[syn]
            if leaf == "weight":
                a = a.reshape(a.shape[0], -1).transpose(1, 0)
            else:
                a = a.reshape(-1)
            rows.append(a)
        tname = "in_proj_weight" if leaf == "weight" else "in_proj_bias"
        sd[f"{base}.{tname}"] = torch.from_numpy(
            np.ascontiguousarray(np.concatenate(rows, axis=0)))
    p = str(tmp_path / "vit.pth")
    torch.save(sd, p)
    params, _, n_loaded = load_torchvision_vit(p, variables["params"],
                                               variant="vit_b_16")
    assert n_loaded == len(pa)
    pflat2 = flatten_dict(params)
    for fpath, want in vals.items():
        assert np.all(np.asarray(pflat2[fpath]) == want), fpath


@pytest.mark.parametrize("variant,want", [
    ("swin_t", 28_288_354), ("swin_s", 49_606_258), ("swin_b", 87_768_224)])
def test_swin_param_count_golden(variant, want):
    """Swin v1 param counts pinned to torchvision's published numbers;
    the shifted-window attention itself is numerically verified against
    the torchvision algorithm in the module's development checks."""
    from biapy_tpu.models.swin import Swin

    net = Swin(variant=variant, n_classes=1000)
    v = net.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, 224, 224, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == want, n


def test_swin_shifted_window_attention_reference():
    """Pure-numpy reference of one shifted window-attention pass (the
    torchvision algorithm: roll, 7x7 partition, rel-pos bias, region mask)
    vs the flax module — pins roll direction, partition order and bias
    indexing permanently in the fast suite."""
    from biapy_tpu.models.swin import _WindowAttention, _rel_index, _shift_mask

    rng = np.random.default_rng(0)
    H = W = 14; C = 8; heads = 2; w = 7; s = 3
    x = rng.standard_normal((1, H, W, C)).astype(np.float32)
    qkv_k = rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.1
    qkv_b = rng.standard_normal(3 * C).astype(np.float32) * 0.1
    proj_k = rng.standard_normal((C, C)).astype(np.float32) * 0.1
    proj_b = rng.standard_normal(C).astype(np.float32) * 0.1
    rpb = rng.standard_normal(((2 * w - 1) ** 2, heads)).astype(np.float32) * 0.1

    # numpy reference
    xr = np.roll(x, (-s, -s), axis=(1, 2))
    nh = H // w
    xw = xr.reshape(1, nh, w, nh, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(nh * nh, w * w, C)
    qkv = xw @ qkv_k + qkv_b
    hd = C // heads
    q, k, v = np.split(qkv, 3, axis=-1)
    q = q.reshape(-1, w * w, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(-1, w * w, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(-1, w * w, heads, hd).transpose(0, 2, 1, 3)
    attn = (q @ k.transpose(0, 1, 3, 2)) * (hd ** -0.5)
    attn = attn + rpb[_rel_index(w)].transpose(2, 0, 1)[None]
    attn = attn + _shift_mask(H, W, w, s)[:, None]
    attn = attn - attn.max(axis=-1, keepdims=True)
    attn = np.exp(attn); attn /= attn.sum(axis=-1, keepdims=True)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(-1, w * w, C) @ proj_k + proj_b
    out = out.reshape(1, nh, nh, w, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(1, H, W, C)
    ref = np.roll(out, (s, s), axis=(1, 2))

    mod = _WindowAttention(C, heads, s)
    params = {"qkv_kernel": qkv_k, "qkv_bias": qkv_b,
              "proj_kernel": proj_k, "proj_bias": proj_b, "rel_pos_bias": rpb}
    got = np.asarray(mod.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                               jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_load_torchvision_swin_bit_exact(tmp_path):
    import torch

    from biapy_tpu.models.swin import Swin, swin_key_map, load_torchvision_swin
    from flax.traverse_util import flatten_dict

    net = Swin(variant="swin_t", n_classes=1000)
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 224, 224, 3)))
    pa, sa = swin_key_map("swin_t")
    keys = {t for _, t, _ in pa}
    assert "features.0.0.weight" in keys and "features.0.2.weight" in keys
    assert "features.1.0.attn.qkv.weight" in keys
    assert "features.1.0.attn.relative_position_bias_table" in keys
    assert "features.2.reduction.weight" in keys
    assert "features.5.5.mlp.3.bias" in keys  # stage 3 has 6 blocks in tiny
    assert "norm.weight" in keys and "head.weight" in keys
    sd = _synth_tv_sd(pa, sa, variables)
    # torch state dicts also carry relative_position_index buffers — the
    # importer must IGNORE them (recomputed here)
    import numpy as _np

    sd["features.1.0.attn.relative_position_index"] = torch.zeros(49 * 49,
                                                                  dtype=torch.long)
    p = str(tmp_path / "swin.pth")
    torch.save(sd, p)
    params, _, n = load_torchvision_swin(p, variables["params"],
                                         variant="swin_t")
    assert n == len(pa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey


def test_inception_v3_param_golden_and_bit_exact(tmp_path):
    """inception_v3 (aux_logits) = torchvision's published 27,161,264
    params; bit-exact import through the BasicConv2d key map."""
    import torch

    from biapy_tpu.models.inception import (InceptionV3, inception_key_map,
                                            load_torchvision_inception)
    from flax.traverse_util import flatten_dict

    net = InceptionV3(n_classes=1000)
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 147, 147, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n == 27_161_264, n
    pa, sa = inception_key_map()
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    assert "Conv2d_1a_3x3.conv.weight" in keys
    assert "Mixed_5b.branch5x5_2.bn.running_var" in keys
    assert "Mixed_6b.branch7x7dbl_5.conv.weight" in keys
    assert "Mixed_7c.branch3x3dbl_3b.conv.weight" in keys
    assert "AuxLogits.fc.weight" in keys and "fc.bias" in keys
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "iv3.pth")
    torch.save(sd, p)
    params, stats, nl = load_torchvision_inception(
        p, variables["params"], variables["batch_stats"])
    assert nl == len(pa) + len(sa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey


# ---------------------------------------------------------------------------
# mobilenet_v2 + shufflenet_v2_* + vit_h_14 (reference: the whole torchvision
# classification namespace, models/__init__.py:1676)
# ---------------------------------------------------------------------------


def test_mobilenetv2_param_golden_and_bit_exact(tmp_path):
    """mobilenet_v2 = torchvision's published 3,504,872 params at 1000
    classes; bit-exact import through the features.{i}.conv.{j} key map."""
    import torch

    from biapy_tpu.models.mobilenetv2 import (MobileNetV2, mobilenetv2_key_map,
                                              load_torchvision_mobilenetv2)
    from flax.traverse_util import flatten_dict

    net = MobileNetV2(n_classes=1000)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n == 3_504_872, n
    pa, sa = mobilenetv2_key_map()
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    assert "features.0.0.weight" in keys
    # block 1 (t=1): dw at conv.0.0, project at conv.1
    assert "features.1.conv.0.0.weight" in keys
    assert "features.1.conv.2.running_mean" in keys
    # block 2 (t=6): expand conv.0.0, dw conv.1.0, project conv.2
    assert "features.2.conv.1.0.weight" in keys
    assert "features.2.conv.3.running_var" in keys
    assert "features.18.0.weight" in keys and "classifier.1.bias" in keys
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "mnv2.pth")
    torch.save(sd, p)
    params, stats, nl = load_torchvision_mobilenetv2(
        p, variables["params"], variables["batch_stats"])
    assert nl == len(pa) + len(sa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey


def test_shufflenet_param_golden_and_bit_exact(tmp_path):
    """shufflenet_v2_x0_5/x1_0/x1_5/x2_0 = torchvision's published
    1,366,792 / 2,278,604 / 3,503,624 / 7,393,996 params; bit-exact import
    through the stage{s}.{j}.branch{1,2} key map."""
    import torch

    from biapy_tpu.models.shufflenet import (ShuffleNetV2, shufflenet_key_map,
                                             load_torchvision_shufflenet)
    from flax.traverse_util import flatten_dict

    for variant, want in (("shufflenet_v2_x0_5", 1_366_792),
                          ("shufflenet_v2_x1_0", 2_278_604),
                          ("shufflenet_v2_x1_5", 3_503_624),
                          ("shufflenet_v2_x2_0", 7_393_996)):
        net = ShuffleNetV2(variant=variant, n_classes=1000)
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(variables["params"]))
        assert n == want, (variant, n)
    pa, sa = shufflenet_key_map("shufflenet_v2_x1_0")
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    assert "conv1.0.weight" in keys
    assert "stage2.0.branch1.0.weight" in keys
    assert "stage2.1.branch2.5.weight" in keys
    assert "stage4.3.branch2.6.running_var" in keys
    assert "conv5.0.weight" in keys and "fc.bias" in keys
    # stride-1 units must NOT claim branch1 keys
    assert "stage2.1.branch1.0.weight" not in keys
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "shuf.pth")
    torch.save(sd, p)
    params, stats, nl = load_torchvision_shufflenet(
        p, variables["params"], variables["batch_stats"],
        variant="shufflenet_v2_x1_0")
    assert nl == len(pa) + len(sa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey


def test_channel_shuffle_matches_torch_semantics():
    """Channels-last channel_shuffle == torch's NCHW channel_shuffle
    (reshape (g, c/g) -> transpose -> flatten on the channel axis)."""
    from biapy_tpu.models.shufflenet import _channel_shuffle

    x = np.arange(2 * 3 * 3 * 8, dtype=np.float32).reshape(2, 3, 3, 8)
    got = np.asarray(_channel_shuffle(jnp.asarray(x), 2))
    # torch: x.view(b, g, c//g, h, w).transpose(1, 2).reshape(b, c, h, w)
    xt = x.transpose(0, 3, 1, 2)
    b, c, h, w = xt.shape
    want = xt.reshape(b, 2, c // 2, h, w).transpose(0, 2, 1, 3, 4).reshape(
        b, c, h, w).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got, want)


def test_vit_h_14_variant():
    """vit_h_14 (patch 14, dim 1280, depth 32, heads 16) joins the TV ViT
    table; torchvision's published count is 632,045,800 at 1000 classes —
    too big to init here, so assert the analytic param arithmetic and that
    the builder/validator accept the name."""
    from biapy_tpu.models.vit_tv import _VARIANTS, build_tv_vit

    assert _VARIANTS["vit_h_14"] == (14, 1280, 32, 16)
    m = build_tv_vit("vit_h_14", 10)
    assert m.patch_size == 14 and m.embed_dim == 1280 and m.depth == 32
    p, d, depth, heads = _VARIANTS["vit_h_14"]
    n_tok = (224 // p) ** 2 + 1
    # exact per-block: ln1 (2d) + qkv (3d*d+3d) + proj (d*d+d) + ln2 (2d)
    # + mlp (d*4d+4d + 4d*d+d)
    per_block = 2 * d + 3 * d * d + 3 * d + d * d + d + 2 * d \
        + d * 4 * d + 4 * d + 4 * d * d + d
    analytic = (p * p * 3 + 1) * d + n_tok * d + d + depth * per_block \
        + 2 * d + d * 1000 + 1000      # final LN + head
    assert analytic == 632_045_800, analytic


def test_new_tv_names_accepted_by_validator():
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.check_configuration import check_configuration

    for name in ("mobilenet_v2", "shufflenet_v2_x1_0", "shufflenet_v2_x2_0",
                 "vit_h_14"):
        cfg = get_cfg_defaults()
        ps = [224, 224, 3] if name.startswith("vit") else [64, 64, 3]
        cfg.merge_from_dict({
            "PROBLEM": {"TYPE": "CLASSIFICATION", "NDIM": "2D"},
            "DATA": {"PATCH_SIZE": ps, "N_CLASSES": 3,
                     "TRAIN": {"PATH": "/tmp/x"}},
            "MODEL": {"SOURCE": "torchvision",
                      "TORCHVISION_MODEL_NAME": name,
                      "TORCHVISION_WEIGHTS": __file__},
            "TRAIN": {"ENABLE": True},
        })
        check_configuration(cfg)


def test_mnasnet_param_golden_and_bit_exact(tmp_path):
    """mnasnet0_5/0_75/1_0/1_3 = torchvision's published 2,218,512 /
    3,170,208 / 4,383,312 / 6,282,256 params; bit-exact import through the
    flat layers.{i} key map."""
    import torch

    from biapy_tpu.models.mnasnet import (MNASNet, mnasnet_key_map,
                                          load_torchvision_mnasnet)
    from flax.traverse_util import flatten_dict

    for variant, want in (("mnasnet0_5", 2_218_512),
                          ("mnasnet0_75", 3_170_208),
                          ("mnasnet1_0", 4_383_312),
                          ("mnasnet1_3", 6_282_256)):
        net = MNASNet(variant=variant, n_classes=1000)
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(variables["params"]))
        assert n == want, (variant, n)
    pa, sa = mnasnet_key_map("mnasnet1_0")
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    assert "layers.0.weight" in keys and "layers.6.weight" in keys
    assert "layers.8.0.layers.0.weight" in keys
    assert "layers.13.0.layers.7.running_var" in keys
    assert "layers.14.weight" in keys and "classifier.1.bias" in keys
    net = MNASNet(variant="mnasnet0_5", n_classes=1000)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    pa, sa = mnasnet_key_map("mnasnet0_5")
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "mnas.pth")
    torch.save(sd, p)
    params, stats, nl = load_torchvision_mnasnet(
        p, variables["params"], variables["batch_stats"],
        variant="mnasnet0_5")
    assert nl == len(pa) + len(sa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey


def test_googlenet_param_golden_and_bit_exact(tmp_path):
    """googlenet = torchvision's published 6,624,904 params without the aux
    heads / 13,004,888 with them (the pretrained state dict ships both);
    bit-exact import incl. the aux fc1 flatten-order fixup."""
    import torch

    from biapy_tpu.models.googlenet import (GoogLeNet, googlenet_key_map,
                                            load_torchvision_googlenet)
    from flax.traverse_util import flatten_dict

    net = GoogLeNet(n_classes=1000, aux_logits=False)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == 6_624_904, n
    net = GoogLeNet(n_classes=1000, aux_logits=True)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n == 13_004_888, n
    pa, sa = googlenet_key_map()
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    assert "conv1.conv.weight" in keys
    assert "inception3a.branch2.1.conv.weight" in keys
    assert "inception5b.branch4.1.bn.running_var" in keys
    assert "aux1.fc1.weight" in keys and "aux2.conv.bn.weight" in keys
    assert "fc.weight" in keys
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "goog.pth")
    torch.save(sd, p)
    params, stats, nl = load_torchvision_googlenet(
        p, variables["params"], variables["batch_stats"])
    assert nl == len(pa) + len(sa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        if "fc1" in tkey and "aux" in tkey:
            continue  # permuted by the flatten-order fixup (constant anyway)
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey


def test_googlenet_aux_adaptive_pool_matches_torch():
    """_adaptive_avg_pool(x, 4) == torch.nn.functional.adaptive_avg_pool2d
    on the 14x14 aux tap size (variable windows)."""
    import torch
    import torch.nn.functional as F

    from biapy_tpu.models.googlenet import _adaptive_avg_pool

    x = np.random.default_rng(0).standard_normal((2, 14, 14, 5)).astype(np.float32)
    got = np.asarray(_adaptive_avg_pool(jnp.asarray(x), 4))
    want = F.adaptive_avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 4).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("tv_name", ["mobilenet_v2", "shufflenet_v2_x0_5",
                                     "mnasnet0_5", "googlenet",
                                     "regnet_y_400mf"])
def test_new_tv_families_classification_e2e(tmp_path, tv_name):
    """Classification e2e for the round-5 torchvision families (reference:
    the whole classification namespace, models/__init__.py:1676)."""
    import os

    import torch

    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.data.tiff import write_tiff

    # synthesize a torchvision-format state dict from the family's key map
    if tv_name == "mobilenet_v2":
        from biapy_tpu.models.mobilenetv2 import MobileNetV2, mobilenetv2_key_map
        net, (pa, sa) = MobileNetV2(n_classes=1000), mobilenetv2_key_map()
    elif tv_name.startswith("shufflenet"):
        from biapy_tpu.models.shufflenet import ShuffleNetV2, shufflenet_key_map
        net = ShuffleNetV2(variant=tv_name, n_classes=1000)
        pa, sa = shufflenet_key_map(tv_name)
    elif tv_name.startswith("mnasnet"):
        from biapy_tpu.models.mnasnet import MNASNet, mnasnet_key_map
        net = MNASNet(variant=tv_name, n_classes=1000)
        pa, sa = mnasnet_key_map(tv_name)
    elif tv_name.startswith("regnet"):
        from biapy_tpu.models.regnet import RegNet, regnet_key_map
        net = RegNet(variant=tv_name, n_classes=1000)
        pa, sa = regnet_key_map(tv_name)
    else:
        from biapy_tpu.models.googlenet import GoogLeNet, googlenet_key_map
        net, (pa, sa) = GoogLeNet(n_classes=1000), googlenet_key_map()
    size = 224 if tv_name == "googlenet" else 64
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    sd = _synth_tv_sd(pa, sa, variables)
    wpath = str(tmp_path / f"{tv_name}.pth")
    torch.save(sd, wpath)

    rng = np.random.default_rng(5)
    root = str(tmp_path)
    for split, n in [("train", 8), ("test", 4)]:
        for cls in ("0", "1"):
            os.makedirs(f"{root}/{split}/{cls}", exist_ok=True)
            for i in range(n):
                base = 40 if cls == "0" else 180
                img = (rng.random((size, size, 3)) * 40 + base).astype(np.uint8)
                write_tiff(f"{root}/{split}/{cls}/{i}.tif", img)
    cfg = {
        "PROBLEM": {"TYPE": "CLASSIFICATION", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (size, size, 3), "N_CLASSES": 2,
                 "TRAIN": {"PATH": f"{root}/train", "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.25},
                 "TEST": {"PATH": f"{root}/test", "IN_MEMORY": True,
                          "LOAD_GT": True}},
        "MODEL": {"SOURCE": "torchvision",
                  "TORCHVISION_MODEL_NAME": tv_name,
                  "TORCHVISION_WEIGHTS": wpath},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": "ADAMW", "LR": 1.0e-3,
                  "BATCH_SIZE": 4, "EPOCHS": 1},
        "TEST": {"ENABLE": True},
    }
    job = BiaPy(cfg, result_dir=os.path.join(root, "results"),
                name=f"tv_{tv_name}", silent=True)
    job.run_job()
    assert "accuracy" in job.workflow.stats


def test_regnet_param_golden_and_structure():
    """RegNet stage derivation matches the RegNet paper / torchvision
    BlockParams: pinned stage widths+depths for X/Y 400MF-1.6GF and param
    counts corroborated against torchvision/pycls published values."""
    from biapy_tpu.models.regnet import RegNet, regnet_stage_params

    # (variant, stage_widths, stage_depths, params or None)
    want = (
        ("regnet_y_400mf", [48, 104, 208, 440], [1, 3, 6, 6], 4_344_144),
        ("regnet_x_400mf", [32, 64, 160, 384], [1, 2, 7, 12], 5_157_512),
        ("regnet_y_800mf", [64, 128, 320, 768], [1, 3, 8, 2], 6_263_168),
        ("regnet_x_800mf", [64, 128, 288, 672], [1, 3, 7, 5], 7_259_656),
        ("regnet_y_1_6gf", [48, 120, 336, 888], [2, 6, 17, 2], 11_202_430),
        ("regnet_x_1_6gf", [72, 168, 408, 912], [2, 4, 10, 2], 9_190_136),
        # 128gf structure pinned; its 644,812,894 params verified once at
        # authoring (2.6 GB init — too heavy for the fast suite)
        ("regnet_y_128gf", [528, 1056, 2904, 7392], [2, 7, 17, 1], None),
    )
    for variant, widths, depths, n_want in want:
        w, d, g, se = regnet_stage_params(variant)
        assert w == widths and d == depths, (variant, w, d)
        assert (se == 0.25) == variant.startswith("regnet_y")
        if n_want is None:
            continue
        net = RegNet(variant=variant, n_classes=1000)
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(v["params"]))
        assert n == n_want, (variant, n)


def test_regnet_key_map_and_bit_exact(tmp_path):
    import torch

    from biapy_tpu.models.regnet import (RegNet, regnet_key_map,
                                         load_torchvision_regnet)
    from flax.traverse_util import flatten_dict

    pa, sa = regnet_key_map("regnet_y_400mf")
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    assert "stem.0.weight" in keys
    assert "trunk_output.block1.block1-0.proj.0.weight" in keys
    assert "trunk_output.block1.block1-0.f.a.0.weight" in keys
    assert "trunk_output.block2.block2-1.f.b.1.running_var" in keys
    assert "trunk_output.block4.block4-5.f.se.fc1.bias" in keys
    assert "trunk_output.block2.block2-1.proj.0.weight" not in keys
    assert "fc.weight" in keys
    net = RegNet(variant="regnet_y_400mf", n_classes=1000)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "regnet.pth")
    torch.save(sd, p)
    params, stats, nl = load_torchvision_regnet(
        p, variables["params"], variables["batch_stats"],
        variant="regnet_y_400mf")
    assert nl == len(pa) + len(sa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey


def test_efficientnet_v2_param_golden_and_bit_exact(tmp_path):
    """efficientnet_v2_s/m/l = torchvision's published 21,458,488 /
    54,139,356 / 118,515,272 params; bit-exact import through the
    FusedMBConv/MBConv key map."""
    import torch

    from biapy_tpu.models.efficientnet_v2 import (
        EfficientNetV2, efficientnet_v2_key_map,
        load_torchvision_efficientnet_v2)
    from flax.traverse_util import flatten_dict

    for variant, want in (("efficientnet_v2_s", 21_458_488),
                          ("efficientnet_v2_m", 54_139_356),
                          ("efficientnet_v2_l", 118_515_272)):
        net = EfficientNetV2(variant=variant, n_classes=1000)
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(variables["params"]))
        assert n == want, (variant, n)
    pa, sa = efficientnet_v2_key_map("efficientnet_v2_s")
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    assert "features.0.0.weight" in keys
    # stage 0 (fused, expand 1): single conv at block.0
    assert "features.1.0.block.0.0.weight" in keys
    assert "features.1.0.block.1.0.weight" not in keys
    # stage 1 (fused, expand 4): expand at block.0, project at block.1
    assert "features.2.0.block.1.0.weight" in keys
    # stage 3 (MBConv): SE at block.2
    assert "features.4.0.block.2.fc1.weight" in keys
    assert "features.4.0.block.3.1.running_var" in keys
    assert "features.7.0.weight" in keys and "classifier.1.bias" in keys
    net = EfficientNetV2(variant="efficientnet_v2_s", n_classes=1000)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "effv2.pth")
    torch.save(sd, p)
    params, stats, nl = load_torchvision_efficientnet_v2(
        p, variables["params"], variables["batch_stats"],
        variant="efficientnet_v2_s")
    assert nl == len(pa) + len(sa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey


@pytest.mark.parametrize("variant,want", [
    ("swin_v2_t", 28_351_570), ("swin_v2_s", 49_737_442),
    ("swin_v2_b", 87_930_848)])
def test_swin_v2_param_count_golden(variant, want):
    """Param parity vs torchvision's published Swin V2 counts (256-input,
    window 8, cosine attention + CPB MLP + post-norm)."""
    from biapy_tpu.models.swin import SwinV2

    net = SwinV2(variant=variant, n_classes=1000)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == want, (variant, n)


def test_swin_v2_cosine_attention_reference():
    """Pure-numpy reference of one Swin V2 window-attention pass (the
    torchvision algorithm: L2-normalized q/k, clamped learned logit scale,
    16*sigmoid(cpb_mlp(log-coords)) bias) vs the flax module."""
    from biapy_tpu.models.swin import (_WindowAttentionV2, _cpb_table,
                                       _rel_index, _shift_mask)

    rng = np.random.default_rng(1)
    H = W = 16; C = 8; heads = 2; w = 8; s = 4
    x = rng.standard_normal((1, H, W, C)).astype(np.float32)
    qkv_k = rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.1
    qkv_b = rng.standard_normal(3 * C).astype(np.float32) * 0.1
    proj_k = rng.standard_normal((C, C)).astype(np.float32) * 0.1
    proj_b = rng.standard_normal(C).astype(np.float32) * 0.1
    logit_scale = rng.standard_normal((heads, 1, 1)).astype(np.float32)
    cpb1_k = rng.standard_normal((2, 512)).astype(np.float32) * 0.1
    cpb1_b = rng.standard_normal(512).astype(np.float32) * 0.1
    cpb2_k = rng.standard_normal((512, heads)).astype(np.float32) * 0.1

    xr = np.roll(x, (-s, -s), axis=(1, 2))
    nh = H // w
    xw = xr.reshape(1, nh, w, nh, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(nh * nh, w * w, C)
    qkv = xw @ qkv_k + qkv_b
    hd = C // heads
    q, k, v = np.split(qkv, 3, axis=-1)
    q = q.reshape(-1, w * w, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(-1, w * w, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(-1, w * w, heads, hd).transpose(0, 2, 1, 3)
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    k = k / np.maximum(np.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    scale = np.exp(np.minimum(logit_scale, np.log(100.0)))
    attn = (q @ k.transpose(0, 1, 3, 2)) * scale[None]
    tbl = _cpb_table(w)[0]
    cpb = np.maximum(tbl @ cpb1_k + cpb1_b, 0.0) @ cpb2_k
    bias = 16.0 / (1.0 + np.exp(-cpb))
    attn = attn + bias[_rel_index(w)].transpose(2, 0, 1)[None]
    attn = attn + _shift_mask(H, W, w, s)[:, None]
    attn = attn - attn.max(axis=-1, keepdims=True)
    attn = np.exp(attn); attn /= attn.sum(axis=-1, keepdims=True)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(-1, w * w, C) @ proj_k + proj_b
    out = out.reshape(1, nh, nh, w, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(1, H, W, C)
    ref = np.roll(out, (s, s), axis=(1, 2))

    mod = _WindowAttentionV2(C, heads, s)
    params = {"qkv_kernel": qkv_k, "qkv_bias": qkv_b,
              "proj_kernel": proj_k, "proj_bias": proj_b,
              "logit_scale": logit_scale, "cpb1_kernel": cpb1_k,
              "cpb1_bias": cpb1_b, "cpb2_kernel": cpb2_k}
    got = np.asarray(mod.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_load_torchvision_swin_v2_bit_exact(tmp_path):
    import torch

    from biapy_tpu.models.swin import (SwinV2, swin_v2_key_map,
                                       load_torchvision_swin_v2)
    from flax.traverse_util import flatten_dict

    net = SwinV2(variant="swin_v2_t", n_classes=1000)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    pa, sa = swin_v2_key_map("swin_v2_t")
    keys = {t for _, t, _ in pa}
    assert "features.1.0.attn.logit_scale" in keys
    assert "features.1.0.attn.cpb_mlp.0.weight" in keys
    assert "features.1.0.attn.cpb_mlp.2.weight" in keys
    assert "features.2.reduction.weight" in keys
    sd = _synth_tv_sd(pa, sa, variables)
    # torch state dicts also carry recomputed buffers — must be ignored
    sd["features.1.0.attn.relative_coords_table"] = torch.zeros(1, 15, 15, 2)
    sd["features.1.0.attn.relative_position_index"] = torch.zeros(64, 64)
    p = str(tmp_path / "swinv2.pth")
    torch.save(sd, p)
    params, _, n = load_torchvision_swin_v2(
        p, variables["params"], variant="swin_v2_t")
    assert n == len(pa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey


def test_deeplabv3_mobilenet_param_golden_and_key_map(tmp_path):
    """deeplabv3_mobilenet_v3_large = torchvision's published 11,029,328
    params at 21 classes; backbone keys are backbone.{idx} (no 'features.'
    segment) and the head/aux maps are shared with the resnet variants."""
    import torch

    from biapy_tpu.models.deeplab import (DeepLabV3, deeplabv3_key_map,
                                          load_torchvision_deeplabv3)
    from flax.traverse_util import flatten_dict

    net = DeepLabV3(variant="deeplabv3_mobilenet_v3_large", n_classes=21)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n == 11_029_328, n
    pa, sa = deeplabv3_key_map("deeplabv3_mobilenet_v3_large")
    keys = {t for _, t, _ in pa} | {t for _, t, _ in sa}
    assert "backbone.0.0.weight" in keys
    assert "backbone.16.0.weight" in keys
    assert not any(".features." in k for k in keys)
    assert "classifier.0.convs.0.0.weight" in keys
    assert "aux_classifier.0.weight" in keys
    sd = _synth_tv_sd(pa, sa, variables)
    p = str(tmp_path / "dlv3m.pth")
    torch.save(sd, p)
    params, stats, nl = load_torchvision_deeplabv3(
        p, variables["params"], variables["batch_stats"],
        variant="deeplabv3_mobilenet_v3_large")
    assert nl == len(pa) + len(sa)
    pflat = flatten_dict(params)
    for i, (fpath, tkey, tf) in enumerate(pa):
        assert np.all(np.asarray(pflat[tuple(fpath)]) == float(i + 1)), tkey
