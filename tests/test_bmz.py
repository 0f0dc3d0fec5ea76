"""BMZ (BioImage Model Zoo) export/import round-trip and torch weight import
(reference: export_model_to_bmz _biapy.py:1012, build_bmz_model
models/__init__.py:943, check_bmz_args :1119).
"""

import os

import numpy as np
import pytest

from biapy_tpu.data.tiff import write_tiff


def _tiny_data(root, n=4):
    os.makedirs(f"{root}/train/x"); os.makedirs(f"{root}/train/y")
    os.makedirs(f"{root}/test/x"); os.makedirs(f"{root}/test/y")
    rng = np.random.default_rng(0)
    for d, k in (("train", n), ("test", 2)):
        for i in range(k):
            img = rng.random((64, 64), np.float32)
            msk = (img > 0.5).astype(np.uint8) * 255
            write_tiff(f"{root}/{d}/x/{i:02d}.tif", (img * 255).astype(np.uint8))
            write_tiff(f"{root}/{d}/y/{i:02d}.tif", msk)


def _base_cfg(root):
    return {
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (32, 32, 1),
                 "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y"},
                 "VAL": {"SPLIT_TRAIN": 0.5},
                 "TEST": {"PATH": f"{root}/test/x", "GT_PATH": f"{root}/test/y",
                          "LOAD_GT": True}},
        "AUGMENTOR": {"ENABLE": False},
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [4, 8],
                  "DROPOUT_VALUES": [0.0, 0.0], "Z_DOWN": [2, 2],
                  "YX_DOWN": [2, 2], "CONV_LAYERS": [2, 2]},
        "TRAIN": {"ENABLE": True, "EPOCHS": 1, "BATCH_SIZE": 2},
        "TEST": {"ENABLE": False},
    }


def test_bmz_export_import_roundtrip(tmp_path):
    root = str(tmp_path)
    _tiny_data(root)
    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.utils.bmz import export_model_to_bmz, load_bmz_model_weights, read_bmz_rdf

    job = BiaPy(_base_cfg(root), result_dir=root + "/results", name="bmzjob", silent=True)
    job.train()
    zpath = export_model_to_bmz(job.workflow, root + "/bmz_out", model_name="mymodel")
    assert os.path.exists(zpath)

    rdf = read_bmz_rdf(zpath)
    assert rdf["type"] == "model" and rdf["name"] == "mymodel"

    # weights round-trip exactly onto a freshly-built model
    import jax

    params0 = job.workflow.state.params
    cfg2 = _base_cfg(root)
    cfg2["MODEL"]["SOURCE"] = "bmz"
    cfg2["MODEL"]["BMZ"] = {"SOURCE_MODEL_ID": zpath}
    cfg2["TRAIN"]["ENABLE"] = False
    cfg2["TEST"]["ENABLE"] = True
    job2 = BiaPy(cfg2, result_dir=root + "/results", name="bmzjob2", silent=True)
    job2._build_workflow()
    job2.workflow.prepare_model()
    for a, b in zip(jax.tree.leaves(params0), jax.tree.leaves(job2.workflow.state.params)):
        assert np.allclose(np.asarray(a), np.asarray(b)), "BMZ round-trip changed weights"

    # the imported model reproduces the packaged test tensor
    import zipfile

    with zipfile.ZipFile(zpath) as z:
        with z.open("test_input.npy") as f:
            tin = np.load(f)
        with z.open("test_output.npy") as f:
            tout = np.load(f)
    out2 = np.asarray(job2.workflow.predict_patches(tin))
    assert np.allclose(out2, tout, atol=1e-5), "imported model disagrees with packaged test tensor"


def test_bmz_import_adapts_config(tmp_path):
    """MODEL section comes from the package when the user leaves it empty."""
    root = str(tmp_path)
    _tiny_data(root)
    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.utils.bmz import export_model_to_bmz

    job = BiaPy(_base_cfg(root), result_dir=root + "/results", name="bmzsrc", silent=True)
    job.train()
    zpath = export_model_to_bmz(job.workflow, root + "/bmz_out", model_name="m2")

    cfg = _base_cfg(root)
    cfg["MODEL"] = {"SOURCE": "bmz", "BMZ": {"SOURCE_MODEL_ID": zpath}}
    cfg["TRAIN"]["ENABLE"] = False
    cfg.setdefault("TEST", {})["ENABLE"] = True  # at least one phase must run
    job2 = BiaPy(cfg, result_dir=root + "/results", name="bmzdst", silent=True)
    assert list(job2.cfg.MODEL.FEATURE_MAPS) == [4, 8]
    assert job2.cfg.MODEL.ARCHITECTURE == "unet"


def test_torch_state_dict_import():
    """Ordered shape-matched torch->flax conversion places every tensor."""
    import jax
    import jax.numpy as jnp

    from biapy_tpu.models import build_model
    from biapy_tpu.config.config import Config
    from biapy_tpu.utils.bmz import import_torch_state_dict

    c = Config(".", "t")
    cfg = c.get_cfg_defaults()
    cfg.merge_from_dict({"MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [4, 8],
                                   "DROPOUT_VALUES": [0.0, 0.0], "Z_DOWN": [2, 2],
                                   "YX_DOWN": [2, 2], "CONV_LAYERS": [2, 2]},
                         "DATA": {"PATCH_SIZE": (32, 32, 1)}})
    model, _ = build_model(cfg, [1], ["sem"], ["ce_sigmoid"])
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 1)), train=False)
    params = variables["params"]

    # fabricate a torch-style state dict from the flax tree itself
    # (conv kernels HWIO -> OIHW, so the importer has to transpose back)
    leaves = jax.tree.leaves(params)
    sd = {}
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        if a.ndim >= 3:
            a = np.transpose(a, (a.ndim - 1, a.ndim - 2) + tuple(range(a.ndim - 2)))
        elif a.ndim == 2:
            a = a.T
        sd[f"layer{i}.weight"] = a

    new_params, _ = import_torch_state_dict({k: np.asarray(v) for k, v in sd.items()}, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_params)):
        assert a.shape == b.shape


def test_torch_state_dict_import_bn_true_registration_order():
    """Module-structured matching must survive real torch ordering: per
    module, gamma (weight) is registered BEFORE beta (bias) while flax's
    sorted flatten yields bias before scale — identical (C,) shapes, so an
    order-based matcher silently swaps them. Values are index-tagged so a
    swap is detected exactly."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from biapy_tpu.utils.bmz import import_torch_state_dict

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (3, 3), name="conv0")(x)
            x = nn.BatchNorm(use_running_average=not train, name="bn0")(x)
            x = nn.Conv(2, (1, 1), name="conv1")(x)
            return x

    net = Net()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    params, stats = variables["params"], variables["batch_stats"]

    sd = {
        "conv0.weight": np.full((4, 1, 3, 3), 1.0, np.float32),  # OIHW
        "conv0.bias": np.full((4,), 2.0, np.float32),
        "bn0.weight": np.full((4,), 3.0, np.float32),            # gamma
        "bn0.bias": np.full((4,), 4.0, np.float32),              # beta
        "bn0.running_mean": np.full((4,), 5.0, np.float32),
        "bn0.running_var": np.full((4,), 6.0, np.float32),
        "bn0.num_batches_tracked": np.asarray(7),
        "conv1.weight": np.full((2, 4, 1, 1), 8.0, np.float32),
        "conv1.bias": np.full((2,), 9.0, np.float32),
    }
    new_params, new_stats = import_torch_state_dict(sd, params, stats)
    assert float(np.unique(new_params["conv0"]["kernel"])) == 1.0
    assert new_params["conv0"]["kernel"].shape == params["conv0"]["kernel"].shape
    assert float(np.unique(new_params["bn0"]["scale"])) == 3.0  # gamma -> scale
    assert float(np.unique(new_params["bn0"]["bias"])) == 4.0   # beta -> bias
    assert float(np.unique(new_stats["bn0"]["mean"])) == 5.0
    assert float(np.unique(new_stats["bn0"]["var"])) == 6.0
    assert float(np.unique(new_params["conv1"]["kernel"])) == 8.0


def test_bmz_finetune_reuses_original_model_card(tmp_path):
    """Import a BMZ package, finetune it, and re-export under the original
    model card (reference run_checks Test28: 'frank-boar' import, finetune,
    export with reuse_original_bmz_config; run_job _biapy.py:1915)."""
    import glob
    import jax

    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.utils.bmz import read_bmz_rdf

    root = str(tmp_path)
    _tiny_data(root)

    # original export with a full model card
    cfg = _base_cfg(root)
    cfg["MODEL"]["BMZ"] = {"EXPORT": {
        "ENABLE": True, "MODEL_NAME": "nucleus-model",
        "DESCRIPTION": "original card description",
        "AUTHORS": [{"name": "Ada", "github_user": "ada"}],
        "TAGS": ["nucleus", "2d"],
        "CITE": [{"text": "Ada et al.", "doi": "10.1/xyz"}],
    }}
    job = BiaPy(cfg, result_dir=root + "/res1", name="orig", silent=True)
    job.run_job()
    zpath = glob.glob(root + "/res1/orig/**/nucleus-model.zip", recursive=True)[0]
    w0 = jax.tree.leaves(job.workflow.state.params)

    # finetune the package and re-export reusing its card
    cfg2 = _base_cfg(root)
    cfg2["MODEL"] = {"SOURCE": "bmz", "BMZ": {
        "SOURCE_MODEL_ID": zpath,
        "EXPORT": {"ENABLE": True, "REUSE_BMZ_CONFIG": True}}}
    cfg2["TRAIN"] = {"ENABLE": True, "EPOCHS": 2, "BATCH_SIZE": 2}
    cfg2["TEST"] = {"ENABLE": True}
    job2 = BiaPy(cfg2, result_dir=root + "/res2", name="ft", silent=True)
    job2.run_job()

    # weights actually moved (finetuning happened on the imported weights)
    w1 = jax.tree.leaves(job2.workflow.state.params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(w0, w1))

    zpath2 = glob.glob(root + "/res2/ft/**/nucleus-model.zip", recursive=True)
    assert zpath2, "re-export must carry the original package name"
    rdf = read_bmz_rdf(zpath2[0])
    assert rdf["name"] == "nucleus-model"
    assert rdf["description"] == "original card description"
    assert rdf["authors"] == [{"name": "Ada", "github_user": "ada"}]
    assert rdf["tags"] == ["nucleus", "2d"]
    assert rdf["cite"] == [{"text": "Ada et al.", "doi": "10.1/xyz"}]
