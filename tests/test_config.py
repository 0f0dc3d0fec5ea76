import glob
import os

import pytest
import yaml

from biapy_tpu.config.config import CN, get_cfg_defaults
from biapy_tpu.config.migrate import convert_old_model_cfg_to_current_version, diff_between_configs

TEMPLATES = sorted(glob.glob("/root/reference/templates/**/*.yaml", recursive=True))


def test_defaults_tree():
    cfg = get_cfg_defaults("/tmp/job", "run1")
    assert cfg.PROBLEM.TYPE == "SEMANTIC_SEG"
    assert cfg.PROBLEM.NDIM == "2D"
    assert isinstance(cfg.DATA.PATCH_SIZE, (tuple, list))
    assert cfg.PATHS.CHECKPOINT == "/tmp/job/checkpoints"
    assert cfg.LOG.LOG_FILE_PREFIX == "run1"
    # derived instance channel dir carries the channel code tag
    assert "y_BC" in cfg.DATA.TRAIN.INSTANCE_CHANNELS_MASK_DIR


def test_tuple_string_coercion():
    cfg = get_cfg_defaults()
    cfg.merge_from_dict({"DATA": {"PATCH_SIZE": "(256, 256, 1)"}})
    assert tuple(cfg.DATA.PATCH_SIZE) == (256, 256, 1)


def test_scalar_to_list_promotion():
    cfg = get_cfg_defaults()
    cfg.merge_from_dict({"TRAIN": {"OPTIMIZER": "ADAMW", "LR": 0.001}})
    assert cfg.TRAIN.OPTIMIZER == ["ADAMW"]
    assert cfg.TRAIN.LR == [0.001]


def test_unknown_key_rejected():
    cfg = get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_dict({"TRAIN": {"NO_SUCH_KEY": 1}})


def test_freeze():
    cfg = get_cfg_defaults()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.EPOCHS = 3
    cfg.defrost()
    cfg.TRAIN.EPOCHS = 3
    assert cfg.TRAIN.EPOCHS == 3


def test_clone_and_dump_roundtrip():
    cfg = get_cfg_defaults()
    cfg.TRAIN.EPOCHS = 7
    c2 = cfg.clone()
    assert c2.TRAIN.EPOCHS == 7
    loaded = yaml.safe_load(cfg.dump())
    assert loaded["TRAIN"]["EPOCHS"] == 7


def test_merge_from_list():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["TRAIN.EPOCHS", "12", "PROBLEM.NDIM", "3D"])
    assert cfg.TRAIN.EPOCHS == 12
    assert cfg.PROBLEM.NDIM == "3D"


# Templates the reference's OWN current validator rejects (stale upstream):
# 3d_super-resolution.yaml: patch z=6 with the default 5-level resunet —
# z collapses to 0 at level 2 (both frameworks crash at the skip concat;
# reference check_configuration.py:3142 rejects it as well).
KNOWN_INVALID_TEMPLATES = ("super-resolution/3d_super-resolution.yaml",)


@pytest.mark.parametrize("template", TEMPLATES, ids=lambda t: t.split("templates/")[1])
def test_all_reference_templates_merge(template):
    """Every shipped reference template must merge AND pass full validation
    (the product gate a user's YAML goes through)."""
    from biapy_tpu.config.config import update_dependencies
    from biapy_tpu.engine.check_configuration import check_configuration

    cfg = get_cfg_defaults("/tmp/job", "run1")
    raw = yaml.safe_load(open(template)) or {}
    cfg.merge_from_dict(convert_old_model_cfg_to_current_version(raw))
    update_dependencies(cfg, "/tmp/job", "run1")
    if any(template.endswith(k) for k in KNOWN_INVALID_TEMPLATES):
        with pytest.raises(ValueError, match="not divisible"):
            check_configuration(cfg, "run1")
        return
    check_configuration(cfg, "run1")


OWN_TEMPLATES = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "templates", "**", "*.yaml"),
    recursive=True))


@pytest.mark.parametrize("template", OWN_TEMPLATES,
                         ids=lambda t: t.split("templates/")[-1])
def test_shipped_templates_validate(template):
    """Every starter template this repo ships must merge and pass full
    validation — they are the first thing a new user runs."""
    from biapy_tpu.config.config import update_dependencies
    from biapy_tpu.engine.check_configuration import check_configuration

    assert OWN_TEMPLATES, "templates/ must ship starter configs"
    cfg = get_cfg_defaults("/tmp/job", "run1")
    raw = yaml.safe_load(open(template)) or {}
    cfg.merge_from_dict(convert_old_model_cfg_to_current_version(raw))
    update_dependencies(cfg, "/tmp/job", "run1")
    check_configuration(cfg, "run1")


def test_migration_da_prob_fanout():
    raw = {"AUGMENTOR": {"ENABLE": True, "DA_PROB": 0.7, "VFLIP": True}}
    new = convert_old_model_cfg_to_current_version(raw)
    assert "DA_PROB" not in new["AUGMENTOR"]
    assert new["AUGMENTOR"]["VFLIP_PROB"] == 0.7
    assert new["AUGMENTOR"]["ZOOM_PROB"] == 0.7


def test_migration_channel_string():
    raw = {"PROBLEM": {"NDIM": "2D", "INSTANCE_SEG": {"DATA_CHANNELS": "BC"}}}
    new = convert_old_model_cfg_to_current_version(raw)
    assert new["PROBLEM"]["INSTANCE_SEG"]["DATA_CHANNELS"] == ["F", "C"]


def test_diff_between_configs():
    d = diff_between_configs({"A": {"B": 1, "C": 2}}, {"A": {"B": 1, "C": 3}})
    assert d == [("A.C", 2, 3)]


def test_safetensors_config_rejected_with_guidance(tmp_path):
    """Reference parity (check_api.py:205-250): building a workflow from a
    .safetensors file is rejected with guidance to use the .ckpt."""
    import pytest

    from biapy_tpu._biapy import BiaPy

    p = str(tmp_path / "weights.safetensors")
    open(p, "wb").write(b"\x00" * 8)
    with pytest.raises(ValueError, match="safetensors.*weights"):
        BiaPy(p, result_dir=str(tmp_path), name="x", silent=True)


@pytest.mark.parametrize("bad,msg_frag", [
    ({"TRAIN": {"ENABLE": False}, "TEST": {"ENABLE": False}}, "At least one"),
    ({"LOSS": {"TYPE": "DICE"}, "DATA": {"N_CLASSES": 3}}, "N_CLASSES > 2"),
    ({"LOSS": {"CLASS_REBALANCE": "manual"}}, "CLASS_WEIGHTS"),
    ({"LOSS": {"IGNORE_INDEX": 300}}, "IGNORE_INDEX"),
    ({"TEST": {"POST_PROCESSING": {"MEDIAN_FILTER": True}}}, "MEDIAN_FILTER"),
    ({"TEST": {"POST_PROCESSING": {"MEDIAN_FILTER": True,
                                   "MEDIAN_FILTER_AXIS": ["z"],
                                   "MEDIAN_FILTER_SIZE": [3]}}}, "z-axis"),
    ({"TEST": {"POST_PROCESSING": {"DET_WATERSHED": True}}}, "DET_WATERSHED"),
    ({"TEST": {"ANALIZE_2D_IMGS_AS_3D_STACK": True},
      "PROBLEM": {"NDIM": "3D"},
      "DATA": {"PATCH_SIZE": (16, 64, 64, 1)}}, "3D"),
    ({"LOSS": {"CONTRAST": {"ENABLE": True}},
      "PROBLEM": {"TYPE": "SUPER_RESOLUTION",
                  "SUPER_RESOLUTION": {"UPSCALING": (2, 2)}}}, "CONTRAST"),
    # rules ported in the second validator pass (reference
    # check_configuration.py:1908-3400)
    ({"TRAIN": {"ENABLE": False}, "TEST": {"ENABLE": True}}, "LOAD_CHECKPOINT"),
    ({"TRAIN": {"OPTIMIZER": ["ADAMW", "ADAMW"], "LR": [1e-3, 1e-3]}},
     "single loss head"),
    ({"TRAIN": {"OPT_BETAS": [0.9, 0.99, 0.5]}}, "OPT_BETAS"),
    ({"TRAIN": {"GRADIENT_CLIP_NORM": -1.0}}, "GRADIENT_CLIP_NORM"),
    ({"TRAIN": {"LR_SCHEDULER": {"NAME": "reduceonplateau",
                                 "REDUCEONPLATEAU_PATIENCE": 30},
                "PATIENCE": 10}}, "REDUCEONPLATEAU_PATIENCE"),
    ({"DATA": {"VAL": {"FROM_TRAIN": True, "SPLIT_TRAIN": 0.0}}}, "SPLIT_TRAIN"),
    ({"DATA": {"VAL": {"CROSS_VAL": True, "FROM_TRAIN": False}}}, "FROM_TRAIN"),
    ({"DATA": {"TEST": {"USE_VAL_AS_TEST": True}}}, "USE_VAL_AS_TEST"),
    ({"PROBLEM": {"TYPE": "SUPER_RESOLUTION",
                  "SUPER_RESOLUTION": {"UPSCALING": (2, 2)}},
      "DATA": {"NORMALIZATION": {"TYPE": "zero_mean_unit_variance"}}},
     "SR workflow"),
    ({"DATA": {"NORMALIZATION": {"PERC_CLIP": {"ENABLE": True}}}}, "PERC_CLIP"),
    ({"MODEL": {"UPSAMPLE_LAYER": "nearest"}}, "UPSAMPLE_LAYER"),
    ({"MODEL": {"CONV_BLOCK_ORDER": "norm_act_conv", "ARCHITECTURE": "unext_v1"}},
     "pre-activation"),
    ({"MODEL": {"Z_DOWN": [3, 3]}}, "Z_DOWN"),
    ({"MODEL": {"ARCHITECTURE": "mae"}}, "SELF_SUPERVISED"),
    ({"MODEL": {"ARCHITECTURE": "efficientnet_b0"},
      "PROBLEM": {"TYPE": "CLASSIFICATION", "NDIM": "3D"},
      "DATA": {"PATCH_SIZE": (16, 64, 64, 1)}}, "2D"),
    ({"PROBLEM": {"TYPE": "DENOISING"},
      "DATA": {"TEST": {"LOAD_GT": True}}}, "unsupervised"),
    ({"PROBLEM": {"TYPE": "SELF_SUPERVISED",
                  "SELF_SUPERVISED": {"RESIZING_FACTOR": 3}}},
     "RESIZING_FACTOR"),
    ({"PROBLEM": {"TYPE": "CLASSIFICATION"},
      "DATA": {"N_CLASSES": 3},
      "MODEL": {"ARCHITECTURE": "simple_cnn"},
      "TRAIN": {"METRICS": ["top-5-accuracy"]}}, "top-5-accuracy"),
    ({"AUGMENTOR": {"ENABLE": True, "ZOOM_RANGE": [0.01, 1.5]}}, "ZOOM_RANGE"),
    ({"AUGMENTOR": {"ENABLE": True, "GAMMA_CONTRAST": True}}, "GAMMA_CONTRAST"),
    ({"TEST": {"POST_PROCESSING": {"REMOVE_CLOSE_POINTS": True,
                                   "REMOVE_CLOSE_POINTS_RADIUS": 5}},
      "PROBLEM": {"TYPE": "DETECTION"}}, "RESOLUTION"),
    ({"TEST": {"DET_POINT_CREATION_FUNCTION": "argmax"},
      "PROBLEM": {"TYPE": "DETECTION"}}, "DET_POINT_CREATION_FUNCTION"),
    ({"TEST": {"BY_CHUNKS": {"ENABLE": True, "Z_START": 10, "Z_END": 5}},
      "PROBLEM": {"NDIM": "3D"},
      "DATA": {"PATCH_SIZE": (16, 64, 64, 1)}}, "Z_START"),
    ({"DATA": {"PREPROCESS": {"TEST": True,
                              "RESIZE": {"ENABLE": True,
                                         "OUTPUT_SHAPE": [32, 32]}}}},
     "OUTPUT_SHAPE"),
    ({"MODEL": {"BMZ": {"EXPORT": {"ENABLE": True}}}}, "MODEL_NAME"),
    ({"MODEL": {"BMZ": {"EXPORT": {"ENABLE": True, "REUSE_BMZ_CONFIG": True}}}},
     "nothing to reuse"),
])
def test_validation_rejects(bad, msg_frag):
    """New cross-field rules ported from the reference validator
    (check_configuration.py:54,989,1185,1330-1399,1403)."""
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.check_configuration import check_configuration

    cfg = get_cfg_defaults()
    base = {"PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
            "DATA": {"PATCH_SIZE": (64, 64, 1)},
            "TRAIN": {"ENABLE": True}, "TEST": {"ENABLE": True}}

    def deep(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep(dst[k], v)
            else:
                dst[k] = v
    deep(base, bad)
    cfg.merge_from_dict(base)
    with pytest.raises(ValueError, match="Invalid configuration"):
        check_configuration(cfg)
    try:
        check_configuration(cfg)
    except ValueError as e:
        assert msg_frag in str(e), str(e)


@pytest.mark.parametrize("bad,msg_frag", [
    # round-2 audit pass (docs/VALIDATION_AUDIT.md; reference
    # check_configuration.py sections noted per rule)
    # -- instance seg (ref:135-138, 1493-1597, 1745, 1801) --
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["A", "F"]}},
      "DATA": {"PATCH_SIZE": (8, 64, 64, 1)},
      "_3d": True}, "'A' representation"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"],
                                   "INSTANCE_CREATION_PROCESS": "agglomeration"}}},
     "agglomeration"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C", "R"],
                                   "INSTANCE_CREATION_PROCESS": "stardist"}}},
     "'Db' and 'R'"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["B", "Gv", "Gh"],
                                   "INSTANCE_CREATION_PROCESS": "gradient-flow"}}},
     "gradient-flow channels"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C", "R"],
                                   "INSTANCE_CREATION_PROCESS": "watershed"}}},
     "can not be used when"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"],
                                   "WATERSHED": {"GROWTH_MASK_CHANNELS": ["T"],
                                                 "GROWTH_MASK_CHANNELS_THRESH": ["auto"],
                                                 "SEED_CHANNELS": ["F"],
                                                 "SEED_CHANNELS_THRESH": ["auto"]}}}},
     "GROWTH_MASK_CHANNELS"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"],
                                   "WATERSHED": {"SEED_CHANNELS": ["F"],
                                                 "SEED_CHANNELS_THRESH": ["high"]}}}},
     "'auto' or a float"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"],
                                   "WATERSHED": {"BY_2D_SLICES": True}}}},
     "BY_2D_SLICES"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"],
                                   "DATA_CHANNEL_WEIGHTS": [1, 1, 1]}}},
     "DATA_CHANNEL_WEIGHTS"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C", "H", "V"],
                                   "DATA_CHANNELS_EXTRA_OPTS": [
                                       {"H": {"act": "tanh"},
                                        "V": {"act": "linear"}}]}}},
     "share the same settings"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"]}},
      "TEST": {"POST_PROCESSING": {"INSTANCE_REFINEMENT": {
          "ENABLE": True, "OPERATIONS": ["dilation"], "VALUES": [0]}}}},
     "dilation"),
    # -- detection (ref:1828-1901) --
    ({"PROBLEM": {"TYPE": "DETECTION",
                  "DETECTION": {"CENTRAL_POINT_DILATION": [2, 2, 2]}}},
     "CENTRAL_POINT_DILATION"),
    ({"PROBLEM": {"TYPE": "DETECTION"}, "TEST": {"DET_TH_TYPE": "fuzzy"}},
     "DET_TH_TYPE"),
    ({"PROBLEM": {"TYPE": "DETECTION"},
      "TEST": {"DET_IGNORE_POINTS_OUTSIDE_BOX": [10, 10, 10]}},
     "DET_IGNORE_POINTS_OUTSIDE_BOX"),
    ({"PROBLEM": {"TYPE": "DETECTION"}, "DATA": {"N_CLASSES": 3},
      "PROBLEM_EXTRA": {"DETECTION": {"DATA_CHANNEL_WEIGHTS": [1, 1, 1]}}},
     "DATA_CHANNEL_WEIGHTS"),
    ({"PROBLEM": {"TYPE": "DETECTION"},
      "TEST": {"POST_PROCESSING": {"DET_WATERSHED": True,
                                   "DET_WATERSHED_FIRST_DILATION": [2, 2]}}},
     "MEASURE_PROPERTIES"),
    # -- SSL / denoising / i2i (ref:1926-2094) --
    ({"PROBLEM": {"TYPE": "SELF_SUPERVISED",
                  "SELF_SUPERVISED": {"PRETEXT_TASK": "masking"}},
      "MODEL": {"ARCHITECTURE": "mae", "MAE_MASK_TYPE": "checker"}},
     "MAE_MASK_TYPE"),
    ({"PROBLEM": {"TYPE": "DENOISING", "DENOISING": {"LOAD_GT_DATA": True}},
      "DATA": {"TRAIN": {"GT_PATH": ""}}},
     "Supervised denoising"),
    ({"PROBLEM": {"TYPE": "DENOISING"}, "TRAIN": {"METRICS": ["psnr"]}},
     "mae"),
    ({"PROBLEM": {"TYPE": "IMAGE_TO_IMAGE",
                  "IMAGE_TO_IMAGE": {"CHANNELS_PER_HEAD_INFO": [1, 2],
                                     "OUTPUT_CHANNELS": 2}}},
     "CHANNELS_PER_HEAD_INFO"),
    # -- model section (ref:2860-3188) --
    ({"PROBLEM": {"TYPE": "DENOISING"}, "MODEL": {"ARCHITECTURE": "edsr"}},
     "DENOISING"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"]}},
      "MODEL": {"ARCHITECTURE": "nafnet"}}, "INSTANCE_SEG"),
    ({"MODEL": {"ARCHITECTURE": "vit", "DROPOUT_VALUES": [0.1, 0.2]},
      "PROBLEM": {"TYPE": "CLASSIFICATION"}}, "DROPOUT_VALUES"),
    ({"MODEL": {"ARCHITECTURE": "unetr", "UNETR_VIT_MODEL": "custom",
                "VIT_TOKEN_SIZE": 12}}, "power of two"),
    ({"MODEL": {"ARCHITECTURE": "unetr", "UNETR_VIT_MODEL": "resnet"}},
     "UNETR_VIT_MODEL"),
    ({"MODEL": {"ARCHITECTURE": "unet",
                "VIT_PRETRAINED_WEIGHTS": "/tmp/w.pt"}},
     "VIT_PRETRAINED_WEIGHTS"),
    ({"MODEL": {"ARCHITECTURE": "vit", "VIT_MODEL": "vit_base_patch16",
                "VIT_PRETRAINED_WEIGHTS": "/tmp/w.pt"},
      "PROBLEM": {"TYPE": "CLASSIFICATION"}}, "sam3_vit"),
    ({"MODEL": {"ARCHITECTURE": "hrnet32",
                "HRNET": {"HEAD_TYPE": "OCR"}},
      "PROBLEM": {"NDIM": "3D"},
      "DATA": {"PATCH_SIZE": (16, 64, 64, 1)}}, "OCR"),
    ({"MODEL": {"OUT_CHECKPOINT_FORMAT": "ckpt"}}, "OUT_CHECKPOINT_FORMAT"),
    ({"PROBLEM": {"TYPE": "DETECTION",
                  "DETECTION": {"SEPARATED_DECODERS_PER_HEAD": True}}},
     "N_CLASSES"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"],
                                   "SEPARATED_DECODERS_PER_HEAD": True,
                                   "CHANNELS_PER_HEAD_INFO": [1, 1]}},
      "MODEL": {"ARCHITECTURE": "multiresunet"}},
     "SEPARATED_DECODERS_PER_HEAD"),
    # -- scheduler / augmentor / misc (ref:3240-3355) --
    ({"TRAIN": {"LR_SCHEDULER": {"NAME": "warmupcosine",
                                 "WARMUP_COSINE_DECAY_EPOCHS": -1,
                                 "MIN_LR": [1e-5]},
                "EPOCHS": 10}}, "WARMUP_COSINE_DECAY_EPOCHS"),
    ({"TRAIN": {"LR_SCHEDULER": {"NAME": "warmupcosine",
                                 "WARMUP_COSINE_DECAY_EPOCHS": 2,
                                 "MIN_LR": [-1.0]},
                "EPOCHS": 10}}, "MIN_LR"),
    ({"AUGMENTOR": {"ENABLE": True, "AFFINE_MODE": "mirror"}}, "AFFINE_MODE"),
    ({"TEST": {"POST_PROCESSING": {"MEASURE_PROPERTIES": {
        "ENABLE": True, "EXTRA_PROPS": ["area", "banana"]}}},
      "PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"]}}},
     "EXTRA_PROPS"),
    ({"DATA": {"TRAIN": {"INPUT_ZARR_MULTIPLE_DATA": True}},
      "PROBLEM": {"NDIM": "3D"}, "_patch4": True},
     "INPUT_ZARR_MULTIPLE_DATA_RAW_PATH"),
    # -- extra-opts fine-grained value checks (ref:1615-1695) --
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["Db"],
                                   "DATA_CHANNELS_EXTRA_OPTS": [
                                       {"Db": {"val_type": "banana"}}]}}},
     "val_type"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "P"],
                                   "DATA_CHANNELS_EXTRA_OPTS": [
                                       {"P": {"type": "corner"}}]}}},
     "'centroid' or 'skeleton'"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["Db", "R"],
                                   "DATA_CHANNELS_EXTRA_OPTS": [
                                       {"R": {"nrays": 0}}]}}},
     "nrays"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C", "T"],
                                   "DATA_CHANNELS_EXTRA_OPTS": [
                                       {"T": {"thickness": 0}}]}}},
     "thickness"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["E_offset"],
                                   "DATA_CHANNELS_EXTRA_OPTS": [
                                       {"E_offset": {"center_mode": "corner"}}]}}},
     "center_mode"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "3D",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["A"],
                                   "DATA_CHANNELS_EXTRA_OPTS": [
                                       {"A": {"z_affinities": [1, 2],
                                              "y_affinities": [1, 2],
                                              "x_affinities": [1]}}]}},
      "_3d": True}, "same length"),
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "3D",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["A"],
                                   "DATA_CHANNELS_EXTRA_OPTS": [
                                       {"A": {"widen_borders": -2}}]}},
      "_3d": True}, "widen_borders"),
])
def test_validation_rejects_round2(bad, msg_frag):
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.check_configuration import check_configuration

    cfg = get_cfg_defaults()
    is3d = bad.pop("_3d", False) or bad.get("PROBLEM", {}).get("NDIM") == "3D"
    if bad.pop("_patch4", False):
        is3d = True
    extra_problem = bad.pop("PROBLEM_EXTRA", None)
    base = {"PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "3D" if is3d else "2D"},
            "DATA": {"PATCH_SIZE": (16, 64, 64, 1) if is3d else (64, 64, 1)},
            "TRAIN": {"ENABLE": True}, "TEST": {"ENABLE": True}}

    def deep(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep(dst[k], v)
            else:
                dst[k] = v
    deep(base, bad)
    if extra_problem:
        deep(base["PROBLEM"], extra_problem)
    cfg.merge_from_dict(base)
    with pytest.raises(ValueError, match="Invalid configuration"):
        check_configuration(cfg)
    try:
        check_configuration(cfg)
    except ValueError as e:
        assert msg_frag in str(e), str(e)


def test_validation_data_paths(tmp_path):
    """check_data_paths=True verifies data dirs exist (reference
    check_configuration.py:2160-2297; the API layer passes True)."""
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.check_configuration import check_configuration

    def build(train_path, gt_path):
        cfg = get_cfg_defaults()
        cfg.merge_from_dict({
            "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
            "DATA": {"PATCH_SIZE": (64, 64, 1),
                     "TRAIN": {"PATH": train_path, "GT_PATH": gt_path}},
            "TRAIN": {"ENABLE": True}})
        return cfg

    # without the flag: no path checks (template validation mode)
    check_configuration(build("/nonexistent/x", "/nonexistent/y"))
    with pytest.raises(ValueError, match="Train data dir not found"):
        check_configuration(build("/nonexistent/x", "/nonexistent/y"),
                            check_data_paths=True)
    ok = str(tmp_path)
    with pytest.raises(ValueError, match="Train mask data dir not found"):
        check_configuration(build(ok, "/nonexistent/y"), check_data_paths=True)
    check_configuration(build(ok, ok), check_data_paths=True)


def test_validation_patch_divisibility():
    """U-Net family patch-vs-downsampling divisibility (reference
    check_configuration.py:3091-3155)."""
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.check_configuration import check_configuration

    cfg = get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (100, 100, 1)},  # 100 -> 50 -> 25 -> not divisible
        "TRAIN": {"ENABLE": True},
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [8, 16, 32, 64],
                  "DROPOUT_VALUES": [0.0] * 4, "Z_DOWN": [2, 2, 2],
                  "YX_DOWN": [2, 2, 2], "CONV_LAYERS": [2] * 4},
    })
    with pytest.raises(ValueError, match="not divisible"):
        check_configuration(cfg)
    # 96 divides cleanly three times
    cfg.merge_from_dict({"DATA": {"PATCH_SIZE": (96, 96, 1)}})
    check_configuration(cfg)


def test_binary_ignore_index_masks_loss_and_iou():
    """LOSS.IGNORE_INDEX is honored on the BINARY (1-logit BCE) path and by
    the binary IoU — ignored pixels used to contribute gradient/IoU."""
    import jax.numpy as jnp

    from biapy_tpu.engine.metrics import cross_entropy_loss, jaccard_index

    logits = jnp.full((1, 4, 4, 1), 3.0)  # confident foreground
    y = jnp.ones((1, 4, 4, 1))
    y = y.at[0, :2].set(2.0)  # ignore half the image with label 2
    full = float(cross_entropy_loss(logits, jnp.ones_like(y)))
    masked = float(cross_entropy_loss(logits, y, ignore_index=2))
    assert abs(masked - full) < 1e-6  # valid half is all-correct foreground

    # IoU: ignored half predicted fg would otherwise count as false positive
    y_bad = jnp.zeros((1, 4, 4, 1)).at[0, 2:].set(1.0)
    y_ign = y_bad.at[0, :2].set(2.0)
    iou = float(jaccard_index(logits, y_ign, ignore_index=2))
    assert iou == 1.0, iou


@pytest.mark.parametrize("bad, msg_frag", [
    # regression workflows: outputs are not probabilities -> clip destroys them
    ({"PROBLEM": {"TYPE": "SUPER_RESOLUTION"}}, "probabilit"),
    ({"PROBLEM": {"TYPE": "DENOISING"}}, "probabilit"),
    # instance channels with signed/unbounded semantics (distances)
    ({"PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "3D",
                  "INSTANCE_SEG": {"DATA_CHANNELS": ["B", "D"]}}},
     "signed/unbounded"),
])
def test_output_quant_uint8_guard_rejects(bad, msg_frag):
    """TEST.OUTPUT_QUANT_UINT8 clips all channels to [0,1] (ops/stitch.py) —
    validation must reject workflows/channel sets whose outputs are not
    probability maps (advisor r4)."""
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.check_configuration import check_configuration

    cfg = get_cfg_defaults()
    is3d = bad.get("PROBLEM", {}).get("NDIM") == "3D"
    base = {"PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "3D" if is3d else "2D"},
            "DATA": {"PATCH_SIZE": (16, 64, 64, 1) if is3d else (64, 64, 1)},
            "TRAIN": {"ENABLE": True},
            "TEST": {"ENABLE": True, "OUTPUT_QUANT_UINT8": True}}

    def deep(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep(dst[k], v)
            else:
                dst[k] = v
    deep(base, bad)
    cfg.merge_from_dict(base)
    with pytest.raises(ValueError, match="Invalid configuration"):
        check_configuration(cfg)
    try:
        check_configuration(cfg)
    except ValueError as e:
        assert msg_frag in str(e), str(e)


def test_output_quant_uint8_guard_accepts_probability_outputs():
    """Probability-only outputs (semantic seg; BC instance channels) keep
    working with the quantized drain."""
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.check_configuration import check_configuration

    for extra in (
        {"PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "3D"}},
        {"PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "3D",
                     "INSTANCE_SEG": {"DATA_CHANNELS": ["B", "C"]}}},
    ):
        cfg = get_cfg_defaults()
        pads = {"OVERLAP": (0, 0, 0), "PADDING": (0, 0, 0)}
        base = {"PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "3D"},
                "DATA": {"PATCH_SIZE": (32, 64, 64, 1),
                         "TRAIN": dict(pads), "VAL": dict(pads),
                         "TEST": dict(pads)},
                "TRAIN": {"ENABLE": True},
                "TEST": {"ENABLE": True, "OUTPUT_QUANT_UINT8": True}}

        def deep(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    deep(dst[k], v)
                else:
                    dst[k] = v
        deep(base, extra)
        cfg.merge_from_dict(base)
        check_configuration(cfg)


def test_basic_block_rejects_dilation():
    """torchvision parity: BasicBlock raises for dilation > 1 instead of
    silently ignoring it (advisor r4, models/resnet.py)."""
    import jax
    import jax.numpy as jnp
    from biapy_tpu.models.resnet import _BasicBlock

    blk = _BasicBlock(features=8, stride=1, downsample=False, dilation=2)
    with pytest.raises(ValueError, match="BasicBlock"):
        blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)))
