"""Configuration validation.

Reference analog: biapy/engine/check_configuration.py (check_configuration:23,
~3400 LoC of cross-field checks). This re-implementation enforces the same
contract class by class: workflow/type/dimension consistency, patch-size
shape, model-vs-workflow compatibility, loss lists, channel specs.
It grows with each workflow vertical; every check mirrors a reference rule.
"""

from __future__ import annotations

from typing import List

VALID_WORKFLOWS = [
    "SEMANTIC_SEG", "INSTANCE_SEG", "DETECTION", "DENOISING",
    "SUPER_RESOLUTION", "SELF_SUPERVISED", "CLASSIFICATION", "IMAGE_TO_IMAGE",
]

UNET_LIKE = ["unet", "resunet", "resunet++", "seunet", "resunet_se", "attention_unet",
             "unext_v1", "unext_v2", "stunet"]
ALL_MODELS = UNET_LIKE + ["multiresunet", "hrnet", "hrnet18", "hrnet32", "hrnet48", "hrnet64",
                          "unetr", "vit", "mae", "edsr", "rcan", "wdsr", "dfcan", "nafnet",
                          "simple_cnn", "efficientnet_b0", "efficientnet_b1", "efficientnet_b2",
                          "efficientnet_b3", "efficientnet_b4", "efficientnet_b5",
                          "efficientnet_b6", "efficientnet_b7"]

INSTANCE_CHANNEL_CODES = ["F", "B", "P", "C", "H", "V", "Z", "Gh", "Gv", "Gz",
                          "Db", "Dc", "Dn", "D", "R", "T", "A", "E"]


def check_configuration(cfg, job_identifier: str = "job") -> None:
    errors: List[str] = []

    def req(cond: bool, msg: str):
        if not cond:
            errors.append(msg)

    # -- problem ------------------------------------------------------------
    req(cfg.PROBLEM.TYPE in VALID_WORKFLOWS,
        f"PROBLEM.TYPE must be one of {VALID_WORKFLOWS}, got {cfg.PROBLEM.TYPE}")
    req(cfg.PROBLEM.NDIM in ("2D", "3D"), f"PROBLEM.NDIM must be '2D' or '3D', got {cfg.PROBLEM.NDIM}")
    is_3d = cfg.PROBLEM.NDIM == "3D"

    # -- patch size ----------------------------------------------------------
    ps = cfg.DATA.PATCH_SIZE
    want = 4 if is_3d else 3
    req(len(ps) == want,
        f"DATA.PATCH_SIZE must have {want} values ((z,)y,x,c) for {cfg.PROBLEM.NDIM}, got {tuple(ps)}")
    req(all(int(p) > 0 for p in ps), f"DATA.PATCH_SIZE entries must be positive, got {tuple(ps)}")

    # -- model --------------------------------------------------------------
    arch = str(cfg.MODEL.ARCHITECTURE).lower()
    src = str(cfg.MODEL.SOURCE).lower()
    req(src in ("biapy", "bmz", "torchvision"),
        f"MODEL.SOURCE must be one of ['biapy','bmz','torchvision'], got {cfg.MODEL.SOURCE}")
    if src == "torchvision":
        raise ValueError(
            "MODEL.SOURCE='torchvision' needs the torchvision package, which is "
            "not available in this TPU environment (no torchvision, no network "
            "egress). Use MODEL.SOURCE='biapy' — the zoo covers the same "
            "families (efficientnet/simple_cnn for classification) — or import "
            "a BMZ package via MODEL.SOURCE='bmz'.")
    if src == "bmz":
        req(str(cfg.MODEL.BMZ.SOURCE_MODEL_ID) != "",
            "MODEL.BMZ.SOURCE_MODEL_ID must point at a BMZ package (zip/dir) when MODEL.SOURCE='bmz'")
    if cfg.MODEL.SOURCE == "biapy":
        req(arch in ALL_MODELS, f"MODEL.ARCHITECTURE '{cfg.MODEL.ARCHITECTURE}' not recognised")
        if arch in UNET_LIKE and arch != "stunet":
            req(len(cfg.MODEL.FEATURE_MAPS) == len(cfg.MODEL.DROPOUT_VALUES),
                "MODEL.FEATURE_MAPS and MODEL.DROPOUT_VALUES must have the same length")
            req(len(cfg.MODEL.FEATURE_MAPS) <= len(cfg.MODEL.Z_DOWN) + 1,
                "MODEL.Z_DOWN needs one value per downsampling level")
        if cfg.PROBLEM.TYPE == "CLASSIFICATION":
            req(arch in ("simple_cnn", "vit") or "efficientnet" in arch,
                f"Classification supports simple_cnn/ViT/efficientnet, got {arch}")
        if cfg.PROBLEM.TYPE == "SUPER_RESOLUTION":
            req(arch in ("edsr", "rcan", "wdsr", "dfcan", "unet", "resunet", "seunet",
                         "attention_unet", "multiresunet", "unetr", "resunet_se",
                         "resunet++", "unext_v1", "unext_v2"),
                f"Model {arch} is not a super-resolution model")

    # -- train ---------------------------------------------------------------
    if cfg.TRAIN.ENABLE:
        req(isinstance(cfg.TRAIN.OPTIMIZER, list), "'TRAIN.OPTIMIZER' must be a list")
        for o in cfg.TRAIN.OPTIMIZER:
            req(str(o).upper() in ("SGD", "ADAM", "ADAMW"),
                f"TRAIN.OPTIMIZER values must be in ['SGD','ADAM','ADAMW'], got {o}")
        req(len(cfg.TRAIN.OPTIMIZER) == len(cfg.TRAIN.LR),
            "'TRAIN.OPTIMIZER' and 'TRAIN.LR' must have the same length")
        req(cfg.TRAIN.EPOCHS > 0, "TRAIN.EPOCHS must be > 0")
        req(cfg.TRAIN.BATCH_SIZE > 0, "TRAIN.BATCH_SIZE must be > 0")
        sch = cfg.TRAIN.LR_SCHEDULER.NAME
        req(sch in ("", "reduceonplateau", "warmupcosine", "onecycle", "warmupreduceonplateau"),
            f"Unknown TRAIN.LR_SCHEDULER.NAME: {sch}")

    # -- normalization ----------------------------------------------------------
    req(cfg.DATA.NORMALIZATION.TYPE in ("div", "scale_range", "zero_mean_unit_variance", "none"),
        f"Unknown DATA.NORMALIZATION.TYPE: {cfg.DATA.NORMALIZATION.TYPE}")

    # -- overlap/padding lengths ----------------------------------------------
    nd = 3 if is_3d else 2
    for split in ("TRAIN", "VAL", "TEST"):
        node = cfg.DATA[split]
        for k in ("OVERLAP", "PADDING"):
            v = node[k]
            req(len(v) == nd, f"DATA.{split}.{k} must have {nd} values for {cfg.PROBLEM.NDIM}, got {tuple(v)}")
        for o in node.OVERLAP:
            req(0 <= o < 1, f"DATA.{split}.OVERLAP values must be in [0,1)")

    # -- per-workflow -------------------------------------------------------
    if cfg.PROBLEM.TYPE == "INSTANCE_SEG" and cfg.PROBLEM.INSTANCE_SEG.TYPE == "regular":
        chans = cfg.PROBLEM.INSTANCE_SEG.DATA_CHANNELS
        req(isinstance(chans, (list, tuple)) and len(chans) > 0,
            "PROBLEM.INSTANCE_SEG.DATA_CHANNELS must be a non-empty list")
        for c in chans:
            req(c in INSTANCE_CHANNEL_CODES,
                f"Unknown instance channel code '{c}' (valid: {INSTANCE_CHANNEL_CODES})")
    if cfg.PROBLEM.TYPE == "SUPER_RESOLUTION":
        ups = cfg.PROBLEM.SUPER_RESOLUTION.UPSCALING
        req(len(ups) == nd, f"PROBLEM.SUPER_RESOLUTION.UPSCALING must have {nd} values")
    if cfg.PROBLEM.TYPE == "CLASSIFICATION":
        req(cfg.DATA.N_CLASSES >= 2, "DATA.N_CLASSES must be >= 2 for classification")
    if cfg.PROBLEM.TYPE == "SELF_SUPERVISED":
        req(cfg.PROBLEM.SELF_SUPERVISED.PRETEXT_TASK in ("crappify", "masking"),
            f"Unknown SSL pretext task: {cfg.PROBLEM.SELF_SUPERVISED.PRETEXT_TASK}")
        if cfg.PROBLEM.SELF_SUPERVISED.PRETEXT_TASK == "masking":
            req(str(cfg.MODEL.ARCHITECTURE).lower() == "mae",
                "SSL masking pretext requires MODEL.ARCHITECTURE == 'mae'")

    if errors:
        raise ValueError("Invalid configuration:\n  - " + "\n  - ".join(errors))
