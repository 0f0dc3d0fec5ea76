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

INSTANCE_CHANNEL_CODES = ["F", "B", "M", "P", "C", "H", "V", "Z", "Gh", "Gv", "Gz",
                          "Db", "Dc", "Dn", "D", "R", "T", "A", "E", "We"]


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
            # all-zero dropout lists broadcast to the feature-map depth
            # (reference: check_configuration.py:2628)
            req(len(cfg.MODEL.FEATURE_MAPS) == len(cfg.MODEL.DROPOUT_VALUES)
                or all(float(x) == 0 for x in cfg.MODEL.DROPOUT_VALUES),
                "MODEL.FEATURE_MAPS and MODEL.DROPOUT_VALUES must have the same length "
                "(unless dropout is all zeros)")
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

    # -- more model/train cross-checks ---------------------------------------
    if cfg.MODEL.SOURCE == "biapy":
        if arch in ("vit", "mae", "unetr"):
            preset = str(cfg.MODEL.UNETR_VIT_MODEL if arch == "unetr" else cfg.MODEL.VIT_MODEL).lower()
            if preset == "custom":
                req(int(cfg.MODEL.VIT_EMBED_DIM) % int(cfg.MODEL.VIT_NUM_HEADS) == 0,
                    "MODEL.VIT_EMBED_DIM must be divisible by MODEL.VIT_NUM_HEADS")
            if preset == "sam3_vit":
                req(not is_3d, "sam3_vit backbones are 2D only (pretrained weights are 2D)")
                tok = 16 if arch == "unetr" else 14
                req(int(ps[0]) % tok == 0,
                    f"DATA.PATCH_SIZE must be a multiple of {tok} with the sam3_vit backbone "
                    f"(reference: check_configuration.py:3050), got {ps[0]}")
        if arch in ("edsr", "rcan", "wdsr", "dfcan", "nafnet"):
            req(not is_3d, f"{arch} is a 2D architecture (reference parity)")
        if arch == "nafnet":
            d_arch = str(cfg.MODEL.NAFNET.ARCHITECTURE_D).lower()
            req(d_arch in ("", "patchgan"),
                f"MODEL.NAFNET.ARCHITECTURE_D must be '' or 'patchgan' "
                f"(the reference builds only PatchGAN discriminators), got '{d_arch}'")
            req(float(cfg.LOSS.CYCLEGAN.ALPHA_PERCEPTUAL) == 0.0,
                "LOSS.CYCLEGAN.ALPHA_PERCEPTUAL needs pretrained VGG features; "
                "this environment has no network egress to download them — "
                "set it to 0 (the reference default)")
        if "hrnet" in arch:
            v = arch.replace("hrnet", "") or str(cfg.MODEL.HRNET.VARIANT).lstrip("wW")
            req(str(v) in ("18", "32", "48", "64") or v == "",
                f"HRNet variant must be one of 18/32/48/64, got '{v}'")
        if arch == "stunet":
            req(str(cfg.MODEL.STUNET.VARIANT).lower() in ("small", "base", "large", "huge"),
                f"MODEL.STUNET.VARIANT must be small/base/large/huge, got {cfg.MODEL.STUNET.VARIANT}")
        norm = str(cfg.MODEL.NORMALIZATION).lower()
        req(norm in ("", "none", "bn", "sync_bn", "in", "gn", "ln"),
            f"MODEL.NORMALIZATION must be one of none/bn/sync_bn/in/gn/ln, got {norm}")

    if cfg.TRAIN.ENABLE:
        req(all(float(lr) > 0 for lr in cfg.TRAIN.LR), "TRAIN.LR values must be > 0")
        sch = cfg.TRAIN.LR_SCHEDULER.NAME
        if sch == "warmupcosine":
            req(int(cfg.TRAIN.LR_SCHEDULER.WARMUP_COSINE_DECAY_EPOCHS) < int(cfg.TRAIN.EPOCHS),
                "LR_SCHEDULER.WARMUP_COSINE_DECAY_EPOCHS must be < TRAIN.EPOCHS")
        mp = cfg.TRAIN.MIXED_PRECISION
        req(isinstance(mp, bool) or str(mp).lower() in ("auto", "true", "false", "0", "1"),
            f"TRAIN.MIXED_PRECISION must be bool or 'auto', got {mp!r}")
        vs = float(cfg.DATA.VAL.SPLIT_TRAIN)
        if cfg.DATA.VAL.FROM_TRAIN and not cfg.DATA.VAL.CROSS_VAL:
            req(0.0 <= vs < 1.0, f"DATA.VAL.SPLIT_TRAIN must be in [0,1), got {vs}")
        if cfg.DATA.VAL.CROSS_VAL:
            req(1 <= int(cfg.DATA.VAL.CROSS_VAL_FOLD) <= int(cfg.DATA.VAL.CROSS_VAL_NFOLD),
                "DATA.VAL.CROSS_VAL_FOLD must be in [1, CROSS_VAL_NFOLD]")

    # -- augmentor ------------------------------------------------------------
    if cfg.AUGMENTOR.ENABLE:
        for k in cfg.AUGMENTOR.keys():
            if k.endswith("_PROB"):
                v = float(cfg.AUGMENTOR[k])
                req(0.0 <= v <= 1.0, f"AUGMENTOR.{k} must be in [0,1], got {v}")

    # -- test -----------------------------------------------------------------
    if cfg.TEST.ENABLE:
        if cfg.TEST.BY_CHUNKS.ENABLE:
            req(is_3d, "TEST.BY_CHUNKS requires PROBLEM.NDIM == '3D' (reference parity)")
            for ph in cfg.TEST.BY_CHUNKS.PHASES:
                req(str(ph) in ("prediction", "instance_creation", "instance_merging"),
                    f"Unknown TEST.BY_CHUNKS.PHASES entry: {ph} "
                    "(valid: prediction/instance_creation/instance_merging)")
            req(str(cfg.TEST.BY_CHUNKS.WORKFLOW_PROCESS.TYPE)
                in ("chunk_by_chunk", "entire_pred"),
                "TEST.BY_CHUNKS.WORKFLOW_PROCESS.TYPE must be 'chunk_by_chunk' "
                "or 'entire_pred' (reference check_configuration.py:2312)")
        # DATA.PREPROCESS.ZOOM is by-chunks-only (reference
        # check_configuration.py:2150-2156)
        if cfg.DATA.PREPROCESS.ZOOM.ENABLE:
            req(cfg.TEST.BY_CHUNKS.ENABLE,
                "DATA.PREPROCESS.ZOOM.ENABLE requires TEST.BY_CHUNKS.ENABLE")
            req(len(cfg.DATA.PREPROCESS.ZOOM.ZOOM_FACTOR)
                == len(str(cfg.DATA.TEST.INPUT_IMG_AXES_ORDER)),
                "DATA.PREPROCESS.ZOOM.ZOOM_FACTOR must have one entry per axis "
                "of DATA.TEST.INPUT_IMG_AXES_ORDER")
        if cfg.TEST.MATCHING_STATS:
            for t in cfg.TEST.MATCHING_STATS_THS:
                req(0.0 < float(t) < 1.0, f"TEST.MATCHING_STATS_THS values must be in (0,1), got {t}")
        req(str(cfg.TEST.AUGMENTATION_MODE).lower() in ("", "mean", "min", "max"),
            f"TEST.AUGMENTATION_MODE must be mean/min/max, got {cfg.TEST.AUGMENTATION_MODE}")
        # TRAIN/TEST.METRICS name validation (reference:
        # check_configuration.py:1248-1292)
        if cfg.PROBLEM.TYPE in ("SUPER_RESOLUTION", "IMAGE_TO_IMAGE",
                                "SELF_SUPERVISED", "DENOISING"):
            for m in list(cfg.TRAIN.METRICS):
                req(str(m).lower() in ("psnr", "mae", "mse", "ssim"),
                    f"TRAIN.METRICS options are psnr/mae/mse/ssim for "
                    f"{cfg.PROBLEM.TYPE}, got '{m}'")
            for m in list(cfg.TEST.METRICS):
                req(str(m).lower() not in ("fid", "is", "lpips"),
                    f"TEST.METRICS '{m}' needs pretrained Inception/LPIPS nets; "
                    "no network egress in this environment")
                req(str(m).lower() in ("psnr", "mae", "mse", "ssim"),
                    f"TEST.METRICS options are psnr/mae/mse/ssim for "
                    f"{cfg.PROBLEM.TYPE}, got '{m}'")
        elif cfg.PROBLEM.TYPE in ("SEMANTIC_SEG", "INSTANCE_SEG", "DETECTION"):
            for m in list(cfg.TRAIN.METRICS) + list(cfg.TEST.METRICS):
                req(str(m).lower() == "iou",
                    f"TRAIN/TEST.METRICS must be 'iou' for {cfg.PROBLEM.TYPE}, got '{m}'")
        pp = cfg.TEST.POST_PROCESSING
        if pp.VORONOI_ON_MASK:
            req(cfg.PROBLEM.TYPE == "INSTANCE_SEG",
                "TEST.POST_PROCESSING.VORONOI_ON_MASK only applies to INSTANCE_SEG")
        if pp.MEASURE_PROPERTIES.ENABLE and pp.MEASURE_PROPERTIES.REMOVE_BY_PROPERTIES.ENABLE:
            rp = pp.MEASURE_PROPERTIES.REMOVE_BY_PROPERTIES
            req(len(rp.PROPS) == len(rp.VALUES) == len(rp.SIGNS),
                "REMOVE_BY_PROPERTIES PROPS/VALUES/SIGNS must have equal lengths")

    # -- per-workflow -------------------------------------------------------
    if cfg.PROBLEM.TYPE == "INSTANCE_SEG":
        itype = str(cfg.PROBLEM.INSTANCE_SEG.TYPE)
        req(itype in ("regular", "synapses"),
            f"PROBLEM.INSTANCE_SEG.TYPE must be 'regular' or 'synapses', got {itype}")
        chans = cfg.PROBLEM.INSTANCE_SEG.DATA_CHANNELS
        req(isinstance(chans, (list, tuple)) and len(chans) > 0,
            "PROBLEM.INSTANCE_SEG.DATA_CHANNELS must be a non-empty list")
        if itype == "regular":
            for c in chans:
                req(c in INSTANCE_CHANNEL_CODES or str(c).startswith("E"),
                    f"Unknown instance channel code '{c}' (valid: {INSTANCE_CHANNEL_CODES})")
            losses = list(cfg.PROBLEM.INSTANCE_SEG.DATA_CHANNELS_LOSSES)
            if losses:
                req(len(losses) == len(chans),
                    "PROBLEM.INSTANCE_SEG.DATA_CHANNELS_LOSSES must match DATA_CHANNELS length")
            proc = str(cfg.PROBLEM.INSTANCE_SEG.INSTANCE_CREATION_PROCESS).lower()
            req(proc in ("", "watershed", "flow_tracking", "gradient_tracking", "omnipose",
                         "stardist", "nms", "embedseg"),
                f"Unknown INSTANCE_CREATION_PROCESS: {proc}")
            if proc in ("flow_tracking", "gradient_tracking", "omnipose"):
                req(any(c in ("Gv", "Gh", "Gz") for c in chans),
                    f"{proc} needs flow channels (Gv/Gh/Gz) in DATA_CHANNELS, got {list(chans)}")
            if proc in ("stardist", "nms"):
                req("R" in chans, f"StarDist NMS needs the 'R' ray channel, got {list(chans)}")
            ws = cfg.PROBLEM.INSTANCE_SEG.WATERSHED
            for sel in list(ws.SEED_CHANNELS) + list(ws.GROWTH_MASK_CHANNELS):
                req(str(sel) in [str(c) for c in chans] or sel in ("", None),
                    f"Watershed channel '{sel}' is not among DATA_CHANNELS {list(chans)}")
        else:  # synapses
            from biapy_tpu.data.synapses import select_synapse_method

            try:
                select_synapse_method(list(chans))
            except ValueError as e:
                req(False, str(e))
            req(is_3d, "Synapse detection is 3D only (CREMI Zarr/H5 volumes)")
            req(str(cfg.PROBLEM.INSTANCE_SEG.SYNAPSES.POINT_CREATION_FUNCTION)
                in ("peak_local_max", "blob_log"),
                "SYNAPSES.POINT_CREATION_FUNCTION must be peak_local_max or blob_log")
            req(str(cfg.PROBLEM.INSTANCE_SEG.SYNAPSES.TH_TYPE)
                in ("auto", "manual", "relative", "relative_by_patch"),
                f"Unknown SYNAPSES.TH_TYPE: {cfg.PROBLEM.INSTANCE_SEG.SYNAPSES.TH_TYPE}")
    if cfg.PROBLEM.TYPE == "DETECTION":
        req(all(int(d) >= 0 for d in cfg.PROBLEM.DETECTION.CENTRAL_POINT_DILATION),
            "PROBLEM.DETECTION.CENTRAL_POINT_DILATION values must be >= 0")
        req(float(cfg.TEST.DET_TOLERANCE) > 0, "TEST.DET_TOLERANCE must be > 0")
    if cfg.PROBLEM.TYPE == "DENOISING":
        n2v = cfg.PROBLEM.DENOISING
        if not n2v.LOAD_GT_DATA:  # Noise2Void
            req(0.0 < float(n2v.N2V_PERC_PIX) <= 100.0,
                f"PROBLEM.DENOISING.N2V_PERC_PIX must be in (0,100], got {n2v.N2V_PERC_PIX}")
            req(str(n2v.N2V_MANIPULATOR) in (
                "uniform_withCP", "uniform_withoutCP", "normal_withoutCP", "normal_additive",
                "normal_fitted", "identity", "mean", "median"),
                f"Unknown N2V manipulator: {n2v.N2V_MANIPULATOR}")
    if cfg.PROBLEM.TYPE == "SUPER_RESOLUTION":
        ups = cfg.PROBLEM.SUPER_RESOLUTION.UPSCALING
        req(len(ups) == nd, f"PROBLEM.SUPER_RESOLUTION.UPSCALING must have {nd} values")
        req(all(int(u) >= 1 for u in ups), "UPSCALING factors must be >= 1")
    if cfg.PROBLEM.TYPE == "CLASSIFICATION":
        req(cfg.DATA.N_CLASSES >= 2, "DATA.N_CLASSES must be >= 2 for classification")
    if cfg.PROBLEM.TYPE == "SELF_SUPERVISED":
        req(cfg.PROBLEM.SELF_SUPERVISED.PRETEXT_TASK in ("crappify", "masking"),
            f"Unknown SSL pretext task: {cfg.PROBLEM.SELF_SUPERVISED.PRETEXT_TASK}")
        if cfg.PROBLEM.SELF_SUPERVISED.PRETEXT_TASK == "masking":
            req(str(cfg.MODEL.ARCHITECTURE).lower() == "mae",
                "SSL masking pretext requires MODEL.ARCHITECTURE == 'mae'")
    if cfg.PROBLEM.TYPE == "IMAGE_TO_IMAGE":
        i2i = cfg.PROBLEM.IMAGE_TO_IMAGE
        if getattr(i2i, "SEPARATED_DECODERS_PER_HEAD", False):
            req(len(getattr(i2i, "CHANNELS_PER_HEAD_INFO", [])) >= 1,
                "SEPARATED_DECODERS_PER_HEAD requires CHANNELS_PER_HEAD_INFO")

    if errors:
        raise ValueError("Invalid configuration:\n  - " + "\n  - ".join(errors))
