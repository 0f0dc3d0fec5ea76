"""Model factory.

Reference analog: biapy/models/__init__.py build_model:44-482 — dispatches
``cfg.MODEL.ARCHITECTURE`` to a constructed model with the engine-provided
head spec (output_channels / output_channel_info / head_activations).

Returns ``(flax_module, model_build_kwargs)``; ``model_build_kwargs`` is
embedded in checkpoints so a checkpoint alone can rebuild the model.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

UNET_FAMILY = ("unet", "resunet", "resunet++", "seunet", "resunet_se", "attention_unet")


def build_model(cfg, output_channels: List[int], output_channel_info: List[str],
                head_activations: List[str]) -> Tuple[object, Dict]:
    arch = str(cfg.MODEL.ARCHITECTURE).lower()
    if str(cfg.MODEL.SOURCE).lower() == "torchvision":
        # reference: build_torchvision_model ignores MODEL.ARCHITECTURE and
        # builds MODEL.TORCHVISION_MODEL_NAME (models/__init__.py:1609); the
        # supported subset maps onto the first-party Flax equivalents and
        # prepare_model loads the local state dict
        arch = str(cfg.MODEL.TORCHVISION_MODEL_NAME).lower()
    ndim = 3 if cfg.PROBLEM.NDIM == "3D" else 2

    if arch in UNET_FAMILY or arch in ("unext_v1", "unext_v2"):
        separated_decoders = False
        divide = False
        for wf, node in (("IMAGE_TO_IMAGE", cfg.PROBLEM.IMAGE_TO_IMAGE),
                         ("INSTANCE_SEG", cfg.PROBLEM.INSTANCE_SEG),
                         ("DETECTION", cfg.PROBLEM.DETECTION)):
            if cfg.PROBLEM.TYPE == wf and node.SEPARATED_DECODERS_PER_HEAD:
                separated_decoders = True
                divide = node.SEPARATED_DECODERS_DIVIDE_FEATURE_MAPS
        upsampling_factor: Tuple[int, ...] = ()
        upsampling_position = "pre"
        if cfg.PROBLEM.TYPE == "SUPER_RESOLUTION":
            upsampling_factor = tuple(cfg.PROBLEM.SUPER_RESOLUTION.UPSCALING)
            upsampling_position = cfg.MODEL.UNET_SR_UPSAMPLE_POSITION
        iso = cfg.MODEL.ISOTROPY
        if isinstance(iso, bool):
            iso = (iso,)
        kwargs = dict(
            ndim=ndim,
            activation=str(cfg.MODEL.ACTIVATION).lower(),
            feature_maps=tuple(cfg.MODEL.FEATURE_MAPS),
            drop_values=tuple(cfg.MODEL.DROPOUT_VALUES),
            normalization=cfg.MODEL.NORMALIZATION,
            k_size=int(cfg.MODEL.KERNEL_SIZE),
            upsample_layer=cfg.MODEL.UPSAMPLE_LAYER,
            yx_down=tuple(cfg.MODEL.YX_DOWN),
            z_down=tuple(cfg.MODEL.Z_DOWN),
            output_channels=tuple(output_channels),
            output_channel_info=tuple(output_channel_info),
            separated_decoders=separated_decoders,
            divide_decoder_feature_maps=divide,
            upsampling_factor=upsampling_factor,
            upsampling_position=upsampling_position,
            isotropy=tuple(iso),
            larger_io=bool(cfg.MODEL.LARGER_IO),
            conv_layers=tuple(cfg.MODEL.CONV_LAYERS),
            contrast=bool(cfg.LOSS.CONTRAST.ENABLE),
            contrast_proj_dim=int(cfg.LOSS.CONTRAST.PROJ_DIM),
            conv_block_order=cfg.MODEL.CONV_BLOCK_ORDER,
        )
        if arch in ("unet", "resunet", "seunet", "resunet_se", "attention_unet"):
            from biapy_tpu.models.unet_family import UNetFamily

            kwargs["variant"] = arch
            return UNetFamily(**kwargs), {"class": "UNetFamily", **kwargs}
        if arch == "resunet++":
            from biapy_tpu.models.resunet_pp import ResUNetPlusPlus

            for k in ("separated_decoders", "divide_decoder_feature_maps", "conv_block_order",
                      "larger_io", "conv_layers"):
                kwargs.pop(k, None)
            return ResUNetPlusPlus(**kwargs), {"class": "ResUNetPlusPlus", **kwargs}
        if arch in ("unext_v1", "unext_v2"):
            from biapy_tpu.models.unext import UNeXt

            for k in ("activation", "drop_values", "normalization", "k_size", "larger_io",
                      "conv_block_order"):
                kwargs.pop(k, None)
            kwargs["version"] = 1 if arch == "unext_v1" else 2
            kwargs["cn_layers"] = kwargs.pop("conv_layers")
            kwargs["stochastic_depth_prob"] = float(cfg.MODEL.CONVNEXT_SD_PROB)
            kwargs["stem_k_size"] = int(cfg.MODEL.CONVNEXT_STEM_K_SIZE)
            if arch == "unext_v1":
                kwargs["layer_scale"] = float(cfg.MODEL.CONVNEXT_LAYER_SCALE)
            return UNeXt(**kwargs), {"class": "UNeXt", **kwargs}

    if arch == "multiresunet":
        from biapy_tpu.models.multiresunet import MultiResUNet

        kwargs = dict(
            ndim=ndim,
            input_channels=int(cfg.DATA.PATCH_SIZE[-1]),
            alpha=1.67,
            feature_maps=tuple(cfg.MODEL.FEATURE_MAPS),
            output_channels=tuple(output_channels),
            output_channel_info=tuple(output_channel_info),
            z_down=tuple(cfg.MODEL.Z_DOWN),
        )
        return MultiResUNet(**kwargs), {"class": "MultiResUNet", **kwargs}

    if arch in ("edsr", "rcan", "wdsr", "dfcan"):
        from biapy_tpu.models import sr_models

        upscaling = tuple(cfg.PROBLEM.SUPER_RESOLUTION.UPSCALING) or (2,) * ndim
        scale = upscaling[-1]
        kwargs = dict(ndim=ndim, scale=int(scale),
                      num_channels=int(cfg.DATA.PATCH_SIZE[-1]),
                      out_channels=int(output_channels[0]) if output_channels else int(cfg.DATA.PATCH_SIZE[-1]))
        cls = {"edsr": sr_models.EDSR, "rcan": sr_models.RCAN,
               "wdsr": sr_models.WDSR, "dfcan": sr_models.DFCAN}[arch]
        if arch == "rcan":
            kwargs["filters"] = int(cfg.MODEL.RCAN_CONV_FILTERS)
            kwargs["num_rg"] = int(cfg.MODEL.RCAN_RG_BLOCK_NUM)
            kwargs["num_rcab"] = int(cfg.MODEL.RCAN_RCAB_BLOCK_NUM)
            kwargs["reduction"] = int(cfg.MODEL.RCAN_REDUCTION_RATIO)
            kwargs["upscaling_layer"] = bool(cfg.MODEL.RCAN_UPSCALING_LAYER)
        return cls(**kwargs), {"class": cls.__name__, **kwargs}

    if arch == "vit":
        from biapy_tpu.models.vit import ViT

        kwargs = _vit_kwargs(cfg, ndim)
        kwargs["n_classes"] = int(output_channels[0]) if output_channels else int(cfg.DATA.N_CLASSES)
        return ViT(**kwargs), {"class": "ViT", **kwargs}

    if arch == "mae":
        from biapy_tpu.models.mae import MAE

        kwargs = _vit_kwargs(cfg, ndim)
        kwargs.pop("drop_rate", None)
        kwargs["mask_ratio"] = float(cfg.MODEL.MAE_MASK_RATIO)
        kwargs["masking_type"] = str(cfg.MODEL.MAE_MASK_TYPE)
        kwargs["dec_embed_dim"] = int(cfg.MODEL.MAE_DEC_HIDDEN_SIZE)
        kwargs["dec_depth"] = int(cfg.MODEL.MAE_DEC_NUM_LAYERS)
        kwargs["dec_num_heads"] = int(cfg.MODEL.MAE_DEC_NUM_HEADS)
        kwargs["dec_mlp_ratio"] = float(cfg.MODEL.MAE_DEC_MLP_DIMS) / max(
            int(cfg.MODEL.MAE_DEC_HIDDEN_SIZE), 1)
        return MAE(**kwargs), {"class": "MAE", **kwargs}

    if arch == "unetr":
        from biapy_tpu.models.unetr import UNETR

        kwargs = _vit_kwargs(cfg, ndim, model_key="UNETR_VIT_MODEL")
        kwargs.pop("drop_rate", None)
        kwargs["output_channels"] = tuple(output_channels)
        kwargs["decoder_activation"] = str(cfg.MODEL.ACTIVATION).lower()
        kwargs["vit_hidden_multiple"] = int(cfg.MODEL.UNETR_VIT_HIDD_MULT)
        kwargs["decoder_filters"] = int(cfg.MODEL.UNETR_VIT_NUM_FILTERS)
        if str(cfg.MODEL.UNETR_VIT_MODEL).lower() == "sam3_vit":
            kwargs["backbone"] = "sam3_vit"
        return UNETR(**kwargs), {"class": "UNETR", **kwargs}

    if arch == "simple_cnn":
        from biapy_tpu.models.simple_cnn import SimpleCNN

        kwargs = dict(ndim=ndim, n_classes=int(output_channels[0]))
        return SimpleCNN(**kwargs), {"class": "SimpleCNN", **kwargs}

    if arch.startswith("efficientnet_v2"):
        # torchvision classification namespace (reference
        # models/__init__.py:1676) — must dispatch before the b0-b7 family
        from biapy_tpu.models.efficientnet_v2 import EfficientNetV2

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return EfficientNetV2(**kwargs), {"class": "EfficientNetV2", **kwargs}

    if "efficientnet" in arch:
        from biapy_tpu.models.efficientnet import EfficientNet

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return EfficientNet(**kwargs), {"class": "EfficientNet", **kwargs}

    if arch.startswith(("resnet", "resnext", "wide_resnet")):
        # torchvision classification family from a LOCAL state dict
        # (reference: build_torchvision_model, models/__init__.py:1609)
        from biapy_tpu.models.resnet import ResNet

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return ResNet(**kwargs), {"class": "ResNet", **kwargs}

    if arch.startswith("deeplabv3"):
        # torchvision SEGMENTATION family (reference:
        # build_torchvision_model, models/__init__.py:1678)
        from biapy_tpu.models.deeplab import DeepLabV3

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return DeepLabV3(**kwargs), {"class": "DeepLabV3", **kwargs}

    if arch.startswith("fcn_"):
        # torchvision fcn_resnet50/101 (reference models/__init__.py:1745)
        from biapy_tpu.models.deeplab import FCN

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return FCN(**kwargs), {"class": "FCN", **kwargs}

    if arch.startswith("lraspp"):
        # torchvision lraspp_mobilenet_v3_large (reference
        # models/__init__.py:1748-1752)
        from biapy_tpu.models.mobilenetv3 import LRASPP

        kwargs = dict(n_classes=int(output_channels[0]))
        return LRASPP(**kwargs), {"class": "LRASPP", **kwargs}

    if arch.startswith("mobilenet_v3"):
        # torchvision classification namespace (reference
        # models/__init__.py:1676)
        from biapy_tpu.models.mobilenetv3 import MobileNetV3

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return MobileNetV3(**kwargs), {"class": "MobileNetV3", **kwargs}

    if arch == "mobilenet_v2":
        # torchvision classification namespace (reference
        # models/__init__.py:1676)
        from biapy_tpu.models.mobilenetv2 import MobileNetV2

        kwargs = dict(n_classes=int(output_channels[0]))
        return MobileNetV2(**kwargs), {"class": "MobileNetV2", **kwargs}

    if arch.startswith("shufflenet"):
        # torchvision classification namespace (reference
        # models/__init__.py:1676)
        from biapy_tpu.models.shufflenet import ShuffleNetV2

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return ShuffleNetV2(**kwargs), {"class": "ShuffleNetV2", **kwargs}

    if arch.startswith("mnasnet"):
        # torchvision classification namespace (reference
        # models/__init__.py:1676)
        from biapy_tpu.models.mnasnet import MNASNet

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return MNASNet(**kwargs), {"class": "MNASNet", **kwargs}

    if arch == "googlenet":
        # torchvision classification namespace (reference
        # models/__init__.py:1676)
        from biapy_tpu.models.googlenet import GoogLeNet

        kwargs = dict(n_classes=int(output_channels[0]))
        return GoogLeNet(**kwargs), {"class": "GoogLeNet", **kwargs}

    if arch.startswith("regnet"):
        # torchvision classification namespace (reference
        # models/__init__.py:1676)
        from biapy_tpu.models.regnet import RegNet

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return RegNet(**kwargs), {"class": "RegNet", **kwargs}

    if arch.startswith("convnext"):
        # torchvision classification namespace (reference
        # models/__init__.py:1676)
        from biapy_tpu.models.convnext_tv import ConvNeXt

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return ConvNeXt(**kwargs), {"class": "ConvNeXt", **kwargs}

    if arch.startswith("vit_") and str(cfg.MODEL.SOURCE).lower() == "torchvision":
        # torchvision ViT names map onto the first-party ViT (models/vit_tv)
        from biapy_tpu.models.vit_tv import build_tv_vit

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return build_tv_vit(arch, int(output_channels[0])), {"class": "TVViT", **kwargs}

    if arch == "inception_v3":
        from biapy_tpu.models.inception import InceptionV3

        kwargs = dict(n_classes=int(output_channels[0]))
        return InceptionV3(**kwargs), {"class": "InceptionV3", **kwargs}

    if arch.startswith("swin_v2"):
        # torchvision classification namespace (reference
        # models/__init__.py:1676)
        from biapy_tpu.models.swin import SwinV2

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return SwinV2(**kwargs), {"class": "SwinV2", **kwargs}

    if arch.startswith("swin"):
        # torchvision classification namespace (reference
        # models/__init__.py:1676)
        from biapy_tpu.models.swin import Swin

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return Swin(**kwargs), {"class": "Swin", **kwargs}

    if arch == "alexnet":
        from biapy_tpu.models.alexnet import AlexNet

        kwargs = dict(n_classes=int(output_channels[0]))
        return AlexNet(**kwargs), {"class": "AlexNet", **kwargs}

    if arch.startswith("densenet"):
        # torchvision classification namespace (reference
        # models/__init__.py:1676)
        from biapy_tpu.models.densenet import DenseNet

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return DenseNet(**kwargs), {"class": "DenseNet", **kwargs}

    if arch.startswith("vgg"):
        # torchvision classification namespace (reference
        # models/__init__.py:1676)
        from biapy_tpu.models.vgg import VGG

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return VGG(**kwargs), {"class": "VGG", **kwargs}

    if arch.startswith("squeezenet"):
        # torchvision classification namespace — squeezenet's head is a 1x1
        # conv, special-cased by the reference (models/__init__.py:1711)
        from biapy_tpu.models.squeezenet import SqueezeNet

        kwargs = dict(variant=arch, n_classes=int(output_channels[0]))
        return SqueezeNet(**kwargs), {"class": "SqueezeNet", **kwargs}

    if arch == "nafnet":
        from biapy_tpu.models.nafnet import NAFNet

        n = cfg.MODEL.NAFNET
        kwargs = dict(
            ndim=ndim,
            img_channels=int(cfg.DATA.PATCH_SIZE[-1]),
            width=int(n.WIDTH),
            middle_blk_num=int(n.MIDDLE_BLK_NUM),
            enc_blk_nums=tuple(n.ENC_BLK_NUMS),
            dec_blk_nums=tuple(n.DEC_BLK_NUMS),
            dw_expand=int(n.DW_EXPAND),
            ffn_expand=int(n.FFN_EXPAND),
        )
        return NAFNet(**kwargs), {"class": "NAFNet", **kwargs}

    if "hrnet" in arch:
        from biapy_tpu.models.hrnet import HRNet

        if str(cfg.MODEL.HRNET.HEAD_TYPE) != "FCN" and len(output_channels) > 2:
            # reference hrnet.py:542-543
            raise ValueError(
                "MODEL.HRNET.HEAD_TYPE other than 'FCN' supports at most two "
                "outputs (main + class head); this workflow needs "
                f"{len(output_channels)}")
        variant = arch.replace("hrnet", "") or str(cfg.MODEL.HRNET.VARIANT).lower().lstrip("w")
        kwargs = dict(
            ndim=ndim,
            variant=variant,
            output_channels=tuple(output_channels),
            normalization=cfg.MODEL.NORMALIZATION or "bn",
            block_type=str(cfg.MODEL.HRNET.BLOCK_TYPE),
            head_type=str(cfg.MODEL.HRNET.HEAD_TYPE),
            contrast=bool(cfg.LOSS.CONTRAST.ENABLE),
            contrast_proj_dim=int(cfg.LOSS.CONTRAST.PROJ_DIM),
        )
        h = cfg.MODEL.HRNET
        if variant in ("custom", ""):
            # custom HRNet spec (reference: MODEL.HRNET.NUM_STAGES/
            # NUM_MODULES/NUM_BLOCKS/NUM_CHANNELS, config.py HRNET subtree)
            chans = list(h.NUM_CHANNELS) if h.NUM_CHANNELS else [32]
            while isinstance(chans[0], (list, tuple)):  # nested per-stage spec
                chans = list(chans[0])
            kwargs["variant"] = str(int(chans[0]))
            kwargs["num_stages"] = int(h.NUM_STAGES)
            kwargs["num_modules"] = tuple(int(m) for m in h.NUM_MODULES)[: int(h.NUM_STAGES)]
            nb = h.NUM_BLOCKS
            while isinstance(nb, (list, tuple)):
                nb = nb[0] if len(nb) else 4
            kwargs["num_blocks"] = int(nb or 4)
        return HRNet(**kwargs), {"class": "HRNet", **kwargs}

    if arch == "stunet":
        from biapy_tpu.models.stunet import STUNet

        kwargs = dict(
            ndim=ndim,
            variant=str(cfg.MODEL.STUNET.VARIANT).lower(),
            output_channels=tuple(output_channels),
            z_down=tuple(cfg.MODEL.Z_DOWN),
        )
        return STUNet(**kwargs), {"class": "STUNet", **kwargs}

    raise ValueError(f"Unknown MODEL.ARCHITECTURE: {cfg.MODEL.ARCHITECTURE}")


# ViT presets selectable via MODEL.VIT_MODEL / MODEL.UNETR_VIT_MODEL
# (reference: config.py:1388,1412 — "custom" uses the MODEL.VIT_* knobs).
_VIT_PRESETS = {
    "vit_base_patch16": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12, mlp_ratio=4.0),
    "vit_large_patch16": dict(patch_size=16, embed_dim=1024, depth=24, num_heads=16, mlp_ratio=4.0),
    "vit_huge_patch14": dict(patch_size=14, embed_dim=1280, depth=32, num_heads=16, mlp_ratio=4.0),
    # SAM 3 image encoder geometry (models/sam3_vit.py SAM3_VIT_PARAMS)
    "sam3_vit": dict(patch_size=14, embed_dim=1024, depth=32, num_heads=16, mlp_ratio=4.625),
}


def _vit_kwargs(cfg, ndim: int, model_key: str = "VIT_MODEL") -> Dict:
    kw = dict(
        ndim=ndim,
        patch_size=int(cfg.MODEL.VIT_TOKEN_SIZE),
        embed_dim=int(cfg.MODEL.VIT_EMBED_DIM),
        depth=int(cfg.MODEL.VIT_NUM_LAYERS),
        num_heads=int(cfg.MODEL.VIT_NUM_HEADS),
        mlp_ratio=float(cfg.MODEL.VIT_MLP_RATIO),
        in_channels=int(cfg.DATA.PATCH_SIZE[-1]),
        img_size=int(cfg.DATA.PATCH_SIZE[0]),
        drop_rate=float(cfg.MODEL.DROPOUT_VALUES[0]) if cfg.MODEL.DROPOUT_VALUES else 0.0,
        norm_eps=float(cfg.MODEL.VIT_NORM_EPS),
    )
    preset_name = str(getattr(cfg.MODEL, model_key, "custom")).lower()
    if preset_name in _VIT_PRESETS:
        kw.update(_VIT_PRESETS[preset_name])
        if preset_name == "sam3_vit" and model_key == "UNETR_VIT_MODEL":
            # UNETR's decoder needs power-of-two tokens: SAM3's patch embed
            # is resized 14 -> 16 at load time (reference: config.py:1393)
            kw["patch_size"] = 16
    return kw
