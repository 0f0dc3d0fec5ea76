"""HRNet: high-resolution multi-branch segmentation network.

Reference analog: biapy/models/hrnet.py (HighResolutionModule:41,
HighResolutionNet:445; Wang et al. 2020). Stem of two stride-2 convs,
bottleneck stage, then N stages of parallel resolution branches with full
exchange fusion (strided-conv down / bilinear-up + 1-conv); head upsamples
every branch to the finest branch, concatenates, applies an FCN head, and
restores full resolution (stem stride undone by upsampling, matching the
reference's final interpolate).

Variant W{c}: per-stage channels [c, 2c], [c, 2c, 4c], [c, 2c, 4c, 8c]
(reference: MODEL.HRNET defaults, config.py).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import Conv

from biapy_tpu.models.blocks import KERNEL_INIT, Norm, ProjectionHead, upsample_linear


def _resize_to(x, target_spatial):
    new_shape = (x.shape[0],) + tuple(target_spatial) + (x.shape[-1],)
    return jax.image.resize(x, new_shape, method="linear")


class BasicBlock(nn.Module):
    features: int
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        h = Conv(self.features, kernel_size=(3,) * nd, padding="SAME", use_bias=False,
                    kernel_init=KERNEL_INIT)(x)
        h = Norm(self.norm)(h, train)
        h = nn.relu(h)
        h = Conv(self.features, kernel_size=(3,) * nd, padding="SAME", use_bias=False,
                    kernel_init=KERNEL_INIT)(h)
        h = Norm(self.norm)(h, train)
        if x.shape[-1] != self.features:
            x = Conv(self.features, kernel_size=(1,) * nd, use_bias=False,
                        kernel_init=KERNEL_INIT)(x)
            x = Norm(self.norm)(x, train)
        return nn.relu(h + x)


class Bottleneck(nn.Module):
    features: int  # output = features * 4
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        out_f = self.features * 4
        h = Conv(self.features, kernel_size=(1,) * nd, use_bias=False, kernel_init=KERNEL_INIT)(x)
        h = nn.relu(Norm(self.norm)(h, train))
        h = Conv(self.features, kernel_size=(3,) * nd, padding="SAME", use_bias=False,
                    kernel_init=KERNEL_INIT)(h)
        h = nn.relu(Norm(self.norm)(h, train))
        h = Conv(out_f, kernel_size=(1,) * nd, use_bias=False, kernel_init=KERNEL_INIT)(h)
        h = Norm(self.norm)(h, train)
        if x.shape[-1] != out_f:
            x = Conv(out_f, kernel_size=(1,) * nd, use_bias=False, kernel_init=KERNEL_INIT)(x)
            x = Norm(self.norm)(x, train)
        return nn.relu(h + x)


def _branch_block(block_type: str, features: int, norm: str):
    """Branch building block by MODEL.HRNET.BLOCK_TYPE (reference:
    hrnet.py:551 blocks_dict). ConvNeXt blocks are pure residuals (no
    channel projection), matching the reference's use inside branches whose
    channels the transition already set."""
    bt = str(block_type).upper()
    if bt == "BOTTLENECK":
        # ``features`` is the expanded branch width (= NUM_CHANNELS x 4,
        # reference hrnet.py:638); HRBottleneck's internal width is the base
        return Bottleneck(max(1, features // 4), norm)
    if bt in ("CONVNEXT_V1", "CONVNEXT_V2"):
        from biapy_tpu.models.blocks import ConvNeXtBlockV1, ConvNeXtBlockV2

        cls = ConvNeXtBlockV1 if bt == "CONVNEXT_V1" else ConvNeXtBlockV2
        return cls(features)
    return BasicBlock(features, norm)


class HRModule(nn.Module):
    """Parallel branches + full exchange fusion (reference: hrnet.py:41)."""

    channels: Sequence[int]
    num_blocks: int = 4
    norm: str = "bn"
    block_type: str = "BASIC"

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        nd = xs[0].ndim - 2
        n = len(self.channels)
        ys = []
        for i in range(n):
            h = xs[i]
            for _ in range(self.num_blocks):
                h = _branch_block(self.block_type, self.channels[i], self.norm)(h, train)
            ys.append(h)
        # fusion: every output i sums contributions from every branch j
        fused = []
        for i in range(n):
            acc = None
            for j in range(n):
                h = ys[j]
                if j > i:  # lower res -> upsample + 1-conv
                    h = Conv(self.channels[i], kernel_size=(1,) * nd, use_bias=False,
                                kernel_init=KERNEL_INIT)(h)
                    h = Norm(self.norm)(h, train)
                    h = _resize_to(h, ys[i].shape[1:-1])
                elif j < i:  # higher res -> strided 3-convs down
                    for step in range(i - j):
                        last = step == i - j - 1
                        h = Conv(self.channels[i] if last else self.channels[j],
                                    kernel_size=(3,) * nd, strides=(2,) * nd, padding="SAME",
                                    use_bias=False, kernel_init=KERNEL_INIT)(h)
                        h = Norm(self.norm)(h, train)
                        if not last:
                            h = nn.relu(h)
                acc = h if acc is None else acc + h
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    ndim: int = 2
    variant: str = "32"  # "18" | "32" | "48" | "64"
    output_channels: Sequence[int] = (1,)
    output_channel_info: Sequence[str] = ("F",)
    normalization: str = "bn"
    num_stages: int = 3
    num_modules: Sequence[int] = (1, 4, 3)
    num_blocks: int = 4
    block_type: str = "BASIC"    # BASIC | BOTTLENECK | CONVNEXT_V1 | CONVNEXT_V2
    head_type: str = "FCN"       # FCN | ASPP | PSP | OCR
    contrast: bool = False
    contrast_proj_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = self.ndim
        c = int(self.variant) if str(self.variant).isdigit() else 32
        # branch width = NUM_CHANNELS x block.expansion (reference
        # hrnet.py:638); BOTTLENECK expands x4, everything else x1
        expansion = 4 if str(self.block_type).upper() == "BOTTLENECK" else 1
        norm = self.normalization or "bn"
        full_spatial = x.shape[1:-1]

        # stem: two stride-2 convs -> 1/4 resolution
        h = Conv(64, kernel_size=(3,) * nd, strides=(2,) * nd, padding="SAME",
                    use_bias=False, kernel_init=KERNEL_INIT)(x)
        h = nn.relu(Norm(norm)(h, train))
        h = Conv(64, kernel_size=(3,) * nd, strides=(2,) * nd, padding="SAME",
                    use_bias=False, kernel_init=KERNEL_INIT)(h)
        h = nn.relu(Norm(norm)(h, train))
        # layer1: FOUR bottleneck blocks (reference hrnet.py layer1 —
        # param-count parity pinned by tests/test_param_parity.py)
        for _ in range(4):
            h = Bottleneck(64, norm)(h, train)

        branches = [h]
        for stage in range(self.num_stages):
            chans = [c * (2**k) * expansion for k in range(stage + 2)]
            # transition: adapt existing branches, create the new lowest one
            new_branches = []
            for i, ch in enumerate(chans):
                if i < len(branches):
                    b = branches[i]
                    if b.shape[-1] != ch:
                        b = Conv(ch, kernel_size=(3,) * nd, padding="SAME", use_bias=False,
                                    kernel_init=KERNEL_INIT)(b)
                        b = nn.relu(Norm(norm)(b, train))
                    new_branches.append(b)
                else:
                    b = Conv(ch, kernel_size=(3,) * nd, strides=(2,) * nd, padding="SAME",
                                use_bias=False, kernel_init=KERNEL_INIT)(branches[-1])
                    b = nn.relu(Norm(norm)(b, train))
                    new_branches.append(b)
            branches = new_branches
            for _ in range(self.num_modules[min(stage, len(self.num_modules) - 1)]):
                branches = HRModule(tuple(chans), self.num_blocks, norm,
                                    self.block_type)(branches, train)

        # head: upsample everything to the finest branch, concat
        target = branches[0].shape[1:-1]
        ups = [branches[0]] + [_resize_to(b, target) for b in branches[1:]]
        feat = jnp.concatenate(ups, axis=-1)
        fused = feat  # the contrastive embed projects the RAW concat
        # (reference hrnet.py:728: proj_head on head_in_channels)

        # HEAD_TYPE dispatch (reference: hrnet.py:675-725). ASPP/PSP/OCR
        # refine the fused features to 256 dims; the reference emits those
        # 256 features directly as "pred" (heads.py OCRHead returns
        # ocr_feats with no classifier — an output that can never match
        # output_channels); here the refined features go through the same
        # per-output 1-convs as FCN so every head type yields usable logits.
        ht = str(self.head_type).upper()
        if ht == "ASPP":
            from biapy_tpu.models.heads import ASPP

            feat = ASPP(256, norm=norm)(feat, train)
        elif ht == "PSP":
            from biapy_tpu.models.heads import PSP

            feat = PSP(256, norm=norm)(feat, train)
        elif ht == "OCR":
            from biapy_tpu.models.heads import OCRHead

            feat = OCRHead(256, num_classes=int(self.output_channels[0]),
                           norm=norm)(feat, train)
        elif self.contrast:
            # FCN + contrast: 3-conv -> norm -> dropout refinement before
            # the classifiers (reference hrnet.py:712-719); plain FCN feeds
            # the raw concat straight to the per-output 1-convs (:721-723)
            feat = Conv(feat.shape[-1], kernel_size=(3,) * nd, padding="SAME",
                        kernel_init=KERNEL_INIT)(feat)
            feat = Norm(norm)(feat, train)
            feat = nn.Dropout(0.10, deterministic=not train)(feat)

        out: Dict = {}
        one = (1,) * nd
        preds, class_outs = [], []
        for i, out_ch in enumerate(self.output_channels):
            head = Conv(out_ch, kernel_size=one, kernel_init=KERNEL_INIT)(feat)
            head = _resize_to(head, full_spatial)  # undo the stem stride
            (class_outs if "class" in self.output_channel_info[i] else preds).append(head)
        out["pred"] = jnp.concatenate(preds, axis=-1)
        if class_outs:
            out["class"] = jnp.concatenate(class_outs, axis=-1)
        if self.contrast:
            out["embed"] = ProjectionHead(self.contrast_proj_dim)(fused, train)
        return out["pred"] if len(out) == 1 else out


def network_stride(ndim: int) -> List[int]:
    """Full-res output after the head upsample; the contrastive embed sits at
    stride 4 (reference: models/__init__.py:181-240)."""
    return [1] * ndim
