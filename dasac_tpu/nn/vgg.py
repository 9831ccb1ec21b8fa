"""VGG-16(BN) backbones: DeepLabv2 head and FCN8s, in flax/NHWC.

Parity with the reference:
  * DeepLabv2/VGG-16 (``models/deeplabv2.py:229-312``): torchvision vgg16_bn
    features with pool4/pool5 removed (indices 33,43), dilation 2 on conv5_*
    (indices 34,37,40), dilated fc6/fc7 (3x3, 1024ch, dilation 4), ASPP head.
  * FCN8s/VGG-16 (``models/fcn.py:10-149``): features split at pool3/pool4,
    4096-ch head (7x7 then 1x1) with BN+channel-dropout, skip fusions via
    score_pool4/score_pool3 with 2x align_corners=True upsampling.

Module names carry the torchvision feature index (``features_<idx>``) so the
torch->flax checkpoint converter is a pure name map.
"""

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from jax.ad_checkpoint import checkpoint_name

from dasac_tpu.nn.functional import max_pool, resize_bilinear_align_corners
from dasac_tpu.nn.layers import SyncBatchNorm, conv_init_normal
from dasac_tpu.nn.resnet import ASPP, convs_policy, remat_mode

# torchvision vgg16_bn feature layout: (torch_index, kind, out_channels)
# pools sit at indices 6, 13, 23, 33, 43
_VGG16_BN_LAYOUT: Tuple = (
    (0, "conv", 64), (1, "bn", 64),
    (3, "conv", 64), (4, "bn", 64),
    (6, "pool", None),
    (7, "conv", 128), (8, "bn", 128),
    (10, "conv", 128), (11, "bn", 128),
    (13, "pool", None),
    (14, "conv", 256), (15, "bn", 256),
    (17, "conv", 256), (18, "bn", 256),
    (20, "conv", 256), (21, "bn", 256),
    (23, "pool", None),
    (24, "conv", 512), (25, "bn", 512),
    (27, "conv", 512), (28, "bn", 512),
    (30, "conv", 512), (31, "bn", 512),
    (33, "pool", None),
    (34, "conv", 512), (35, "bn", 512),
    (37, "conv", 512), (38, "bn", 512),
    (40, "conv", 512), (41, "bn", 512),
    (43, "pool", None),
)


class _VGGRange(nn.Module):
    """One contiguous run [lo, hi) of vgg16_bn feature indices."""

    lo: int
    hi: int
    skip_pools: Sequence[int] = ()
    dilate: Sequence[int] = ()
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    # tag conv outputs for the "convs" remat policy (see nn/resnet.py);
    # False keeps the emitted HLO bit-identical to the untagged module
    tag_convs: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool):
        for idx, kind, ch in _VGG16_BN_LAYOUT:
            if not (self.lo <= idx < self.hi):
                continue
            if kind == "pool":
                if idx in self.skip_pools:
                    continue
                x = max_pool(x, window=2, stride=2)
            elif kind == "conv":
                d = 2 if idx in self.dilate else 1
                x = nn.Conv(
                    ch, (3, 3), kernel_dilation=d, padding=d, use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="features_{}".format(idx),
                )(x)
                if self.tag_convs:
                    x = checkpoint_name(x, "conv_out")
            else:  # bn (always followed by relu in vgg16_bn)
                x = nn.relu(
                    SyncBatchNorm(ch, axis_name=self.axis_name, dtype=self.dtype,
                                  name="features_{}".format(idx))(x, not update_stats)
                )
        return x


_VGGRangeRemat = nn.remat(_VGGRange, static_argnums=(2,))
_VGGRangeRematConvs = nn.remat(_VGGRange, static_argnums=(2,),
                               policy=convs_policy())


class VGGStage(nn.Module):
    """A run of vgg16_bn feature indices, optionally split into
    ``remat_chunks`` that are individually checkpointed (jax.checkpoint).

    The chunk submodules share this stage's scope (nn.share_scope), so the
    parameter paths (``features_<idx>``) are identical with and without
    remat — the torch converter's name map depends on that.
    """

    start: int
    stop: int  # exclusive torch index bound
    skip_pools: Sequence[int] = ()
    dilate: Sequence[int] = ()  # conv indices that get dilation 2
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    remat_chunks: Sequence[Tuple[int, int]] = ()
    remat_kind: str = "block"  # "block" or "convs"; used when chunks are set

    def setup(self):
        chunks = tuple(self.remat_chunks) or ((self.start, self.stop),)
        convs = bool(self.remat_chunks) and self.remat_kind == "convs"
        if self.remat_chunks:
            cls = _VGGRangeRematConvs if convs else _VGGRangeRemat
        else:
            cls = _VGGRange
        self.ranges = [
            cls(lo, hi, self.skip_pools, self.dilate, self.dtype,
                self.axis_name, convs)
            for lo, hi in chunks
        ]
        for r in self.ranges:
            nn.share_scope(self, r)

    def __call__(self, x, update_stats: bool):
        for r in self.ranges:
            x = r(x, update_stats)
        return x


class DeepLabV2VGG16(nn.Module):
    """DeepLabv2 / VGG-16-BN, output stride 8, (logits, logits_up).

    With ``remat`` the feature trunk is checkpointed in four chunks at the
    pool boundaries (full-res VGG activations dominate HBM otherwise).
    """

    num_classes: int = 19
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    remat: object = False  # bool (legacy) or "none"/"block"/"convs"

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        mode = remat_mode(self.remat)
        chunks = ((0, 7), (7, 14), (14, 24), (24, 44)) if mode != "none" else ()
        feats = VGGStage(0, 44, skip_pools=(33, 43), dilate=(34, 37, 40),
                         dtype=self.dtype, axis_name=self.axis_name,
                         remat_chunks=chunks, remat_kind=mode,
                         name="features")(x.astype(self.dtype), update_stats)
        conv_kw = dict(use_bias=True, dtype=self.dtype, param_dtype=jnp.float32)
        feats = nn.relu(nn.Conv(1024, (3, 3), kernel_dilation=4, padding=4,
                                name="fc6", **conv_kw)(feats))
        feats = nn.relu(nn.Conv(1024, (3, 3), kernel_dilation=4, padding=4,
                                name="fc7", **conv_kw)(feats))
        logits = ASPP(self.num_classes, dtype=self.dtype, name="aspp")(feats)
        logits = logits.astype(jnp.float32)
        logits_up = resize_bilinear_align_corners(logits, (h, w))
        return logits, logits_up


class VGG16FCN8s(nn.Module):
    """FCN8s / VGG-16-BN, output stride 8, (logits, logits_up)."""

    num_classes: int = 19
    drop_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    remat: object = False  # bool (legacy) or "none"/"block"/"convs"

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        xd = x.astype(self.dtype)
        mode = remat_mode(self.remat)
        stage_kw = dict(dtype=self.dtype, axis_name=self.axis_name,
                        remat_kind=mode)
        c1 = ((0, 7), (7, 14), (14, 24)) if mode != "none" else ()
        c2 = ((24, 34),) if mode != "none" else ()
        c3 = ((34, 44),) if mode != "none" else ()
        pool3 = VGGStage(0, 24, remat_chunks=c1, name="block1",
                         **stage_kw)(xd, update_stats)      # 1/8
        pool4 = VGGStage(24, 34, remat_chunks=c2, name="block2",
                         **stage_kw)(pool3, update_stats)   # 1/16
        pool5 = VGGStage(34, 44, remat_chunks=c3, name="block3",
                         **stage_kw)(pool4, update_stats)   # 1/32

        conv_kw = dict(use_bias=True, dtype=self.dtype, param_dtype=jnp.float32)
        # bottleneck head at 1/32 (reference fcn.py:47-58)
        s = nn.Conv(4096, (7, 7), padding=3, name="head_fc6", **conv_kw)(pool5)
        s = nn.relu(SyncBatchNorm(4096, axis_name=self.axis_name, dtype=self.dtype,
                                  name="head_bn6")(s, not update_stats))
        s = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(s)
        s = nn.Conv(4096, (1, 1), name="head_fc7", **conv_kw)(s)
        s = nn.relu(SyncBatchNorm(4096, axis_name=self.axis_name, dtype=self.dtype,
                                  name="head_bn7")(s, not update_stats))
        s = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(s)
        s = nn.Conv(self.num_classes, (1, 1), name="head_score", **conv_kw)(s)

        def up_to(t, skip):
            # reference up_x2 (fcn.py:107-109) assumes H,W divisible by 32;
            # resizing to the skip's grid is IDENTICAL there (2x) and keeps
            # odd sizes working instead of a broadcast crash
            return resize_bilinear_align_corners(
                t, (skip.shape[-3], skip.shape[-2]))

        score4 = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_init_normal(),
                         name="score_pool4", **conv_kw)(pool4)
        s = up_to(s, score4) + score4
        score3 = nn.Conv(self.num_classes, (1, 1), kernel_init=conv_init_normal(),
                         name="score_pool3", **conv_kw)(pool3)
        s = up_to(s, score3) + score3

        logits = s.astype(jnp.float32)
        logits_up = resize_bilinear_align_corners(logits, (h, w))
        return logits, logits_up
