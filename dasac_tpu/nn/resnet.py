"""DeepLabv2 with dilated ResNet-101 backbone (stride 8) in flax/NHWC.

Architecture parity with the reference (``models/deeplabv2.py:54-227``):
  * stem: 7x7/2 conv -> BN -> relu -> 3x3/2 ceil-mode maxpool
  * layer1 (3 bottlenecks), layer2 (4, stride 2), layer3 (23, dilation 2),
    layer4 (3, dilation 4) — stride on the first 1x1 conv of each bottleneck
    (CRST/v1 convention), downsample projection also on blocks that only
    change dilation (reference ``deeplabv2.py:145``)
  * ASPP head: sum of four 3x3 convs, dilations 6/12/18/24
    (``Classifier_Module``, ``deeplabv2.py:101-116``)
  * logits upsampled to input size with align_corners=True bilinear

TPU-first: NHWC layout, bf16 compute / f32 params+BN, cross-replica BN via
``axis_name`` (replaces nn.SyncBatchNorm), no Python control flow under jit.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from dasac_tpu.nn.functional import max_pool_ceil, resize_bilinear_align_corners
from dasac_tpu.nn.layers import SyncBatchNorm, conv_init_normal


def remat_mode(remat):
    """Normalize the model ``remat`` attribute: bool (legacy) or str.

    "none"  — keep all activations (fastest when they fit);
    "block" — jax.checkpoint each residual block / stage chunk (only block
              inputs survive the forward; convs recomputed in backward);
    "convs" — checkpoint each block with a ``save_only_these_names`` policy
              that KEEPS the conv outputs and recomputes only the frozen-BN/
              ReLU elementwise chain in backward (no conv recompute; drops
              the elementwise residuals' HBM traffic).
    """
    mode = {False: "none", True: "block"}.get(remat, remat)
    if mode not in ("none", "block", "convs"):
        raise ValueError("remat must be none/block/convs, got {!r}".format(remat))
    return mode


def convs_policy():
    """Checkpoint policy for ``remat='convs'``: save tagged conv outputs."""
    return jax.checkpoint_policies.save_only_these_names("conv_out")


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    # tag conv outputs with jax.ad_checkpoint.checkpoint_name so the "convs"
    # remat policy can save them; False keeps the emitted HLO bit-identical
    # to the untagged module (compile-cache stability for none/block modes)
    tag_convs: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool):
        conv_kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=conv_init_normal())
        tag = (lambda t: checkpoint_name(t, "conv_out")) if self.tag_convs \
            else (lambda t: t)

        residual = x
        out = tag(nn.Conv(self.planes, (1, 1), strides=self.stride,
                          name="conv1", **conv_kw)(x))
        out = nn.relu(SyncBatchNorm(self.planes, axis_name=self.axis_name,
                                    dtype=self.dtype, name="bn1")(out, not update_stats))
        out = tag(nn.Conv(
            self.planes, (3, 3),
            kernel_dilation=self.dilation,
            padding=self.dilation,
            name="conv2", **conv_kw,
        )(out))
        out = nn.relu(SyncBatchNorm(self.planes, axis_name=self.axis_name,
                                    dtype=self.dtype, name="bn2")(out, not update_stats))
        out = tag(nn.Conv(self.planes * 4, (1, 1), name="conv3", **conv_kw)(out))
        out = SyncBatchNorm(self.planes * 4, axis_name=self.axis_name,
                            dtype=self.dtype, name="bn3")(out, not update_stats)

        if self.has_downsample:
            residual = tag(nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                                   name="downsample_conv", **conv_kw)(x))
            residual = SyncBatchNorm(self.planes * 4, axis_name=self.axis_name,
                                     dtype=self.dtype, name="downsample_bn")(
                residual, not update_stats)

        return nn.relu(out + residual.astype(out.dtype))


class ASPP(nn.Module):
    """Sum of four dilated 3x3 classifier convs (DeepLabv2 head)."""

    num_classes: int
    dilations: tuple = (6, 12, 18, 24)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = None
        for i, d in enumerate(self.dilations):
            branch = nn.Conv(
                self.num_classes, (3, 3),
                kernel_dilation=d, padding=d, use_bias=True,
                dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=conv_init_normal(), name="conv{}".format(i),
            )(x)
            out = branch if out is None else out + branch
        return out


class ResNet101Backbone(nn.Module):
    """Dilated ResNet-101 trunk, output stride 8, 2048 channels.

    ``remat`` checkpoints each bottleneck (jax.checkpoint): only block
    inputs stay live through the backward pass, trading ~1 extra forward
    for the activation memory that lets the full 512x1024 batch fit in one
    chip's HBM.
    """

    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    layers: tuple = (3, 4, 23, 3)
    remat: object = False  # bool (legacy) or "none"/"block"/"convs"

    @nn.compact
    def __call__(self, x, update_stats: bool):
        mode = remat_mode(self.remat)

        def stem(mdl, xx):
            xx = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                         dtype=mdl.dtype, param_dtype=jnp.float32,
                         kernel_init=conv_init_normal(), name="conv1")(xx)
            xx = nn.relu(SyncBatchNorm(64, axis_name=mdl.axis_name,
                                       dtype=mdl.dtype,
                                       name="bn1")(xx, not update_stats))
            return max_pool_ceil(xx, window=3, stride=2, padding=1)

        if mode != "none":
            # the stem's full-resolution activations (~1GB per branch at
            # 512x1024 batch 8) are cheap to recompute — full remat in both
            # checkpointing modes
            x = nn.remat(stem)(self, x)
        else:
            x = stem(self, x)

        specs = [
            # (planes, stride, dilation)
            (64, 1, 1),
            (128, 2, 1),
            (256, 1, 2),
            (512, 1, 4),
        ]
        block_cls = Bottleneck
        if mode == "block":
            block_cls = nn.remat(Bottleneck, static_argnums=(2,))
        elif mode == "convs":
            block_cls = nn.remat(Bottleneck, static_argnums=(2,),
                                 policy=convs_policy())
        in_planes = 64
        for li, ((planes, stride, dilation), n_blocks) in enumerate(
            zip(specs, self.layers), start=1
        ):
            for bi in range(n_blocks):
                first = bi == 0
                # first block projects when shape/stride/dilation changes
                # (reference deeplabv2.py:145 also projects for dilation 2/4)
                has_down = first and (
                    stride != 1 or in_planes != planes * 4 or dilation in (2, 4)
                )
                x = block_cls(
                    planes,
                    stride=stride if first else 1,
                    dilation=dilation,
                    has_downsample=has_down,
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                    tag_convs=(mode == "convs"),
                    name="layer{}_{}".format(li, bi),
                )(x, update_stats)
                in_planes = planes * 4
        return x


class DeepLabV2ResNet101(nn.Module):
    """Returns (logits_s8, logits_up) like the reference forward
    (``deeplabv2.py:213-227`` without the loss, which lives in sac/losses)."""

    num_classes: int = 19
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    remat: object = False  # bool (legacy) or "none"/"block"/"convs"

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        feats = ResNet101Backbone(dtype=self.dtype, axis_name=self.axis_name,
                                  remat=self.remat,
                                  name="backbone")(x.astype(self.dtype), update_stats)
        logits = ASPP(self.num_classes, dtype=self.dtype, name="aspp")(feats)
        logits = logits.astype(jnp.float32)
        logits_up = resize_bilinear_align_corners(logits, (h, w))
        return logits, logits_up
