"""Tiny segmentation model (registered arch name: "tiny").

Not a reference arch — exists for CI smoke runs, CPU end-to-end tests, and
quick CLI drives where the full backbones are too heavy."""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from dasac_tpu.nn.functional import resize_bilinear_align_corners
from dasac_tpu.nn.layers import SyncBatchNorm


class TinySeg(nn.Module):
    num_classes: int = 5
    width: int = 8
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    remat: object = False  # accepted for interface parity; nothing to checkpoint

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        y = nn.Conv(self.width, (3, 3), strides=2, name="conv_a")(x)
        y = nn.relu(SyncBatchNorm(self.width, axis_name=self.axis_name,
                                  name="bn_a")(y, not update_stats))
        y = nn.Conv(self.width, (3, 3), strides=2, name="conv_b")(y)
        y = nn.relu(SyncBatchNorm(self.width, axis_name=self.axis_name,
                                  name="bn_b")(y, not update_stats))
        y = nn.Dropout(0.1, broadcast_dims=(1, 2),
                       deterministic=not train)(y)
        logits = nn.Conv(self.num_classes, (1, 1), name="aspp")(y)
        logits = logits.astype(jnp.float32)
        logits_up = resize_bilinear_align_corners(logits, (h, w))
        return logits, logits_up
