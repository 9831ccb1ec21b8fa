"""Model factory: arch name -> flax module (reference models/__init__.py:14-41).

The SAC teacher is not a second module here — it is a second parameter pytree
managed by the train state (see dasac_tpu/core/state.py), so the factory only
builds backbones.
"""

from typing import Optional

import jax.numpy as jnp

from dasac_tpu.nn.resnet import DeepLabV2ResNet101
from dasac_tpu.nn.tiny import TinySeg
from dasac_tpu.nn.vgg import DeepLabV2VGG16, VGG16FCN8s

ARCHS = {
    "deeplabv2_resnet101": DeepLabV2ResNet101,
    "deeplabv2_vgg16_bn": DeepLabV2VGG16,
    "fcn_vgg16_bn": VGG16FCN8s,
    "tiny": TinySeg,  # CI smoke arch, not a reference model
}


def build_model(arch: str, num_classes: int, dtype=jnp.float32,
                axis_name: Optional[str] = None, remat=False):
    """``remat``: False/"none" (keep activations), True/"block" (checkpoint
    residual blocks / stage chunks), or "convs" (save conv outputs only,
    recompute the elementwise BN/ReLU chain — see nn/resnet.remat_mode)."""
    key = arch.lower()
    assert key in ARCHS, "Unknown arch: {} (have {})".format(arch, sorted(ARCHS))
    return ARCHS[key](num_classes=num_classes, dtype=dtype,
                      axis_name=axis_name, remat=remat)


def compute_dtype(cfg_tpu):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg_tpu.COMPUTE_DTYPE]


def new_param_scopes(arch: str):
    """Top-level flax scope names whose params are 'from scratch' (10x/20x LR).

    Parity with the reference from_scratch registries:
      resnet101: ASPP classifier (deeplabv2.py:195)
      vgg16 deeplab: classifier + fc6 + fc7 (deeplabv2.py:278-280)
      fcn: vgg_head + score_pool4 + score_pool3 (fcn.py:78-95)
    """
    key = arch.lower()
    if key == "deeplabv2_resnet101":
        return ("aspp",)
    if key == "deeplabv2_vgg16_bn":
        return ("aspp", "fc6", "fc7")
    if key == "fcn_vgg16_bn":
        return ("head_fc6", "head_bn6", "head_fc7", "head_bn7", "head_score",
                "score_pool4", "score_pool3")
    if key == "tiny":
        return ("aspp",)
    raise ValueError(arch)
