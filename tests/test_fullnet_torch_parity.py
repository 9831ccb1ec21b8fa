"""WHOLE-network numerical parity against the reference's own torch models.

Builds the reference repo's torch modules (models/deeplabv2.py:54-312,
models/fcn.py:10-149) with randomized weights AND randomized BN running
statistics, pushes the state_dict through dasac_tpu.nn.convert, and asserts
the flax forward (fp32, eval mode) reproduces both the raw logits and the
align_corners-upsampled logits end to end.  This is the strongest mIoU-parity
proxy available without the datasets: if every logit matches, the network IS
the reference network.

torchvision is not installed here; the reference only uses
``torchvision.models.vgg16_bn()`` as an architecture template, so an
equivalent stub (identical Sequential layout and layer indices) is injected.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasac_tpu.nn import convert
from dasac_tpu.nn.factory import build_model

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

REF = "/root/reference"


def _install_torchvision_stub():
    """Minimal torchvision.models with the exact vgg16_bn layout
    (conv indices 0,3,...,40; pools at 6,13,23,33,43)."""
    if "torchvision" in sys.modules:
        return

    def vgg16_bn(**kw):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_c = [], 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(kernel_size=2, stride=2))
            else:
                layers += [tnn.Conv2d(in_c, v, 3, padding=1),
                           tnn.BatchNorm2d(v), tnn.ReLU(inplace=True)]
                in_c = v

        class _VGG(tnn.Module):
            def __init__(self):
                super().__init__()
                self.features = tnn.Sequential(*layers)
                self.avgpool = tnn.AdaptiveAvgPool2d((7, 7))
                self.classifier = tnn.Sequential(
                    tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(True),
                    tnn.Dropout(), tnn.Linear(4096, 4096), tnn.ReLU(True),
                    tnn.Dropout(), tnn.Linear(4096, 1000))

        return _VGG()

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.vgg16_bn = vgg16_bn
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models


def _ref_modules():
    """Import the reference model modules WITHOUT executing the package
    __init__ (which pulls in the full training stack)."""
    _install_torchvision_stub()
    if "models" not in sys.modules or not getattr(
            sys.modules["models"], "__path__", None):
        pkg = types.ModuleType("models")
        pkg.__path__ = [REF + "/models"]
        sys.modules["models"] = pkg
    import models.deeplabv2 as ref_dl  # noqa: E402
    import models.fcn as ref_fcn  # noqa: E402
    return ref_dl, ref_fcn


def _build_ref(arch, num_classes=19):
    ref_dl, ref_fcn = _ref_modules()
    if arch == "deeplabv2_resnet101":
        return ref_dl.DeepLabV2_ResNet101(num_classes)
    if arch == "deeplabv2_vgg16_bn":
        return ref_dl.DeepLabV2_VGG16(num_classes, use_bn=True)
    if arch == "fcn_vgg16_bn":
        return ref_fcn.VGG16_FCN8s(num_classes, use_bn=True)
    raise ValueError(arch)


def _randomize(model, seed=0):
    """Non-trivial weights + BN running statistics everywhere."""
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        elif k.endswith("running_mean"):
            sd[k] = 0.3 * torch.randn(v.shape, generator=g)
        elif k.endswith(".bias") or ".bn" in k or "weight" not in k:
            sd[k] = 0.2 * torch.randn(v.shape, generator=g)
        else:
            fan = max(1, int(np.prod(v.shape[1:])))
            sd[k] = torch.randn(v.shape, generator=g) / np.sqrt(fan)
    model.load_state_dict(sd)
    return model


@pytest.mark.parametrize("arch", [
    "deeplabv2_resnet101", "deeplabv2_vgg16_bn", "fcn_vgg16_bn",
])
def test_fullnet_logits_parity(arch):
    num_classes = 19
    ref = _randomize(_build_ref(arch, num_classes))
    ref.eval()  # NB: BaseNet.train() returns None, so .eval() can't chain

    model = build_model(arch, num_classes)
    hw = (64, 96)  # non-square: catches H/W transposition
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, *hw, 3)), train=False,
                           update_stats=False)
    variables, n_loaded, skipped = convert.apply_state_dict(
        dict(variables), ref.state_dict(), arch, "reference")
    # every torch tensor must land (no silent misses)
    real = [k for k in skipped if not k.endswith("num_batches_tracked")]
    assert not real, "unconverted torch keys: {}".format(real[:8])
    assert n_loaded > 80  # vgg16_bn converts 90 tensors, resnet101 ~530

    x = np.random.RandomState(1).randn(2, *hw, 3).astype(np.float32)
    with torch.no_grad():
        t_logits, t_up = ref(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))))
    logits, up = model.apply(variables, jnp.asarray(x), train=False,
                             update_stats=False)

    np.testing.assert_allclose(
        np.asarray(logits), np.transpose(t_logits.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=5e-4, err_msg=arch + " logits")
    np.testing.assert_allclose(
        np.asarray(up), np.transpose(t_up.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=5e-4, err_msg=arch + " logits_up")


def test_sac_snapshot_teacher_parity():
    """A reference-style SAC snapshot (module.backbone.* / module.slow_net.*)
    restores BOTH networks: the teacher forward equals the torch slow_net."""
    num_classes = 19
    arch = "deeplabv2_vgg16_bn"  # cheapest of the three
    student = _randomize(_build_ref(arch, num_classes), seed=1)
    slow_net = _randomize(_build_ref(arch, num_classes), seed=2)
    student.eval()
    slow_net.eval()

    snap = {}
    for k, v in student.state_dict().items():
        snap["module.backbone." + k] = v.numpy()
    for k, v in slow_net.state_dict().items():
        snap["module.slow_net." + k] = v.numpy()
    snap["module.running_conf"] = np.linspace(0, 1, num_classes,
                                              dtype=np.float32)
    snap["module.slow_init"] = np.ones((), np.float32)

    s_sd, t_sd, extras = convert.split_sac_snapshot(snap)
    assert extras["running_conf"].shape == (num_classes,)
    assert float(extras["slow_init"]) == 1.0
    assert "_unmatched" not in extras

    model = build_model(arch, num_classes)
    hw = (48, 64)
    init = model.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1, *hw, 3)), train=False, update_stats=False)
    x = np.random.RandomState(3).randn(1, *hw, 3).astype(np.float32)

    for sd, ref in ((s_sd, student), (t_sd, slow_net)):
        variables, _, skipped = convert.apply_state_dict(
            dict(init), sd, arch, "reference")
        real = [k for k in skipped if not k.endswith("num_batches_tracked")]
        assert not real, real[:8]
        _, up = model.apply(variables, jnp.asarray(x), train=False,
                            update_stats=False)
        with torch.no_grad():
            _, t_up = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(
            np.asarray(up), np.transpose(t_up.numpy(), (0, 2, 3, 1)),
            rtol=1e-4, atol=5e-4)
