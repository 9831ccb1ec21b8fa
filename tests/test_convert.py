"""Checkpoint conversion tests.

Two layers of checking:
  * mechanical: synthesized torchvision/reference-layout state_dicts load
    fully into the flax templates (strict=False semantics, shape checks);
  * numerical: a small torch oracle model built to the reference architecture
    spec (stride on conv1, dilated conv2, ASPP sum head, align_corners
    upsampling) produces the same outputs as our flax model after conversion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasac_tpu.nn import convert
from dasac_tpu.nn.factory import build_model
from dasac_tpu.nn.resnet import ASPP, Bottleneck

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402


def _template(arch, num_classes=7, hw=(32, 32)):
    model = build_model(arch, num_classes)
    x = jnp.zeros((1, *hw, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False, update_stats=False)
    return model, dict(variables)


def _synth_state_dict(arch, torch_style, template):
    """Build a random state_dict with the shapes the key map expects."""
    rng = np.random.RandomState(0)
    kmap = convert.key_map(arch, torch_style)
    sd = {}
    for tkey, (coll, path, kind) in kmap.items():
        node = template[coll]
        ok = True
        for p in path:
            if p not in node:
                ok = False
                break
            node = node[p]
        if not ok:
            continue
        shape = tuple(node.shape)
        if kind == "conv":
            shape = (shape[3], shape[2], shape[0], shape[1])  # HWIO -> OIHW
        sd[tkey] = rng.randn(*shape).astype(np.float32)
    return sd


@pytest.mark.parametrize("arch", [
    "deeplabv2_resnet101", "deeplabv2_vgg16_bn", "fcn_vgg16_bn",
])
@pytest.mark.parametrize("torch_style", ["torchvision", "reference"])
def test_state_dict_roundtrip(arch, torch_style):
    _, template = _template(arch)
    sd = _synth_state_dict(arch, torch_style, template)
    assert len(sd) > 50
    new_vars, n_loaded, skipped = convert.apply_state_dict(
        template, sd, arch, torch_style)
    assert n_loaded == len(sd), (n_loaded, len(sd), skipped[:5])
    assert not skipped
    # spot check a conv transposed correctly
    tkey = next(k for k, v in convert.key_map(arch, torch_style).items()
                if v[2] == "conv" and k in sd)
    coll, path, _ = convert.key_map(arch, torch_style)[tkey]
    node = new_vars[coll]
    for p in path:
        node = node[p]
    np.testing.assert_array_equal(
        np.asarray(node), np.transpose(sd[tkey], (2, 3, 1, 0)))


def test_unknown_keys_skipped_strict_false():
    _, template = _template("deeplabv2_resnet101")
    sd = {"fc.weight": np.zeros((1000, 2048), np.float32),
          "fc.bias": np.zeros((1000,), np.float32)}
    _, n_loaded, skipped = convert.apply_state_dict(
        template, sd, "deeplabv2_resnet101", "torchvision")
    assert n_loaded == 0 and len(skipped) == 2


def test_split_sac_snapshot():
    sd = {
        "module.backbone.model.conv1.weight": np.zeros((2,)),
        "module.slow_net.model.conv1.weight": np.ones((2,)),
        "module.running_conf": np.full((19,), 0.5),
        "module.slow_init": np.ones((1,)),
    }
    student, teacher, extras = convert.split_sac_snapshot(sd)
    assert list(student) == ["model.conv1.weight"]
    assert list(teacher) == ["model.conv1.weight"]
    assert extras["running_conf"].shape == (19,)
    assert extras["slow_init"][0] == 1


# ---------------------------------------------------------------------------
# numeric parity: torch oracle bottleneck vs flax Bottleneck
# ---------------------------------------------------------------------------


class _TorchBottleneck(tnn.Module):
    """Oracle for the reference bottleneck: stride on conv1, dilated conv2."""

    def __init__(self, cin, planes, stride, dilation, downsample):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, stride=stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=dilation,
                                dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.down = None
        if downsample:
            self.down = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        r = self.down(x) if self.down is not None else x
        y = TF.relu(self.bn1(self.conv1(x)))
        y = TF.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return TF.relu(y + r)


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_bottleneck_numeric_parity(stride, dilation):
    cin, planes = 8, 4
    tmodel = _TorchBottleneck(cin, planes, stride, dilation, downsample=True)
    tmodel.eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_()
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_()
                m.bias.normal_()

    fmodel = Bottleneck(planes, stride=stride, dilation=dilation,
                        has_downsample=True)
    x = np.random.RandomState(0).randn(2, 16, 16, cin).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            update_stats=False)

    # port torch weights -> flax via the same transforms convert.py uses
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = jax.tree.map(np.asarray, dict(variables["params"]))
    stats = jax.tree.map(np.asarray, dict(variables["batch_stats"]))

    def conv(k):
        return np.transpose(sd[k], (2, 3, 1, 0))

    for i in (1, 2, 3):
        params["conv%d" % i]["kernel"] = conv("conv%d.weight" % i)
        params["bn%d" % i]["scale"] = sd["bn%d.weight" % i]
        params["bn%d" % i]["bias"] = sd["bn%d.bias" % i]
        stats["bn%d" % i]["mean"] = sd["bn%d.running_mean" % i]
        stats["bn%d" % i]["var"] = sd["bn%d.running_var" % i]
    params["downsample_conv"]["kernel"] = conv("down.0.weight")
    params["downsample_bn"]["scale"] = sd["down.1.weight"]
    params["downsample_bn"]["bias"] = sd["down.1.bias"]
    stats["downsample_bn"]["mean"] = sd["down.1.running_mean"]
    stats["downsample_bn"]["var"] = sd["down.1.running_var"]

    ours = fmodel.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), update_stats=False)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=2e-4)


def test_aspp_numeric_parity():
    """ASPP == sum of four dilated 3x3 convs (reference Classifier_Module)."""
    cin, ncls = 16, 5
    x = np.random.RandomState(1).randn(1, 9, 9, cin).astype(np.float32)
    fmodel = ASPP(ncls)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, dict(variables["params"]))

    tconvs = []
    for i, d in enumerate((6, 12, 18, 24)):
        c = tnn.Conv2d(cin, ncls, 3, padding=d, dilation=d, bias=True)
        with torch.no_grad():
            c.weight.normal_(0, 0.1)
            c.bias.normal_()
        tconvs.append(c)
        params["conv%d" % i]["kernel"] = np.transpose(
            c.weight.detach().numpy(), (2, 3, 1, 0))
        params["conv%d" % i]["bias"] = c.bias.detach().numpy()

    ours = fmodel.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = sum(c(xt) for c in tconvs)
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=2e-4)
