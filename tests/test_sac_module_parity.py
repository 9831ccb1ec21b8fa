"""TRAINING-STEP parity against the reference's OWN ``models/sac.py``.

The whole-network forward is proven elsewhere (test_fullnet_torch_parity);
this test retires the last class of possible drift — oracle-transcription
bias — by running the reference's real torch ``SAC`` module (student +
slow_net, models/sac.py:41-381) side by side with our compiled views-step
(dasac_tpu/train/steps.py:make_sac_views_step) for 3 iterations spanning the
teacher lazy init and two EMA updates (NET_MOMENTUM_ITER=1):

  * identical weights (torch state_dict pushed through nn/convert);
  * identical PRE-AUGMENTED views, affines and padding masks on both sides
    (both augmentation pipelines bypassed);
  * per iteration the torch side mirrors the reference trainer exactly
    (train.py:119-251): zero_grad -> source ``loss_ce.mean().backward()`` ->
    target ``LR_TARGET * self_ce`` backward -> single ``optim.step()``.

Asserted per iteration: source CE, self_ce, running_conf trajectory,
pseudo-label agreement, and gradient agreement on sampled tensors; after the
3 steps, student and teacher parameter trajectories.  Tolerances reflect the
documented bilinear-boundary differences of the separable warp vs
``F.grid_sample`` (tests/test_refine_torch_parity.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dasac_tpu.aug import pipelines
from dasac_tpu.core.state import TrainState
from dasac_tpu.nn import convert
from dasac_tpu.nn.factory import build_model
from dasac_tpu.nn.vgg import VGG16FCN8s
from dasac_tpu.train import steps
from dasac_tpu.utils.collections import AttrDict

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tests.test_fullnet_torch_parity import (_randomize,  # noqa: E402
                                             _ref_modules)

C = 19
H = W = 64
T = 3          # GROUP_SIZE
G = 2          # NUM_GROUPS
B_SRC = 2
LR = 0.01
LR_TARGET = 0.1
ITERS = 3

MCFG = dict(
    THRESHOLD_BETA=1e-3, NET_MOMENTUM=0.99, STAT_MOMENTUM=0.99,
    RUN_CONF_UPPER=0.75,
    # lowered from the config default 0.2: random-init nets predict with
    # ~1/19 confidence, and the floor clamp would ignore every pixel,
    # leaving nothing to compare
    RUN_CONF_LOWER=0.01,
    CONF_POOL="avg_pool", LOSS="focal_ce_conf", CONF_POOL_ON=True,
    CONF_DISCOUNT=True, FOCAL_P=3, LR_TARGET=LR_TARGET, BASELINE=False,
)


def _build_ref_sac(arch, overrides=None):
    """Reference SAC module: student + slow copy, BN frozen (freeze_bn=True
    as models/__init__.py:29 sets for SAC mode), dropout disabled so the
    student forward is deterministic on both sides."""
    ref_dl, ref_fcn = _ref_modules()
    import models.sac as ref_sac  # noqa: E402  (package installed above)

    crit = tnn.CrossEntropyLoss(ignore_index=255, reduction="none")

    def backbone(seed):
        if arch == "deeplabv2_vgg16_bn":
            net = ref_dl.DeepLabV2_VGG16(C, criterion=crit, use_bn=True,
                                         freeze_bn=True)
        elif arch == "fcn_vgg16_bn":
            net = ref_fcn.VGG16_FCN8s(C, criterion=crit, use_bn=True,
                                      freeze_bn=True, drop_rate=0.0)
        elif arch == "deeplabv2_resnet101":
            net = ref_dl.DeepLabV2_ResNet101(C, criterion=crit,
                                             freeze_bn=True)
        else:
            raise ValueError(arch)
        return _randomize(net, seed=hash(arch) % 1000 + seed)

    cfg = AttrDict()
    for k, v in {**MCFG, **(overrides or {})}.items():
        cfg[k] = v
    net = ref_sac.SAC(cfg, backbone(1), backbone(2), rank=0, num_classes=C)
    net.train()
    for m in net.modules():
        if isinstance(m, (tnn.Dropout, tnn.Dropout2d)):
            m.eval()
    return net


def _build_ours(arch):
    if arch == "fcn_vgg16_bn":
        return VGG16FCN8s(num_classes=C, drop_rate=0.0)
    return build_model(arch, C)


def _scfg(overrides=None):
    m = {**MCFG, **(overrides or {})}
    return steps.StepConfig(
        num_classes=C, crop_hw=(H, W), group_size=T, lr_target=LR_TARGET,
        net_momentum=m["NET_MOMENTUM"], net_momentum_iter=1,
        stat_momentum=m["STAT_MOMENTUM"],
        threshold_beta=m["THRESHOLD_BETA"],
        conf_discount=m["CONF_DISCOUNT"], pool=m["CONF_POOL"],
        pool_on=m["CONF_POOL_ON"], focal_p=m["FOCAL_P"],
        use_conf_loss=(m["LOSS"] == "focal_ce_conf"),
        run_conf_upper=m["RUN_CONF_UPPER"],
        run_conf_lower=m["RUN_CONF_LOWER"])


def _make_inputs():
    """One fixed batch, reused every iteration: pre-augmented target views
    from OUR pipeline (realistic affines/padding) + a plain source batch."""
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (G, H, W, 3)).astype(np.uint8)
    labels = rng.randint(0, C, (G, H, W)).astype(np.int32)
    labels[:, :6] = 255
    views = pipelines.augment_target_groups(
        jax.random.PRNGKey(42), jnp.asarray(imgs), jnp.asarray(labels),
        group_size=T, target_scale=(1.0, 1.1), zoom=(0.5, 1.2),
        group_hflip=True, guided_hflip=True, blur=True, jitter=0.4,
        greyscale=0.3, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
    views = jax.tree.map(np.asarray, views)

    src_x = rng.randn(B_SRC, H, W, 3).astype(np.float32)
    src_y = rng.randint(0, C, (B_SRC, H, W)).astype(np.int32)
    src_y[:, -8:] = 255
    return views, src_x, src_y


def _sample_keys(arch):
    """Three representative torch keys: an early conv, a BN scale, a
    from-scratch head conv — resolved through the SAME key map the
    converter/exporter use."""
    kmap = convert.key_map(arch, "reference")
    convs = sorted(k for k, v in kmap.items() if v[2] == "conv")
    bns = sorted(k for k, v in kmap.items()
                 if v[0] == "params" and v[1][-1] == "scale")
    return [convs[0], convs[-1], bns[len(bns) // 2]]


def _lookup(tree, path):
    for p in path:
        tree = tree[p]
    return np.asarray(tree)


def _to_t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def _run_parity(arch, overrides=None, iters=ITERS):
    ref = _build_ref_sac(arch, overrides)
    model = _build_ours(arch)
    scfg = _scfg(overrides)
    tx = optax.sgd(LR)

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, H, W, 3)), train=False,
                           update_stats=False)
    variables, _, skipped = convert.apply_state_dict(
        dict(variables), ref.backbone.state_dict(), arch, "reference")
    real = [k for k in skipped if not k.endswith("num_batches_tracked")]
    assert not real, real[:8]

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    state = TrainState(
        params=params, batch_stats=stats,
        teacher_params=jax.tree.map(jnp.asarray, params),
        teacher_stats=jax.tree.map(jnp.asarray, stats),
        opt_state=tx.init(params),
        running_conf=jnp.zeros((C,), jnp.float32),
        slow_init=jnp.zeros((), jnp.float32),
        step=jnp.zeros((), jnp.int32))

    views, src_x, src_y = _make_inputs()
    views_j = jax.tree.map(jnp.asarray, views)
    step = steps.make_sac_views_step(model, tx, scfg, debug=True)

    # torch-side inputs (NCHW); y carries -1 at augmentation padding —
    # the reference derives ignore_mask from it (sac.py:315-341)
    frames1 = _to_t(views.frames_aug.transpose(0, 3, 1, 2))
    frames2 = _to_t(views.frames_clean.transpose(0, 3, 1, 2))
    y_t = views.labels.astype(np.int64)
    y_t[views.padding] = -1
    aff = _to_t(views.affine)
    aff_inv = _to_t(views.affine_inv)
    src_x_t = _to_t(src_x.transpose(0, 3, 1, 2))
    src_y_t = _to_t(src_y.astype(np.int64))

    opt = torch.optim.SGD(ref.backbone.parameters(), lr=LR)
    keys = _sample_keys(arch)
    kmap = convert.key_map(arch, "reference")

    for it in range(iters):
        state, mets = step(state, jnp.asarray(src_x), jnp.asarray(src_y),
                           views_j, jax.random.PRNGKey(7))

        opt.zero_grad()
        losses_s, _ = ref(src_x_t, src_y_t.clone())
        losses_s["loss_ce"].mean().backward()
        losses_t, outs_t = ref(frames1, _to_t(y_t.copy()), frames2,
                               aff, aff_inv, use_teacher=True,
                               update_teacher=True, T=T)
        (LR_TARGET * losses_t["self_ce"].mean()).backward()

        # --- losses -----------------------------------------------------
        ce_ref = float(losses_s["loss_ce"].mean())
        np.testing.assert_allclose(float(mets["src_loss_ce"]), ce_ref,
                                   rtol=2e-4, atol=1e-6,
                                   err_msg="iter %d src CE" % it)
        self_ce_ref = float(losses_t["self_ce"].mean())
        np.testing.assert_allclose(float(mets["self_ce"]), self_ce_ref,
                                   rtol=5e-3, atol=1e-5,
                                   err_msg="iter %d self_ce" % it)

        # --- running class prior trajectory -----------------------------
        np.testing.assert_allclose(
            np.asarray(mets["running_conf"]),
            ref.running_conf.detach().numpy(), rtol=1e-4, atol=1e-6,
            err_msg="iter %d running_conf" % it)

        # --- pseudo labels ----------------------------------------------
        ours_pl = np.asarray(mets["pseudo"])
        ref_pl = outs_t["teacher_labels"].numpy()
        mismatch = np.mean(ours_pl != ref_pl)
        assert mismatch < 0.01, \
            "iter %d pseudo-label mismatch %.4f" % (it, mismatch)
        # and the labels must not be degenerate (all-ignore)
        assert np.mean(ref_pl != 255) > 0.05, "test batch has no coverage"

        # --- gradients on sampled tensors -------------------------------
        for tkey in keys:
            coll, path, kind = kmap[tkey]
            g_j = _lookup(mets["grads"], path)
            g_t = dict(ref.backbone.named_parameters())[tkey].grad
            g_t = g_t.detach().numpy()
            if kind == "conv":
                g_t = g_t.transpose(2, 3, 1, 0)
            denom = np.linalg.norm(g_t) + 1e-12
            rel = np.linalg.norm(g_j - g_t) / denom
            assert rel < 2e-2, "iter %d grad %s rel err %.4f" % (
                it, tkey, rel)

        opt.step()

    # --- parameter trajectories after 3 optimizer steps ------------------
    ref_student = ref.backbone.state_dict()
    ref_teacher = ref.slow_net.state_dict()
    for tkey in keys:
        coll, path, kind = kmap[tkey]
        for tree, sd, tag in ((state.params, ref_student, "student"),
                              (state.teacher_params, ref_teacher,
                               "teacher")):
            ours_p = _lookup(tree, path)
            ref_p = sd[tkey].detach().numpy()
            if kind == "conv":
                ref_p = ref_p.transpose(2, 3, 1, 0)
            np.testing.assert_allclose(
                ours_p, ref_p, rtol=1e-3, atol=1e-5,
                err_msg="%s trajectory %s" % (tag, tkey))


def test_sac_module_parity_vgg16():
    _run_parity("deeplabv2_vgg16_bn")


def test_sac_module_parity_fcn():
    _run_parity("fcn_vgg16_bn")


def test_sac_module_parity_resnet101():
    _run_parity("deeplabv2_resnet101")


def test_sac_module_parity_minentropy_focal_ce():
    """The non-default algorithm branches against the reference module:
    CONF_POOL=minentropy_pool (sac.py:218-236) and LOSS=focal_ce (the
    variant WITHOUT the confidence broadcast, sac.py:119-132)."""
    _run_parity("deeplabv2_vgg16_bn",
                overrides={"CONF_POOL": "minentropy_pool",
                           "LOSS": "focal_ce"}, iters=2)


def test_sac_module_parity_pool_off():
    """CONF_POOL_ON=False: the reference skips the warp/pool fusion and
    thresholds the per-view teacher probabilities directly (sac.py:285-287)."""
    _run_parity("deeplabv2_vgg16_bn",
                overrides={"CONF_POOL_ON": False}, iters=2)
