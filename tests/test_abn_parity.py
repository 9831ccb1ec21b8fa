"""ABN-mode TRAJECTORY parity against the reference's baseline path.

The ABN stage produces every starting checkpoint of the reference's
three-stage recipe, yet was previously covered only by mechanics tests.
This runs our ``make_abn_frames_step`` side by side with a literal torch
mirror of the reference baseline iteration (train.py:273-289 with
MODEL.BASELINE=True: live-BN source forward -> ``loss_ce.mean().backward()``
-> immediate ``optim.step()`` (train.py:129-138), then a no-grad TRAIN-mode
target forward that refreshes only BN statistics (train.py:281-289)) from
identical weights, built with ``freeze_bn=False`` exactly as
models/__init__.py:29 sets for BASELINE mode.

Inputs are normalized on each side independently with the RENORM_SOURCE
statistics — ours via aug.pipelines.renorm_stats, torch's via a literal
transcription of dataloader_seg.py:96-107 — so the renormalisation
semantics are part of the asserted trajectory.

Asserted per iteration: source CE and the (discarded-for-grad) target CE.
After the horizon: BN running mean/var trajectories on sampled layers
(momentum + unbiased-variance conventions — exactly the silent-drift
surface VERDICT r4 flagged), and parameter trajectories.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dasac_tpu.aug.pipelines import renorm_stats
from dasac_tpu.core.state import TrainState
from dasac_tpu.nn import convert
from dasac_tpu.nn.factory import build_model
from dasac_tpu.train import steps

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tests.test_fullnet_torch_parity import (_randomize,  # noqa: E402
                                             _ref_modules)

C = 19
H = W = 64
B_SRC = 2
B_TGT = 2
LR = 0.01
ITERS = 20

# GTA->Cityscapes renorm statistics (core/config.py DATASET defaults)
MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
SRC_MEAN, SRC_STD = (0.4422, 0.4379, 0.4246), (0.2572, 0.2516, 0.2467)
TGT_MEAN, TGT_STD = (0.2870, 0.3251, 0.2838), (0.1756, 0.1805, 0.1772)


def _ref_renorm_stats():
    """Literal transcription of dataloader_seg.py:96-107."""
    mean = np.array(MEAN)
    std = np.array(STD)
    mean_src = np.array(SRC_MEAN)
    mean_tgt = np.array(TGT_MEAN)
    stdv_src = np.array(SRC_STD)
    stdv_tgt = np.array(TGT_STD)
    new_mean = tuple(mean_src - stdv_src / stdv_tgt * (mean_tgt - mean))
    new_std = tuple(stdv_src * std / stdv_tgt)
    return new_mean, new_std


def _build_ref_abn(arch):
    """Reference backbone in BASELINE mode: freeze_bn=False
    (models/__init__.py:29), train() throughout (train.py:264), dropout
    disabled for determinism.  SAC_Baseline.forward is a plain
    ``backbone(x, y)`` passthrough (models/sac.py:15-38), so the backbone
    is driven directly."""
    ref_dl, ref_fcn = _ref_modules()
    crit = tnn.CrossEntropyLoss(ignore_index=255, reduction="none")
    if arch == "deeplabv2_resnet101":
        net = ref_dl.DeepLabV2_ResNet101(C, criterion=crit, freeze_bn=False)
    elif arch == "deeplabv2_vgg16_bn":
        net = ref_dl.DeepLabV2_VGG16(C, criterion=crit, use_bn=True,
                                     freeze_bn=False)
    else:
        raise ValueError(arch)
    net = _randomize(net, seed=hash(arch) % 1000 + 17)
    net.train()
    for m in net.modules():
        if isinstance(m, (tnn.Dropout, tnn.Dropout2d)):
            m.eval()
    return net


def _bn_stat_keys(arch, state_dict, n=4):
    """Sampled torch running_mean/running_var keys spread over the net
    (key_map enumerates template paths like every block's downsample_bn;
    restrict to keys the real module actually has)."""
    kmap = convert.key_map(arch, "reference")
    means = sorted(k for k, v in kmap.items()
                   if v[0] == "batch_stats" and v[1][-1] == "mean"
                   and k in state_dict)
    idx = np.linspace(0, len(means) - 1, n).astype(int)
    picked = [means[i] for i in idx]
    return picked + [k.replace("running_mean", "running_var")
                     for k in picked]


def _lookup(tree, path):
    for p in path:
        tree = tree[p]
    return np.asarray(tree)


def _frames(rng, n, shift=0.0, gain=1.0):
    """Raw uint8 batches with an optional target-domain color shift."""
    base = rng.randint(0, 256, (n, H, W, 3)).astype(np.float32)
    out = np.clip(base * gain + shift * 255.0, 0, 255).astype(np.uint8)
    lbl = rng.randint(0, C, (n, H, W)).astype(np.int32)
    lbl[:, :4] = 255
    return out, lbl


@pytest.mark.parametrize("arch", ["deeplabv2_resnet101"])
def test_abn_trajectory_parity(arch):
    ref = _build_ref_abn(arch)
    model = build_model(arch, C)
    tx = optax.sgd(LR)

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, H, W, 3)), train=False,
                           update_stats=False)
    variables, _, skipped = convert.apply_state_dict(
        dict(variables), ref.state_dict(), arch, "reference")
    assert not [k for k in skipped if not k.endswith("num_batches_tracked")]

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

    scfg = steps.StepConfig(num_classes=C, crop_hw=(H, W))
    step = jax.jit(steps.make_abn_frames_step(model, tx, scfg),
                   donate_argnums=(0,))
    opt = torch.optim.SGD(ref.parameters(), lr=LR)

    # the two independently computed renorm statistics must agree...
    r_mean, r_std = renorm_stats(MEAN, STD, SRC_MEAN, SRC_STD,
                                 TGT_MEAN, TGT_STD)
    ref_mean, ref_std = _ref_renorm_stats()
    np.testing.assert_allclose(r_mean, ref_mean, rtol=1e-12)
    np.testing.assert_allclose(r_std, ref_std, rtol=1e-12)
    r_mean = np.asarray(r_mean, np.float32)
    r_std = np.asarray(r_std, np.float32)
    t_mean = np.asarray(MEAN, np.float32)
    t_std = np.asarray(STD, np.float32)

    draw = np.random.RandomState(7)
    rec = {"src_ce": [], "tgt_ce": []}
    for it in range(ITERS):
        # fresh batches every iteration; target carries a domain shift so
        # its BN statistics genuinely differ from the source's
        src_u8, src_y = _frames(draw, B_SRC)
        tgt_u8, tgt_y = _frames(draw, B_TGT, shift=0.15, gain=0.7)
        # ...and are applied on each side from its own formula
        src_x = (src_u8.astype(np.float32) / 255.0 - r_mean) / r_std
        tgt_x = (tgt_u8.astype(np.float32) / 255.0 - t_mean) / t_std

        state, mets = step(state, jnp.asarray(src_x), jnp.asarray(src_y),
                           jnp.asarray(tgt_x), jnp.asarray(tgt_y),
                           jax.random.PRNGKey(100 + it))

        # torch mirror: train.py:273-289 (BASELINE branch)
        opt.zero_grad()
        losses_s, _ = ref(torch.from_numpy(src_x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(src_y.astype(np.int64)))
        losses_s["loss_ce"].mean().backward()
        opt.step()
        with torch.no_grad():
            losses_t, _ = ref(torch.from_numpy(tgt_x.transpose(0, 3, 1, 2)),
                              torch.from_numpy(tgt_y.astype(np.int64)))

        rec["src_ce"].append((float(mets["src_loss_ce"]),
                              float(losses_s["loss_ce"].mean().detach())))
        rec["tgt_ce"].append((float(mets["loss_ce"]),
                              float(losses_t["loss_ce"].mean())))

    src = np.asarray(rec["src_ce"])
    tgt = np.asarray(rec["tgt_ce"])
    assert np.max(np.abs(src[:, 0] - src[:, 1])) < 2e-2, rec["src_ce"]
    assert np.max(np.abs(tgt[:, 0] - tgt[:, 1])) < 2e-2, rec["tgt_ce"]

    # BN running statistics: the trajectory folds in ITERS live updates from
    # BOTH passes (source batch-stats then target stats-only refresh) —
    # momentum or unbiased-variance drift compounds and would blow these
    kmap = convert.key_map(arch, "reference")
    ref_sd = ref.state_dict()
    for tkey in _bn_stat_keys(arch, ref_sd):
        _, path, _ = kmap[tkey]
        ours = _lookup(state.batch_stats, path)
        theirs = ref_sd[tkey].detach().numpy()
        rel = (np.linalg.norm(ours - theirs)
               / (np.linalg.norm(theirs) + 1e-12))
        assert rel < 1e-2, ("BN stat trajectory %s rel %.5f" % (tkey, rel))

    # parameter trajectories (live-BN gradients differ from the frozen-BN
    # SAC path, so this is not redundant with test_sac_module_parity)
    from tests.test_sac_module_parity import _sample_keys
    for tkey in _sample_keys(arch):
        _, path, kind = kmap[tkey]
        ours_p = _lookup(state.params, path)
        ref_p = ref_sd[tkey].detach().numpy()
        if kind == "conv":
            ref_p = ref_p.transpose(2, 3, 1, 0)
        rel = (np.linalg.norm(ours_p - ref_p)
               / (np.linalg.norm(ref_p) + 1e-12))
        assert rel < 1e-2, ("param trajectory %s rel %.5f" % (tkey, rel))
