"""LONG-HORIZON training-trajectory parity against the reference's own
``models/sac.py`` (gated: ``DASAC_LONG_PARITY=1``, ~30-60 min on one core).

tests/test_sac_module_parity.py proves 3 iterations (teacher lazy init + two
EMA updates); the reference's correctness regime was hundreds of epochs.
This run retires the remaining slow-drift risk — running_conf saturation ×
focal weights × EMA interplay (reference models/sac.py:85-117,131-149) — by
running the reference's real torch ``SAC`` side by side with our compiled
views-step for ``DASAC_LONG_ITERS`` (default 120) iterations on a LEARNABLE
synthetic task (the color-shift domain gap of
tests/test_adaptation_improves.py, scaled to r101):

  * identical weights at init (state_dict through nn/convert);
  * FRESH pre-augmented views + source batches from OUR pipeline every
    iteration, fed to both sides (per-iteration PRNG keys);
  * teacher EMA every NET_MOMENTUM_ITER=5 steps -> ~24 EMA cycles;
    STAT_MOMENTUM=0.95 -> running_conf reaches saturation mid-run;
  * per iteration the torch side mirrors the reference trainer exactly
    (train.py:119-251).

Asserted over the FULL horizon (bounds = observed maxima with margin,
recorded in PARITY.md): source CE and self_ce trajectories, running_conf,
pseudo-label agreement, parameter trajectories on sampled tensors, and the
target-mIoU trajectory measured every 10 iterations on a held-out target
batch through both stacks.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dasac_tpu.aug import pipelines
from dasac_tpu.core.state import TrainState
from dasac_tpu.nn import convert
from dasac_tpu.nn.factory import build_model
from dasac_tpu.train import steps
from dasac_tpu.train.metrics import confusion_matrix, mean_iou

torch = pytest.importorskip("torch")

from tests.test_sac_module_parity import (_build_ref_sac,  # noqa: E402
                                          _build_ours, _lookup,
                                          _sample_keys, _to_t)

pytestmark = pytest.mark.skipif(
    os.environ.get("DASAC_LONG_PARITY") != "1",
    reason="long-horizon torch-trajectory parity (~30-60 min, one core); "
           "set DASAC_LONG_PARITY=1 to run")

C = 19
H = W = 64
T = 3           # GROUP_SIZE
G = 2           # NUM_GROUPS
B_SRC = 2
LR = float(os.environ.get("DASAC_LONG_LR", "0.01"))
LR_TARGET = 0.1
ITERS = int(os.environ.get("DASAC_LONG_ITERS", "120"))
EVAL_EVERY = 10
MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

# long-horizon hyperparameters: EMA every 5 steps (24 cycles over the run),
# prior EMA 0.95 (saturates mid-run).  RUN_CONF_LOWER=0.1 (the reference's
# VGG setting) gates the early random-teacher noise: from random init the
# teacher's ~1/19 confidences stay under the floor, so the run begins
# source-only (the reference always seeds SAC from a trained ABN baseline)
# and the target branch goes live as confidence grows.
HP = dict(
    THRESHOLD_BETA=1e-3, NET_MOMENTUM=0.9, STAT_MOMENTUM=0.95,
    RUN_CONF_UPPER=0.75, RUN_CONF_LOWER=0.1,
    CONF_POOL="avg_pool", LOSS="focal_ce_conf", CONF_POOL_ON=True,
    CONF_DISCOUNT=True, FOCAL_P=3, LR_TARGET=LR_TARGET, BASELINE=False,
)
NMI = 5  # NET_MOMENTUM_ITER


def _scene_pool(rng, colors, class_ids, n):
    """Blob scenes whose colors map 1:1 to class ids (learnable task)."""
    imgs, lbls = [], []
    for _ in range(n):
        m = np.zeros((H, W), np.uint8)
        m[:] = rng.randint(0, len(class_ids))
        for _ in range(5):
            k = rng.randint(0, len(class_ids))
            y, x = rng.randint(0, H - 12), rng.randint(0, W - 16)
            m[y:y + rng.randint(8, 20), x:x + rng.randint(10, 24)] = k
        img = colors[m] + rng.randn(H, W, 3) * 12
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
        lbls.append(np.asarray(class_ids, np.uint8)[m])
    return np.stack(imgs), np.stack(lbls)


def _run_long(arch, iters, max_pl_mismatch=0.03, max_src_ce_d=0.05):
    rng = np.random.RandomState(0)
    class_ids = [0, 3, 5, 8, 11, 16]
    src_colors = np.array([[200, 50, 50], [50, 200, 50], [50, 50, 200],
                           [200, 200, 50], [120, 120, 120], [30, 160, 200]],
                          float)
    tgt_colors = np.clip(src_colors * 0.6 + np.array([70, 25, -15]), 0, 255)
    src_i, src_l = _scene_pool(rng, src_colors, class_ids, 24)
    tgt_i, tgt_l = _scene_pool(rng, tgt_colors, class_ids, 16)
    ev_i, ev_l = _scene_pool(rng, tgt_colors, class_ids, 8)  # held-out

    # ---- both stacks from identical weights ------------------------------
    ref = _build_ref_sac(arch, overrides=HP)
    model = _build_ours(arch)
    tx = optax.sgd(LR)

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, H, W, 3)), train=False,
                           update_stats=False)
    variables, _, skipped = convert.apply_state_dict(
        dict(variables), ref.backbone.state_dict(), arch, "reference")
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

    scfg = steps.StepConfig(
        num_classes=C, crop_hw=(H, W), group_size=T, lr_target=LR_TARGET,
        net_momentum=HP["NET_MOMENTUM"], net_momentum_iter=NMI,
        stat_momentum=HP["STAT_MOMENTUM"],
        threshold_beta=HP["THRESHOLD_BETA"],
        conf_discount=HP["CONF_DISCOUNT"], pool=HP["CONF_POOL"],
        pool_on=HP["CONF_POOL_ON"], focal_p=HP["FOCAL_P"],
        use_conf_loss=True, run_conf_upper=HP["RUN_CONF_UPPER"],
        run_conf_lower=HP["RUN_CONF_LOWER"])
    step = steps.make_sac_views_step(model, tx, scfg, debug="light")
    step = jax.jit(step, donate_argnums=(0,))

    opt = torch.optim.SGD(ref.backbone.parameters(), lr=LR)
    keys = _sample_keys(arch)
    kmap = convert.key_map(arch, "reference")

    # ---- held-out target eval through BOTH stacks ------------------------
    ev_x = ((ev_i.astype(np.float32) / 255.0) - MEAN) / STD
    ev_x_t = _to_t(ev_x.transpose(0, 3, 1, 2).astype(np.float32))
    ev_l32 = jnp.asarray(ev_l.astype(np.int32))

    @jax.jit
    def eval_ours(params, bstats):
        _, up = model.apply({"params": params, "batch_stats": bstats},
                            jnp.asarray(ev_x, jnp.float32),
                            train=False, update_stats=False)
        return confusion_matrix(jnp.argmax(up, -1), ev_l32, C)

    def eval_ref():
        with torch.no_grad():
            _, up = ref.backbone(ev_x_t)
        pred = jnp.asarray(up.argmax(1).numpy())
        return confusion_matrix(pred, ev_l32, C)

    # ---- the horizon ------------------------------------------------------
    draw = np.random.RandomState(123)
    rec = {"src_ce": [], "self_ce": [], "rc": [], "pl": [],
           "cover": [], "miou": []}
    for it in range(iters):
        si = draw.choice(len(src_i), B_SRC, replace=False)
        ti = draw.choice(len(tgt_i), G, replace=False)
        k_it = jax.random.PRNGKey(1000 + it)
        k_src, k_tgt = jax.random.split(k_it)

        src_frames, src_lbls = pipelines.augment_source_batch(
            k_src, jnp.asarray(src_i[si]), jnp.asarray(src_l[si]),
            crop_hw=(H, W), scale_range=(0.8, 1.0), hflip=True,
            jitter=0.0, blur=False, mean=MEAN, std=STD)
        views = pipelines.augment_target_groups(
            k_tgt, jnp.asarray(tgt_i[ti]), jnp.asarray(tgt_l[ti]),
            group_size=T, target_scale=(1.0, 1.1), zoom=(0.6, 1.0),
            group_hflip=True, guided_hflip=True, blur=True, jitter=0.3,
            greyscale=0.1, mean=MEAN, std=STD)
        views_np = jax.tree.map(np.asarray, views)

        state, mets = step(state, src_frames, src_lbls, views,
                           jax.random.PRNGKey(7))

        # torch side: the reference trainer's exact order (train.py:119-251)
        y_t = views_np.labels.astype(np.int64)
        y_t[views_np.padding] = -1
        upd = (it % NMI == 0)
        opt.zero_grad()
        losses_s, _ = ref(_to_t(np.asarray(src_frames).transpose(0, 3, 1, 2)),
                          _to_t(np.asarray(src_lbls).astype(np.int64)))
        losses_s["loss_ce"].mean().backward()
        losses_t, outs_t = ref(
            _to_t(views_np.frames_aug.transpose(0, 3, 1, 2)),
            _to_t(y_t),
            _to_t(views_np.frames_clean.transpose(0, 3, 1, 2)),
            _to_t(views_np.affine), _to_t(views_np.affine_inv),
            use_teacher=True, update_teacher=upd, T=T)
        (LR_TARGET * losses_t["self_ce"].mean()).backward()
        opt.step()

        # ---- per-iteration divergence records ----------------------------
        ce_r = float(losses_s["loss_ce"].mean())
        se_r = float(losses_t["self_ce"].mean())
        rc_r = ref.running_conf.detach().numpy()
        pl_r = outs_t["teacher_labels"].numpy()
        pl_o = np.asarray(mets["pseudo"])
        rec["src_ce"].append((float(mets["src_loss_ce"]), ce_r))
        rec["self_ce"].append((float(mets["self_ce"]), se_r))
        rec["rc"].append(float(np.max(np.abs(
            np.asarray(mets["running_conf"]) - rc_r))))
        rec["pl"].append(float(np.mean(pl_o != pl_r)))
        rec["cover"].append((float(mets["pseudo_cover"]),
                             float(np.mean(pl_r != 255))))

        if (it + 1) % EVAL_EVERY == 0 or it + 1 == iters:
            m_o = mean_iou(np.asarray(eval_ours(state.params,
                                                state.batch_stats)))
            m_r = mean_iou(np.asarray(eval_ref()))
            rec["miou"].append((it + 1, float(m_o), float(m_r)))

    # ---- summary (PARITY.md source of record) -----------------------------
    src = np.asarray(rec["src_ce"])
    sce = np.asarray(rec["self_ce"])
    live = np.asarray([r for r, (o, rr) in zip(
        np.abs(sce[:, 0] - sce[:, 1]), rec["cover"]) if rr > 0.01])
    summary = {
        "arch": arch, "iters": iters, "ema_updates": iters // NMI,
        "max_abs_d_src_ce": float(np.max(np.abs(src[:, 0] - src[:, 1]))),
        "max_abs_d_self_ce": float(live.max()) if live.size else 0.0,
        "max_abs_d_running_conf": float(np.max(rec["rc"])),
        "max_pseudo_mismatch": float(np.max(rec["pl"])),
        "final_cover": rec["cover"][-1],
        # running_conf is a probability-mass vector (sums to ~1, mean is
        # always ~1/C); its MAX shows the prior concentrating on the
        # classes actually present
        "final_running_conf_max": float(
            np.max(np.asarray(mets["running_conf"]))),
        "miou_trajectory": rec["miou"],
        "max_abs_d_miou": float(np.max([abs(o - r)
                                        for _, o, r in rec["miou"]])),
        "src_ce_first_last": [rec["src_ce"][0][1], rec["src_ce"][-1][1]],
    }
    print("LONG_PARITY_SUMMARY " + json.dumps(summary))

    # ---- the task really exercised the algorithm --------------------------
    assert rec["src_ce"][-1][1] < 0.5 * rec["src_ce"][0][1], (
        "source training did not converge", summary)
    assert rec["cover"][-1][1] > 0.3, ("pseudo-labels never went live",
                                       summary)
    # prior saturated onto the ~6 classes present (uniform over 19 = 0.053)
    assert summary["final_running_conf_max"] > 0.12, summary

    # ---- bounded divergence over the horizon ------------------------------
    # bounds = observed maxima with ~3x margin (see PARITY.md long-horizon
    # row for the measured values)
    assert summary["max_abs_d_src_ce"] < max_src_ce_d, summary
    assert summary["max_abs_d_self_ce"] < 0.10, summary
    assert summary["max_abs_d_running_conf"] < 0.05, summary
    assert summary["max_pseudo_mismatch"] < max_pl_mismatch, summary
    assert summary["max_abs_d_miou"] < 0.05, summary

    # ---- student + teacher parameter trajectories after the full run ------
    ref_student = ref.backbone.state_dict()
    ref_teacher = ref.slow_net.state_dict()
    for tkey in keys:
        _, path, kind = kmap[tkey]
        for tree, sd, tag in ((state.params, ref_student, "student"),
                              (state.teacher_params, ref_teacher,
                               "teacher")):
            ours_p = _lookup(tree, path)
            ref_p = sd[tkey].detach().numpy()
            if kind == "conv":
                ref_p = ref_p.transpose(2, 3, 1, 0)
            rel = (np.linalg.norm(ours_p - ref_p)
                   / (np.linalg.norm(ref_p) + 1e-12))
            assert rel < 5e-2, ("%s trajectory %s rel %.4f"
                                % (tag, tkey, rel), summary)


def test_long_horizon_trajectory_parity_resnet101():
    _run_long("deeplabv2_resnet101", ITERS)


def test_long_horizon_trajectory_parity_vgg16():
    """The VGG heads and freeze-BN wiring differ enough from r101 that the
    r101 run does not exclude drift there (reference deeplabv2.py:229-312);
    a shorter horizon suffices — 12 EMA cycles."""
    _run_long("deeplabv2_vgg16_bn", min(60, ITERS))


def test_long_horizon_trajectory_parity_fcn():
    """FCN8s adds the skip-fusion path (reference models/fcn.py:10-149).
    Its extra bilinear stages put more teacher-confidence mass at the
    pseudo-label thresholds, so more pixels flip discretely on f32 noise
    (observed max 3.7% at iter-max while self_ce delta stayed 0.0044 and
    the paired mIoU delta 0.003 — discretization, not drift); the
    label-mismatch bound is widened accordingly.  The source-CE bound is
    also arch-widened: FCN trains from scratch at high effective LR on the
    fused-skip head, so the same f32 noise moves its absolute CE more
    (observed max 0.036 and 0.050 across two runs — torch BLAS
    thread-scheduling nondeterminism shifts the trajectory run to run —
    while the paired mIoU delta stayed <= 0.003 and parameter
    trajectories < 5e-2 rel); bound = 3x the worst observed run."""
    _run_long("fcn_vgg16_bn", min(60, ITERS), max_pl_mismatch=0.055,
              max_src_ce_d=0.15)
