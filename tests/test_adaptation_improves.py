"""Algorithm-level integration test: SAC self-training improves target-domain
mIoU on a synthetic source->target color shift (the end-metric validation the
reference relied on, SURVEY.md §4, shrunk to a CPU-sized problem).

Deterministic seeds; the margin is well below the observed gain (+0.076)."""

import jax
import jax.numpy as jnp
import numpy as np

from dasac_tpu.core.state import create_train_state
from dasac_tpu.nn.factory import build_model
from dasac_tpu.train import optim, steps
from dasac_tpu.train.metrics import mean_iou

C, HW = 5, (32, 48)


class _MC:
    LR = 3e-3
    WEIGHT_DECAY = 1e-4
    OPT = "SGD"
    OPT_NESTEROV = False
    MOMENTUM = 0.9
    BETA1 = 0.5


def _scene(rng, colors, n):
    imgs, lbls = [], []
    for _ in range(n):
        m = np.zeros(HW, np.uint8)
        m[:] = rng.randint(0, C)
        for _ in range(4):
            k = rng.randint(0, C)
            y, x = rng.randint(0, HW[0] - 8), rng.randint(0, HW[1] - 12)
            m[y:y + rng.randint(6, 14), x:x + rng.randint(8, 18)] = k
        img = colors[m] + rng.randn(*HW, 3) * 18
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
        lbls.append(m)
    return np.stack(imgs), np.stack(lbls)


def test_sac_adaptation_improves_target_miou():
    rng = np.random.RandomState(0)
    src_colors = np.array([[200, 50, 50], [50, 200, 50], [50, 50, 200],
                           [200, 200, 50], [120, 120, 120]], float)
    tgt_colors = np.clip(src_colors * 0.55 + np.array([80, 30, -20]), 0, 255)
    src_i, src_l = _scene(rng, src_colors, 16)
    tgt_i, tgt_l = _scene(rng, tgt_colors, 16)

    model = build_model("tiny", C)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, *HW, 3)),
                   train=False, update_stats=False)
    tx, _ = optim.build_optimizer(_MC, "tiny", v["params"])
    state = create_train_state(model, tx, C, (*HW, 3))

    base = dict(num_classes=C, crop_hw=HW, group_size=4,
                src_scale=(0.9, 1.0), src_hflip=True)
    scfg0 = steps.StepConfig(lr_target=0.0, net_momentum_iter=10**6, **base)
    step0 = jax.jit(steps.make_sac_step(model, tx, scfg0), donate_argnums=(0,))
    ev = jax.jit(steps.make_eval_step(model, scfg0))

    def batch(i):
        s = rng.randint(0, 12)
        return (jnp.asarray(src_i[s:s + 4]), jnp.asarray(src_l[s:s + 4]),
                jnp.asarray(tgt_i[s:s + 2]), jnp.asarray(tgt_l[s:s + 2]))

    # phase 1: source-only pretraining (lr_target = 0)
    for i in range(80):
        state, _ = step0(state, batch(i), jax.random.PRNGKey(9))
    miou_src = mean_iou(np.asarray(
        ev(state, jnp.asarray(src_i), jnp.asarray(src_l.astype(np.int32)))))
    miou_before = mean_iou(np.asarray(
        ev(state, jnp.asarray(tgt_i), jnp.asarray(tgt_l.astype(np.int32)))))
    assert miou_src > 0.45, "source training failed: {}".format(miou_src)
    assert miou_before < miou_src - 0.15, "no domain gap to adapt across"

    # phase 2: SAC adaptation.  The exact reference loss semantics (batch-
    # mean confidence weighting, active dropout in the student) adapt more
    # slowly on this tiny problem than an idealized variant, hence the
    # longer schedule and modest margin.
    scfg1 = steps.StepConfig(lr_target=2.0, net_momentum=0.9,
                             net_momentum_iter=5, run_conf_lower=0.1,
                             zoom=(0.7, 1.0), tgt_blur=True, tgt_jitter=0.3,
                             tgt_greyscale=0.0, **base)
    step1 = jax.jit(steps.make_sac_step(model, tx, scfg1), donate_argnums=(0,))
    state = state.replace(slow_init=jnp.zeros(()),
                          step=jnp.zeros((), jnp.int32))
    for i in range(400):
        state, _ = step1(state, batch(i), jax.random.PRNGKey(5))
    miou_after = mean_iou(np.asarray(
        ev(state, jnp.asarray(tgt_i), jnp.asarray(tgt_l.astype(np.int32)))))

    assert miou_after > miou_before + 0.02, (
        "SAC did not improve target mIoU: {:.3f} -> {:.3f}".format(
            miou_before, miou_after))
