"""Train-step tests: SAC and ABN iterations end-to-end on a tiny model,
single-device and on the simulated 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasac_tpu.core.mesh import make_mesh
from dasac_tpu.core.state import create_train_state
from dasac_tpu.train import optim, steps
from dasac_tpu.train.metrics import summarise
from tests.tiny_model import TinySeg

C = 5
HW = (32, 32)


class _FakeModelCfg:
    LR = 1e-3
    WEIGHT_DECAY = 5e-4
    OPT = "SGD"
    OPT_NESTEROV = False
    MOMENTUM = 0.9
    BETA1 = 0.5


def _setup(axis_name=None, **scfg_kw):
    model = TinySeg(num_classes=C, axis_name=axis_name)
    sample = jnp.zeros((1, *HW, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, sample,
                           train=False, update_stats=False)
    tx, _ = optim.build_optimizer(_FakeModelCfg, "deeplabv2_resnet101",
                                  variables["params"])
    state = create_train_state(model, tx, C, (*HW, 3))
    defaults = dict(num_classes=C, crop_hw=HW, group_size=2,
                    net_momentum_iter=3, zoom=(0.5, 1.0),
                    tgt_jitter=0.4, tgt_greyscale=0.2)
    defaults.update(scfg_kw)
    scfg = steps.StepConfig(**defaults)
    return model, tx, state, scfg


def _batch(n_src=2, n_grp=2, hw=HW, seed=0):
    rng = np.random.RandomState(seed)
    src_img = (rng.rand(n_src, *hw, 3) * 255).astype(np.uint8)
    src_lbl = rng.randint(0, C, (n_src, *hw)).astype(np.uint8)
    tgt_img = (rng.rand(n_grp, *hw, 3) * 255).astype(np.uint8)
    tgt_lbl = rng.randint(0, C, (n_grp, *hw)).astype(np.uint8)
    return (jnp.asarray(src_img), jnp.asarray(src_lbl),
            jnp.asarray(tgt_img), jnp.asarray(tgt_lbl))


def test_sac_step_first_iteration_initializes_teacher():
    model, tx, state, scfg = _setup()
    step = jax.jit(steps.make_sac_step(model, tx, scfg))
    batch = _batch()
    old_params = jax.tree.map(np.asarray, state.params)

    state1, metrics = step(state, batch, jax.random.PRNGKey(42))
    assert int(state1.step) == 1
    assert float(state1.slow_init) == 1.0
    # teacher == the pre-update student (wholesale copy at init)
    for t, s in zip(jax.tree.leaves(state1.teacher_params),
                    jax.tree.leaves(old_params)):
        np.testing.assert_array_equal(np.asarray(t), s)
    # student params moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state1.params),
                        jax.tree.leaves(old_params)))
    assert moved
    for k in ("src_loss_ce", "self_ce", "teacher_diff", "pseudo_cover"):
        assert np.isfinite(float(metrics[k])), k
    # running_conf was reset to beta then EMA'd with the first batch
    rc = np.asarray(state1.running_conf)
    assert (rc > 0).all() and (rc < 1).all()


def test_sac_step_teacher_update_interval():
    model, tx, state, scfg = _setup()  # net_momentum_iter=3
    step = jax.jit(steps.make_sac_step(model, tx, scfg))
    batch = _batch()
    key = jax.random.PRNGKey(0)

    state, _ = step(state, batch, key)        # step 0: init copy
    t_after_init = jax.tree.map(np.asarray, state.teacher_params)
    state, _ = step(state, batch, key)        # step 1: no update
    state, _ = step(state, batch, key)        # step 2: no update
    for a, b in zip(jax.tree.leaves(state.teacher_params),
                    jax.tree.leaves(t_after_init)):
        np.testing.assert_array_equal(np.asarray(a), b)
    state, _ = step(state, batch, key)        # step 3: EMA update
    changed = any(
        not np.array_equal(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(state.teacher_params),
                        jax.tree.leaves(t_after_init)))
    assert changed
    # frozen BN: student batch_stats never move in SAC mode
    init_stats = create_train_state(model, tx, C, (*HW, 3)).batch_stats
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(init_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sac_step_target_only():
    model, tx, state, scfg = _setup(target_only=True, lr_target=2.0)
    step = jax.jit(steps.make_sac_step(model, tx, scfg))
    state1, metrics = step(state, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["self_ce"]))


def test_abn_step_updates_bn_stats_and_params():
    model, tx, state, scfg = _setup()
    step = jax.jit(steps.make_abn_step(model, tx, scfg))
    old_stats = jax.tree.map(np.asarray, state.batch_stats)
    old_params = jax.tree.map(np.asarray, state.params)
    state1, metrics = step(state, _batch(), jax.random.PRNGKey(2))
    stats_moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(state1.batch_stats),
                        jax.tree.leaves(old_stats)))
    params_moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(state1.params),
                        jax.tree.leaves(old_params)))
    assert stats_moved and params_moved
    assert np.isfinite(float(metrics["src_loss_ce"]))
    # teacher untouched in baseline mode
    for a, b in zip(jax.tree.leaves(state1.teacher_params),
                    jax.tree.leaves(state.teacher_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_sac_step_runs_on_mesh():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    model, tx, state, scfg = _setup(axis_name="data")
    per_shard = steps.make_sac_step(model, tx, scfg, axis_name="data")
    step = steps.shard_train_step(per_shard, mesh)
    # 8 source images + 8 groups: one of each per device
    batch = _batch(n_src=8, n_grp=8)
    state1, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert int(state1.step) == 1
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # second step exercises the donated-buffer path
    state2, _ = step(state1, batch, jax.random.PRNGKey(4))
    assert int(state2.step) == 2
    assert np.isfinite(
        np.asarray(jax.tree.leaves(state2.params)[0])).all()


def test_eval_step_perfect_prediction():
    model, tx, state, scfg = _setup()
    ev = jax.jit(steps.make_eval_step(model, scfg))
    imgs = (np.random.RandomState(0).rand(2, *HW, 3) * 255).astype(np.uint8)
    conf = ev(state, jnp.asarray(imgs), jnp.full((2, *HW), 255, jnp.int32))
    assert float(jnp.sum(conf)) == 0.0  # all ignored

    # use the model's own predictions as labels -> diagonal confusion
    from dasac_tpu.aug import photometric as P
    x = P.normalize(jnp.asarray(imgs, jnp.float32) / 255.0, scfg.mean, scfg.std)
    _, up = model.apply({"params": state.params,
                         "batch_stats": state.batch_stats},
                        x, train=False, update_stats=False)
    pred = np.asarray(jnp.argmax(up, -1))
    conf = np.asarray(ev(state, jnp.asarray(imgs), jnp.asarray(pred)))
    assert conf.sum() == pred.size
    assert np.allclose(conf.sum() - np.trace(conf), 0)
    iou, pr, re = summarise(conf)
    present = np.unique(pred)
    assert all(iou[c] == 1.0 for c in present)


def test_target_eval_step_layers():
    model, tx, state, scfg = _setup()
    ev = jax.jit(steps.make_target_eval_step(model, scfg))
    _, _, tgt_img, tgt_lbl = _batch()
    confs = ev(state, tgt_img, tgt_lbl, jax.random.PRNGKey(5))
    assert set(confs) == {"logits_up", "teacher_init", "teacher_refined",
                          "teacher_labels"}
    for k, v in confs.items():
        assert v.shape == (C, C)
        assert np.isfinite(np.asarray(v)).all()


def test_target_eval_step_uses_training_refine_modes():
    """With the shipped stride8/bf16 defaults, teacher_refined /
    teacher_labels must measure the refine chain training actually uses —
    not the reference-exact full-res f32 variant."""
    model, tx, state, scfg = _setup()
    scfg = scfg._replace(refine_res="stride8", refine_dtype="bfloat16")
    ev = jax.jit(steps.make_target_eval_step(model, scfg))
    _, _, tgt_img, tgt_lbl = _batch()
    confs = ev(state, tgt_img, tgt_lbl, jax.random.PRNGKey(5))
    for k, v in confs.items():
        assert v.shape == (C, C)
        assert np.isfinite(np.asarray(v)).all()
    # pixel budget identical to the full-res path: confusions are computed
    # at full resolution after the final upsample
    full = jax.jit(steps.make_target_eval_step(model, scfg._replace(
        refine_res="full", refine_dtype="float32")))(
        state, tgt_img, tgt_lbl, jax.random.PRNGKey(5))
    assert int(np.asarray(confs["teacher_refined"]).sum()) == int(
        np.asarray(full["teacher_refined"]).sum())


def test_sharded_abn_step_runs_on_mesh():
    mesh = make_mesh()
    model, tx, state, scfg = _setup(axis_name="data")
    per_shard = steps.make_abn_step(model, tx, scfg, axis_name="data")
    step = steps.shard_train_step(per_shard, mesh)
    batch = _batch(n_src=8, n_grp=8)
    state1, metrics = step(state, batch, jax.random.PRNGKey(6))
    assert int(state1.step) == 1
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # BN stats moved and stayed replicated-consistent
    init_stats = create_train_state(model, tx, C, (*HW, 3)).batch_stats
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state1.batch_stats),
                        jax.tree.leaves(init_stats)))
    assert moved


def test_step_config_from_cfg_tpu_keys():
    """TPU.REFINE_DTYPE / TPU.CKPT_LOSS reach the compiled step config (and
    the shipped defaults select the measured-fastest modes)."""
    from dasac_tpu.core.config import cfg, cfg_from_list, reset_cfg

    reset_cfg()
    scfg = steps.step_config_from_cfg(cfg)
    assert scfg.refine_dtype == "bfloat16"  # round-3 measured default
    assert scfg.refine_res == "stride8"     # round-3 measured default
    assert scfg.ckpt_loss is False
    assert cfg.TPU.REMAT == "none"
    cfg_from_list(["TPU.REFINE_DTYPE", "float32", "TPU.CKPT_LOSS", "True",
                   "TPU.REFINE_RES", "full"])
    scfg = steps.step_config_from_cfg(cfg)
    assert scfg.refine_dtype == "float32" and scfg.ckpt_loss is True
    assert scfg.refine_res == "full"
    reset_cfg()
