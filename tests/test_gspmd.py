"""GSPMD partitioning mode (TPU.PARTITION=gspmd): the global-batch step
jitted with input shardings over a 2-D (data, sp) mesh must be numerically
equivalent to the same step on one device — XLA's SPMD partitioner (batch
split + conv halo exchanges for the height-sharded images) is the only
difference.  The training counterpart of infer_val --spatial; no reference
counterpart (DistributedDataParallel only splits batches)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from dasac_tpu.core.mesh import (make_mesh_2d, spatial_batch_sharding,
                                 shard_batch)
from dasac_tpu.train import steps
from tests.test_train_steps import _batch, _setup

C = 5


def _mesh_or_skip(n_data, n_sp):
    if len(jax.devices()) < n_data * n_sp:
        pytest.skip("needs %d devices" % (n_data * n_sp))
    return make_mesh_2d(n_data, n_sp)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 1), (1, 8)])
def test_gspmd_sac_step_matches_single_device(mesh_shape):
    mesh = _mesh_or_skip(*mesh_shape)
    model, tx, state, scfg = _setup()  # axis_name=None: global semantics
    step_fn = steps.make_sac_step(model, tx, scfg)
    batch = _batch(n_src=4, n_grp=4)
    key = jax.random.PRNGKey(3)

    ref_state, ref_metrics = jax.jit(step_fn)(state, batch, key)

    _, _, state2, _ = _setup()
    placed = shard_batch(mesh, batch, spatial_batch_sharding(mesh))
    g_state, g_metrics = steps.gspmd_train_step(step_fn, mesh)(
        state2, placed, key)

    for k in ("src_loss_ce", "self_ce", "pseudo_cover"):
        np.testing.assert_allclose(float(g_metrics[k]),
                                   float(ref_metrics[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_state.params),
            jax.tree_util.tree_leaves_with_path(g_state.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(pa))
    np.testing.assert_allclose(np.asarray(g_state.running_conf),
                               np.asarray(ref_state.running_conf),
                               rtol=2e-4, atol=2e-5)


def test_gspmd_multi_step_matches_single_device_trajectory():
    """Three SAC steps across a teacher EMA update on the (2, 4) mesh track
    the single-device trajectory step for step — including whatever pseudo
    coverage the run produces (so a dead target branch under partitioning
    would diverge from the reference trajectory and fail)."""
    mesh = _mesh_or_skip(2, 4)
    model, tx, state, scfg = _setup()  # net_momentum_iter=3
    ref_step = jax.jit(steps.make_sac_step(model, tx, scfg))
    _, _, g_state, _ = _setup()
    step = steps.gspmd_train_step(steps.make_sac_step(model, tx, scfg), mesh)
    sharding = spatial_batch_sharding(mesh)
    for i in range(3):
        batch = _batch(n_src=4, n_grp=4, seed=i)
        state, ref_metrics = ref_step(state, batch, jax.random.PRNGKey(i))
        g_state, metrics = step(g_state, shard_batch(mesh, batch, sharding),
                                jax.random.PRNGKey(i))
        for k in ("src_loss_ce", "self_ce", "pseudo_cover", "teacher_diff"):
            np.testing.assert_allclose(
                float(np.mean(metrics[k])), float(np.mean(ref_metrics[k])),
                rtol=5e-4, atol=5e-5, err_msg="step %d %s" % (i, k))
    assert int(g_state.step) == 3
    assert float(g_state.slow_init) == 1.0
    np.testing.assert_allclose(np.asarray(g_state.running_conf),
                               np.asarray(state.running_conf),
                               rtol=5e-4, atol=5e-5)


def test_gspmd_abn_step_matches_single_device():
    """MODEL.BASELINE=True routes make_abn_step through the same gspmd
    wrapper — same equivalence contract as the SAC step."""
    mesh = _mesh_or_skip(2, 4)
    model, tx, state, scfg = _setup()
    step_fn = steps.make_abn_step(model, tx, scfg)
    batch = _batch(n_src=4, n_grp=4)
    key = jax.random.PRNGKey(9)
    ref_state, ref_metrics = jax.jit(step_fn)(state, batch, key)
    _, _, state2, _ = _setup()
    g_state, g_metrics = steps.gspmd_train_step(step_fn, mesh)(
        state2, shard_batch(mesh, batch, spatial_batch_sharding(mesh)), key)
    for k in ref_metrics:
        np.testing.assert_allclose(float(np.mean(g_metrics[k])),
                                   float(np.mean(ref_metrics[k])),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_state.params),
            jax.tree_util.tree_leaves_with_path(g_state.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_gspmd_eval_step_exact():
    """Confusion matrices are integer counts — the GSPMD eval must agree
    EXACTLY with the single-device eval."""
    mesh = _mesh_or_skip(2, 4)
    model, tx, state, scfg = _setup()
    src_img, src_lbl, _, _ = _batch(n_src=4, n_grp=4)
    ref = jax.jit(steps.make_eval_step(model, scfg))(
        state, src_img, src_lbl.astype(jnp.int32))
    g = steps.gspmd_eval_step(steps.make_eval_step(model, scfg), mesh)(
        state, src_img, src_lbl.astype(jnp.int32))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(ref))


def test_gspmd_target_eval_step_runs():
    mesh = _mesh_or_skip(2, 4)
    model, tx, state, scfg = _setup()
    ev = steps.gspmd_target_eval_step(
        steps.make_target_eval_step(model, scfg), mesh)
    _, _, tgt_img, tgt_lbl = _batch(n_src=4, n_grp=4)
    confs = ev(state, tgt_img, tgt_lbl.astype(jnp.int32),
               jax.random.PRNGKey(5))
    for k, v in confs.items():
        assert v.shape == (C, C)
        assert np.isfinite(np.asarray(v)).all(), k


def test_gspmd_trainer_config_wiring(tmp_path, capsys):
    """Trainer picks the 2-D mesh + GSPMD wrappers from TPU.PARTITION /
    TPU.MESH_SP and a short synthetic train run produces a checkpoint."""
    import glob
    import os

    from dasac_tpu.data.synth import make_synthetic_root
    import train as train_cli

    root = make_synthetic_root(str(tmp_path / "data"), hw=(48, 64),
                               n_train_src=4, n_train_tgt=4, n_val=2)
    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "tiny_cpu.yaml")
    train_cli.main([
        "--cfg", cfg_path, "--snapshot-dir", str(tmp_path / "snap"),
        "--logdir", str(tmp_path / "logs"), "--exp", "gspmd", "--run", "t0",
        "--workers", "2",
        "--set", "DATASET.ROOT", root, "TRAIN.NUM_EPOCHS", "1",
        "TPU.PARTITION", "gspmd", "TPU.MESH_SP", "4",
        "TRAIN.BATCH_SIZE", "4", "TRAIN.NUM_GROUPS", "4",
        "TRAIN.GROUP_SIZE", "2", "LOG.ITER_VAL", "1", "LOG.ITER_TARGET", "1",
    ])
    # auto-mesh: 8 devices / sp=4 -> data=2 (divides BATCH=4, GROUPS=4)
    assert "(gspmd 2x4)" in capsys.readouterr().out
    snaps = glob.glob(str(tmp_path / "snap" / "**" / "*.ckpt"),
                      recursive=True)
    assert snaps, "gspmd trainer produced no snapshot"
