"""End-to-end CLI training test: synthetic data on disk -> train.py main()
-> epochs with validation + best-checkpointing -> resume (SURVEY.md §4:
CPU-runnable end-to-end config exercising the full SAC train step)."""

import glob
import os

import numpy as np
import pytest

from dasac_tpu.data.synth import make_synthetic_root


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    return make_synthetic_root(str(root), hw=(48, 64), n_train_src=4,
                               n_train_tgt=4, n_val=2)


def _run_train(synth_root, tmp_path, extra=()):
    import train as train_cli

    argv = [
        "--cfg", os.path.join(os.path.dirname(__file__), "..", "configs",
                              "tiny_cpu.yaml"),
        "--snapshot-dir", str(tmp_path / "snap"),
        "--logdir", str(tmp_path / "logs"),
        "--exp", "e2e", "--run", "t0",
        "--workers", "2",
        "--set", "DATASET.ROOT", str(synth_root),
        "TRAIN.NUM_EPOCHS", "2",
    ] + list(extra)
    train_cli.main(argv)
    return tmp_path


def test_cli_sac_training_end_to_end(synth_root, tmp_path):
    _run_train(synth_root, tmp_path)
    # events logged
    ev = glob.glob(str(tmp_path / "logs" / "**" / "events.jsonl"),
                   recursive=True)
    assert ev, "no event logs written"
    # a best snapshot was saved after validation
    snaps = glob.glob(str(tmp_path / "snap" / "**" / "*.ckpt"),
                      recursive=True)
    assert snaps, "no checkpoint saved"

    # resume from the snapshot (exercises state round-trip)
    _run_train(synth_root, tmp_path, extra=["--resume", snaps[0]])


def test_cli_abn_training_end_to_end(synth_root, tmp_path):
    _run_train(synth_root, tmp_path,
               extra=["MODEL.BASELINE", "True", "LOG.ITER_VAL", "2",
                      "LOG.ITER_TARGET", "2"])
    ev = glob.glob(str(tmp_path / "logs" / "**" / "events.jsonl"),
                   recursive=True)
    assert ev
    # the baseline runs target-split validation too (reference
    # train.py:510-512 with step_target = step(train=False)): the
    # train_target writer must carry a logits_up mIoU scalar
    tt = [p for p in ev if os.sep + "train_target" + os.sep in p]
    assert tt, ev
    with open(tt[0]) as f:
        tags = [line for line in f if "logits_up_all/mIoU" in line]
    assert tags, "no target-split mIoU published for the ABN baseline"


def test_cli_abn_training_sharded_mesh(synth_root, tmp_path):
    """ABN baseline on the 4-device mesh: exercises the SHARDED target
    validation branch (eval_step over group batches) added for pod dedup."""
    import jax

    assert len(jax.devices()) >= 4
    _run_train(synth_root, tmp_path, extra=[
        "MODEL.BASELINE", "True",
        "TPU.MESH_DEVICES", "4",
        "TRAIN.BATCH_SIZE", "4",
        "TRAIN.NUM_GROUPS", "4",
        "TRAIN.GROUP_SIZE", "2",
        "LOG.ITER_VAL", "2", "LOG.ITER_TARGET", "1",
    ])
    ev = glob.glob(str(tmp_path / "logs" / "**" / "events.jsonl"),
                   recursive=True)
    tt = [p for p in ev if os.sep + "train_target" + os.sep in p]
    assert tt, ev
    with open(tt[0]) as f:
        assert any("logits_up_all/mIoU" in line for line in f)


def test_cli_sac_training_sharded_mesh(synth_root, tmp_path):
    """Full Trainer.fit() on the 8-device CPU mesh: sharded train steps,
    sharded eval, checkpointing and resume — exercises the mesh/shard_batch
    trainer branches end to end (reference DDP world, train.py:471-533)."""
    import jax

    assert len(jax.devices()) >= 4
    _run_train(synth_root, tmp_path, extra=[
        "TPU.MESH_DEVICES", "4",
        "TRAIN.BATCH_SIZE", "4",
        "TRAIN.NUM_GROUPS", "4",
        "TRAIN.GROUP_SIZE", "2",
    ])
    ev = glob.glob(str(tmp_path / "logs" / "**" / "events.jsonl"),
                   recursive=True)
    assert ev
    snaps = glob.glob(str(tmp_path / "snap" / "**" / "*.ckpt"),
                      recursive=True)
    assert snaps, "no checkpoint saved by the sharded trainer"
    # resume on the same mesh (sharded state round-trip)
    _run_train(synth_root, tmp_path, extra=[
        "TPU.MESH_DEVICES", "4",
        "TRAIN.BATCH_SIZE", "4",
        "TRAIN.NUM_GROUPS", "4",
        "TRAIN.GROUP_SIZE", "2",
        "--resume", snaps[0],
    ])


def _read_events(logdir_glob, tags_prefixes):
    """{(tag, step): value} for scalar events under matching prefixes."""
    import json as _json

    out = {}
    for p in glob.glob(logdir_glob, recursive=True):
        with open(p) as f:
            for line in f:
                rec = _json.loads(line)
                if any(rec["tag"].startswith(t) for t in tags_prefixes):
                    out[(rec["tag"], rec["step"])] = rec["value"]
    return out


def test_cli_pod_four_process_trajectory_identity(tmp_path_factory,
                                                  tmp_path):
    """4 jax.distributed processes x 2 local devices (8-device global mesh)
    vs ONE process x 8 devices, same seed/config/data: the assembled global
    batches are sample-for-sample identical (EpochSampler batch-block
    slicing), so the per-epoch loss trajectory and val mIoU must agree up
    to collective reduction-order float noise (the 4x2 process topology
    changes cross-device reduction order; threshold-crossing pixels can
    flip discretely, so coverage-style means get a small absolute
    allowance), and the rank-interleaved val decode
    (host_loader.padded_plain_loader: per-rank batch 2, global stride 8)
    must split 10 val images as 4/2/2/2 across the 4 ranks — two global
    batches, one rank slice all-dummy in the second — the >=2-way behaviors
    the 2-process test cannot see."""
    import re
    import subprocess
    import sys

    from dasac_tpu.utils.sys_tools import find_free_port

    root = make_synthetic_root(
        str(tmp_path_factory.mktemp("pod4data")), hw=(48, 64),
        n_train_src=8, n_train_tgt=8, n_val=10)
    cwd = os.path.join(os.path.dirname(__file__), "..")

    def argv(run, snap_dir, log_dir, dist):
        return [
            sys.executable, "train.py",
            "--cfg", os.path.join(cwd, "configs", "tiny_cpu.yaml"),
            "--snapshot-dir", str(snap_dir), "--logdir", str(log_dir),
            "--exp", "pod4", "--run", run, "--workers", "2",
        ] + (["--multiprocessing-distributed"] if dist else []) + [
            "--set", "DATASET.ROOT", root,
            "TRAIN.NUM_EPOCHS", "1",
            "TRAIN.BATCH_SIZE", "8", "TRAIN.NUM_GROUPS", "8",
            "TRAIN.GROUP_SIZE", "2", "LOG.ITER_TARGET", "1",
            "LOG.ITER_VAL", "1",
        ]

    env_common = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": cwd,
    }

    # ---- reference arm: one process, 8 local devices ----------------------
    p = subprocess.run(
        argv("solo", tmp_path / "snap1", tmp_path / "logs1", dist=False),
        env={**env_common,
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        cwd=cwd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=600)
    assert p.returncode == 0, p.stdout[-3000:]

    # ---- pod arm: 4 processes x 2 devices ---------------------------------
    env_base = {
        **env_common,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_COORDINATOR_ADDRESS": "localhost:%d" % find_free_port(),
        "JAX_NUM_PROCESSES": "4",
    }
    procs = [
        subprocess.Popen(argv("pod", tmp_path / "snap4", tmp_path / "logs4",
                              dist=True),
                         env={**env_base, "JAX_PROCESS_ID": str(r)},
                         cwd=cwd, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for r in range(4)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "rank {} failed:\n{}".format(r, out[-3000:])
    assert "4 process(es)" in outs[0]

    # only rank 0 checkpoints
    assert glob.glob(str(tmp_path / "snap4" / "**" / "*.ckpt"),
                     recursive=True), outs[0][-2000:]

    # ---- rank-interleaved val decode: 10 images -> 4/2/2/2 ----------------
    n_real = []
    for r, out in enumerate(outs):
        m = re.search(r"\[val:val_cityscapes\] rank %d decoded (\d+) real "
                      r"images" % r, out)
        assert m, out[-2000:]
        n_real.append(int(m.group(1)))
    assert sum(n_real) == 10, n_real
    assert sorted(n_real, reverse=True) == [4, 2, 2, 2], n_real

    # ---- trajectory identity vs the single-process arm --------------------
    prefixes = ("train_epoch/", "logits_up_all/mIoU")
    ev_solo = _read_events(str(tmp_path / "logs1" / "**" / "events.jsonl"),
                           prefixes)
    ev_pod = _read_events(str(tmp_path / "logs4" / "**" / "events.jsonl"),
                          prefixes)
    assert ev_solo and set(ev_solo) == set(ev_pod), (
        set(ev_solo) ^ set(ev_pod))
    for key in sorted(ev_solo):
        np.testing.assert_allclose(
            ev_pod[key], ev_solo[key], rtol=1e-3, atol=2e-4,
            err_msg="pod-vs-solo trajectory diverged at %r" % (key,))


def test_cli_pod_two_process_training(synth_root, tmp_path):
    """TRUE multi-process run: 2 jax.distributed CPU processes x 2 local
    devices form a 4-device global mesh; each process decodes its half of
    every batch (Loaders num_replicas=2), shard_batch assembles global
    arrays, rank 0 checkpoints (the reference's mp.spawn+DDP world,
    train.py:471-557)."""
    import subprocess
    import sys

    from dasac_tpu.utils.sys_tools import find_free_port

    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_COORDINATOR_ADDRESS": "localhost:%d" % find_free_port(),
        "JAX_NUM_PROCESSES": "2",
        "PYTHONPATH": os.path.join(os.path.dirname(__file__), ".."),
    }
    argv = [
        sys.executable, "train.py",
        "--cfg", os.path.join(os.path.dirname(__file__), "..", "configs",
                              "tiny_cpu.yaml"),
        "--snapshot-dir", str(tmp_path / "snap"),
        "--logdir", str(tmp_path / "logs"),
        "--exp", "pod", "--run", "t0", "--workers", "2",
        "--multiprocessing-distributed",
        "--set", "DATASET.ROOT", str(synth_root),
        "TRAIN.NUM_EPOCHS", "1",
        "TRAIN.BATCH_SIZE", "4", "TRAIN.NUM_GROUPS", "4",
        "TRAIN.GROUP_SIZE", "2", "LOG.ITER_TARGET", "1",
    ]
    cwd = os.path.join(os.path.dirname(__file__), "..")
    procs = [
        subprocess.Popen(argv, env={**env_base, "JAX_PROCESS_ID": str(r)},
                         cwd=cwd, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for r in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "rank {} failed:\n{}".format(r, out[-3000:])
    assert "2 process(es)" in outs[0]
    # only rank 0 checkpoints/logs
    snaps = glob.glob(str(tmp_path / "snap" / "**" / "*.ckpt"),
                      recursive=True)
    assert snaps, outs[0][-2000:]
    # deduplicated pod validation: across ranks each val image is decoded
    # exactly once (the 2-image split divides between the processes)
    import re

    n_real = []
    for r, out in enumerate(outs):
        m = re.search(r"\[val:val_cityscapes\] rank %d decoded (\d+) real "
                      r"images" % r, out)
        assert m, out[-2000:]
        n_real.append(int(m.group(1)))
    assert sum(n_real) == 2, n_real


def test_cli_pod_gspmd_trajectory_identity(tmp_path_factory):
    """Pod x GSPMD compose: 2 jax.distributed processes x 4 local devices
    form ONE global (4,2) (data, sp) mesh — batch over 'data', crop height
    over 'sp' with XLA halo exchanges — vs the same (4,2) mesh in a single
    8-device process.  Each process feeds its batch-block slice through
    jax.make_array_from_process_local_data (core/mesh.shard_batch); the
    global program and shardings are identical, so the per-epoch loss
    trajectory and val mIoU must agree to collective float noise.  This is
    the multi-host story for crops too large for one chip's HBM (the gspmd
    mode's whole justification), previously asserted single-process-only."""
    import re
    import subprocess
    import sys

    import numpy as np

    from dasac_tpu.utils.sys_tools import find_free_port

    tmp_path = tmp_path_factory.mktemp("podgspmd")
    root = make_synthetic_root(
        str(tmp_path_factory.mktemp("podgspmddata")), hw=(48, 64),
        n_train_src=8, n_train_tgt=8, n_val=4)
    cwd = os.path.join(os.path.dirname(__file__), "..")

    def argv(run, snap_dir, log_dir, dist):
        return [
            sys.executable, "train.py",
            "--cfg", os.path.join(cwd, "configs", "tiny_cpu.yaml"),
            "--snapshot-dir", str(snap_dir), "--logdir", str(log_dir),
            "--exp", "podg", "--run", run, "--workers", "2",
        ] + (["--multiprocessing-distributed"] if dist else []) + [
            "--set", "DATASET.ROOT", root,
            "TRAIN.NUM_EPOCHS", "1",
            "TPU.PARTITION", "gspmd", "TPU.MESH_SP", "2",
            "TRAIN.BATCH_SIZE", "4", "TRAIN.NUM_GROUPS", "4",
            "TRAIN.GROUP_SIZE", "2", "LOG.ITER_TARGET", "1",
            "LOG.ITER_VAL", "1",
        ]

    env_common = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": cwd,
    }

    # ---- reference arm: one process, (4,2) mesh over 8 local devices ------
    p = subprocess.run(
        argv("solo", tmp_path / "snap1", tmp_path / "logs1", dist=False),
        env={**env_common,
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        cwd=cwd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=900)
    assert p.returncode == 0, p.stdout[-3000:]
    assert "(gspmd 4x2)" in p.stdout

    # ---- pod arm: 2 processes x 4 devices, same global (4,2) mesh ---------
    env_base = {
        **env_common,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COORDINATOR_ADDRESS": "localhost:%d" % find_free_port(),
        "JAX_NUM_PROCESSES": "2",
    }
    procs = [
        subprocess.Popen(argv("pod", tmp_path / "snap2", tmp_path / "logs2",
                              dist=True),
                         env={**env_base, "JAX_PROCESS_ID": str(r)},
                         cwd=cwd, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for r in range(2)
    ]
    outs = [pp.communicate(timeout=900)[0] for pp in procs]
    for r, (pp, out) in enumerate(zip(procs, outs)):
        assert pp.returncode == 0, "rank {} failed:\n{}".format(
            r, out[-3000:])
    assert "2 process(es) (gspmd 4x2)" in outs[0], outs[0][-2000:]
    assert glob.glob(str(tmp_path / "snap2" / "**" / "*.ckpt"),
                     recursive=True), outs[0][-2000:]

    # pod validation decodes each val image exactly once across ranks
    n_real = []
    for r, out in enumerate(outs):
        m = re.search(r"\[val:val_cityscapes\] rank %d decoded (\d+) real "
                      r"images" % r, out)
        assert m, out[-2000:]
        n_real.append(int(m.group(1)))
    assert sum(n_real) == 4, n_real

    # ---- trajectory identity vs the single-process gspmd arm --------------
    prefixes = ("train_epoch/", "logits_up_all/mIoU")
    ev_solo = _read_events(str(tmp_path / "logs1" / "**" / "events.jsonl"),
                           prefixes)
    ev_pod = _read_events(str(tmp_path / "logs2" / "**" / "events.jsonl"),
                          prefixes)
    assert ev_solo and set(ev_solo) == set(ev_pod), (
        set(ev_solo) ^ set(ev_pod))
    for key in sorted(ev_solo):
        np.testing.assert_allclose(
            ev_pod[key], ev_solo[key], rtol=1e-3, atol=2e-4,
            err_msg="gspmd pod-vs-solo trajectory diverged at %r" % (key,))
