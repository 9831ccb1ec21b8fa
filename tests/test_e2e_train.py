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
