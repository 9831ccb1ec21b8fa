"""CLI flag-surface parity: core/opts.py must accept every flag the
reference's opts.py:15-109 exposes (launch scripts and user muscle memory
carry over verbatim), and reproduce its logdir/snapshot-dir layout."""

import os

from dasac_tpu.core import opts

# every flag the reference parser exposes (reference opts.py:20-71)
REFERENCE_FLAGS = [
    "--snapshot-dir", "--logdir", "--exp", "--resume", "--run",
    "--mask-output-dir", "--split", "--workers", "--dataloader",
    "--infer-list", "--world-size", "--dist-url", "--dist-backend",
    "--rank", "--multiprocessing-distributed", "--seed", "--cfg", "--set",
]


def test_reference_flags_accepted(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    argv = ["--cfg", "cfg.yaml",
            "--snapshot-dir", "snaps", "--logdir", "logs",
            "--exp", "e1", "--run", "run3", "--resume", "x.pth",
            "--mask-output-dir", "masks", "--split", "val",
            "--workers", "4", "--dataloader", "cityscapes",
            "--infer-list", "data/val_cityscapes.txt",
            "--world-size", "8", "--dist-url", "tcp://1.2.3.4:56789",
            "--dist-backend", "nccl", "--rank", "3",
            "--multiprocessing-distributed", "--seed", "7",
            "--set", "TRAIN.BATCH_SIZE", "4"]
    args = opts.get_arguments(argv)
    assert args.cfg_file == "cfg.yaml"
    assert args.world_size == 8 and args.rank == 3
    assert args.multiprocessing_distributed
    assert args.set_cfgs == ["TRAIN.BATCH_SIZE", "4"]
    # the reference's <dir>/<dataloader>/<exp>/<run> layout, created eagerly
    assert args.logdir == os.path.join("logs", "cityscapes", "e1", "run3")
    assert args.snapshot_dir == os.path.join("snaps", "cityscapes", "e1",
                                             "run3")
    assert os.path.isdir(args.logdir) and os.path.isdir(args.snapshot_dir)


def test_flag_surface_superset(tmp_path, monkeypatch):
    """Every reference flag exists on our parser (1:1 surface claim)."""
    import argparse

    parser = argparse.ArgumentParser()
    opts.add_global_arguments(parser)
    ours = {s for a in parser._actions for s in a.option_strings}
    missing = [f for f in REFERENCE_FLAGS if f not in ours]
    assert not missing, missing


def test_defaults_and_dataloader_fallback(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = opts.get_arguments(["--cfg", "c.yaml"])
    assert args.dataloader == "default"
    assert args.run == "run0" and args.exp == "main"
    assert args.infer_list == "data/val_cityscapes.txt"
    assert args.logdir == os.path.join("./logs", "default", "main", "run0")
