"""THE THREE-STAGE RECIPE as one chain (reference README.md:74-96,160 and
launch/train.sh:30-126):

  stage 1  ABN baseline via ``train.py`` (MODEL.BASELINE=True)
  stage 2  ``infer_val.py`` mask export on the target train split with the
           ABN snapshot
  stage 3  ``tools/compute_is_weights.py`` on those exported masks
  stage 4  SAC ``train.py`` with DATASET.SAMPLE_WEIGHTS=<stage-3 output>
           and ``--resume <stage-1 snapshot>``

Every stage was already tested separately; this file executes the GLUE —
the ABN checkpoint resuming into SAC mode, IS weights flowing from our own
exported masks into the importance sampler (whose class CDFs must actually
shift away from uniform), and the ``launch/train.sh`` dispatch/defaulting
logic.
"""

import glob
import os
import subprocess

import numpy as np

from dasac_tpu.data.synth import make_synthetic_root

REPO = os.path.join(os.path.dirname(__file__), "..")
CFG = os.path.join(REPO, "configs", "tiny_cpu.yaml")


def test_three_stage_recipe(tmp_path):
    root = make_synthetic_root(str(tmp_path / "data"), hw=(48, 64),
                               n_train_src=4, n_train_tgt=4, n_val=2)
    import infer_val as infer_cli
    import train as train_cli

    def train_args(run, snap, extra):
        return ["--cfg", CFG, "--snapshot-dir", str(tmp_path / snap),
                "--logdir", str(tmp_path / "logs"), "--exp", "recipe",
                "--run", run, "--workers", "2",
                "--set", "DATASET.ROOT", root,
                "LOG.ITER_VAL", "1", "LOG.ITER_TARGET", "1"] + extra

    # ---- stage 1: ABN baseline --------------------------------------------
    train_cli.main(train_args("abn", "snap_abn",
                              ["MODEL.BASELINE", "True",
                               "TRAIN.NUM_EPOCHS", "1"]))
    snaps = sorted(glob.glob(str(tmp_path / "snap_abn" / "**" / "*.ckpt"),
                             recursive=True))
    assert snaps, "ABN produced no snapshot"
    abn_ckpt = snaps[-1]

    # each real stage is its own process; the shared-process test must reset
    # the global cfg between them (tests/conftest.py does so between tests)
    from dasac_tpu.core.config import reset_cfg

    reset_cfg()

    # ---- stage 2: mask export on the target train split -------------------
    masks = str(tmp_path / "masks")
    infer_cli.main(["--cfg", CFG, "--resume", abn_ckpt,
                    "--infer-list", "train_cityscapes",
                    "--mask-output-dir", masks, "--workers", "2",
                    "--set", "DATASET.ROOT", root])
    exported = sorted(os.path.basename(p)
                      for p in glob.glob(os.path.join(masks, "*.png")))
    assert exported == ["tgt_%03d.png" % i for i in range(4)], exported

    # ---- stage 3: IS weights from OUR exported masks ----------------------
    from dasac_tpu.tools import compute_is_weights

    weights_path = str(tmp_path / "cs_weights.data")
    stats = compute_is_weights.count(masks, out=weights_path, verbose=False)
    assert set(stats) == set(exported)
    # default format is the reference-compatible torch.save; the sampler's
    # loader reads either format
    from dasac_tpu.data.sampler import load_sample_weights
    assert load_sample_weights(weights_path) == stats

    # ---- stage 4: SAC resuming the ABN snapshot with the weights ----------
    # the ABN snapshot carries its epoch counter (the reference resumes
    # start_epoch from it, train.py:108-109) — the SAC stage trains the
    # epochs beyond it
    reset_cfg()
    train_cli.main(train_args("sac", "snap_sac",
                              ["DATASET.SAMPLE_WEIGHTS", weights_path,
                               "TRAIN.NUM_EPOCHS", "3",
                               "--resume", abn_ckpt]))
    sac_snaps = glob.glob(str(tmp_path / "snap_sac" / "**" / "*.ckpt"),
                          recursive=True)
    assert sac_snaps, "SAC stage produced no snapshot"
    # the SAC run actually trained the target branch: self_ce was logged
    evs = glob.glob(str(tmp_path / "logs" / "**" / "sac" / "**" /
                        "events.jsonl"), recursive=True)
    assert evs, "no SAC event logs"
    joined = "".join(open(p).read() for p in evs)
    assert "self_ce" in joined, "SAC run never published self_ce"

    # ---- the sampler's class CDFs actually shifted from uniform -----------
    # (global cfg still holds the stage-4 configuration after main())
    from dasac_tpu.core.config import cfg
    from dasac_tpu.data.factory import Loaders

    assert cfg.DATASET.SAMPLE_WEIGHTS == weights_path
    loaders = Loaders(cfg)
    imp = loaders.importance
    assert imp is not None, "SAMPLE_WEIGHTS did not reach the sampler"
    cum = imp._cum  # [C, N] per-class cumulative weights
    dens = np.diff(np.concatenate([np.zeros((cum.shape[0], 1)), cum], 1), 1)
    dens = dens / dens.sum(1, keepdims=True)
    from PIL import Image

    totals = np.add.reduce([
        np.bincount(np.asarray(Image.open(os.path.join(masks, e)),
                               np.int64).reshape(-1), minlength=256)[:19]
        for e in exported])
    present = np.nonzero(totals)[0].tolist()
    uniform = np.full(dens.shape[1], 1.0 / dens.shape[1])
    shifted = [c for c in present
               if np.abs(dens[c] - uniform).max() > 1e-3]
    assert shifted, ("importance sampling left every present class uniform: "
                     "%r" % dens[present].tolist())


def _dispatch(env, *args):
    p = subprocess.run(["bash", "launch/train.sh", *args],
                       env={**os.environ, "DASAC_DRYRUN": "1", **env},
                       cwd=REPO, capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def test_launch_dispatch_abn_and_sac(tmp_path):
    """launch/train.sh dispatch parity (reference launch/train.sh:30-126):
    config selection, MODEL.BASELINE for 'base', the RESUME guard for SAC,
    IS-weight defaulting, SYNTHIA's 16-class protocol."""
    rc, out = _dispatch({}, "gta", "vgg16", "base")
    assert rc == 0 and "configs/deeplabv2_vgg16.yaml" in out
    assert "MODEL.BASELINE True" in out and "TRAIN.TASK train_game_9K" in out

    # SAC without a RESUME snapshot must refuse (reference guard)
    rc, out = _dispatch({"RESUME": ""}, "gta", "resnet101")
    assert rc != 0 and "RESUME" in out

    resume = tmp_path / "abn.ckpt"
    resume.write_bytes(b"x")
    weights = tmp_path / "w.data"
    weights.write_bytes(b"x")
    rc, out = _dispatch({"RESUME": str(resume), "IS_WEIGHTS": str(weights)},
                        "synthia", "resnet101")
    assert rc == 0 and "configs/deeplabv2_resnet101_train.yaml" in out
    assert "--resume %s" % resume in out
    assert "DATASET.SAMPLE_WEIGHTS %s" % weights in out
    assert "VAL.IGNORE_CLASS [9,14,16]" in out
    assert "TRAIN.TASK train_synthia_9K" in out

    # missing IS weights -> warn + uniform sampling, run proceeds
    rc, out = _dispatch({"RESUME": str(resume)}, "gta", "vgg16fcn")
    assert rc == 0 and "SAMPLE_WEIGHTS" not in out
    assert "uniform sampling" in out and "configs/fcn_vgg16_train.yaml" in out


def test_launch_infer_dispatch(tmp_path):
    """launch/infer_val.sh dispatch (reference launch/infer_val.sh:1-63):
    snapshot guard, config/list selection, flag plumbing."""
    p = subprocess.run(["bash", "launch/infer_val.sh"],
                       env={**os.environ, "DASAC_DRYRUN": "1", "SNAPSHOT_PATH": ""},
                       cwd=REPO, capture_output=True, text=True)
    assert p.returncode != 0 and "SNAPSHOT_PATH" in p.stdout + p.stderr

    snap = tmp_path / "m.ckpt"
    snap.write_bytes(b"x")
    p = subprocess.run(
        ["bash", "launch/infer_val.sh", "deeplabv2_vgg16_train",
         "train_cityscapes"],
        env={**os.environ, "DASAC_DRYRUN": "1", "SNAPSHOT_PATH": str(snap),
             "OUTPUT_DIR": str(tmp_path / "out"), "FLIP": "1",
             "SPATIAL": "1", "BATCH": "16"},
        cwd=REPO, capture_output=True, text=True)
    out = p.stdout + p.stderr
    assert p.returncode == 0, out
    assert "configs/deeplabv2_vgg16_train.yaml" in out
    assert "--infer-list data/train_cityscapes.txt" in out
    assert "--resume %s" % snap in out
    assert "--flip" in out and "--spatial" in out
    assert "--batch 16" in out  # BATCH env -> serving throughput dial
    assert "--spatial 4" not in out  # SPATIAL=1 -> bare flag (all chips)

    # SPATIAL=N>1 passes the chips-per-frame count through
    p = subprocess.run(
        ["bash", "launch/infer_val.sh", "deeplabv2_vgg16_train",
         "train_cityscapes"],
        env={**os.environ, "DASAC_DRYRUN": "1", "SNAPSHOT_PATH": str(snap),
             "OUTPUT_DIR": str(tmp_path / "out"), "SPATIAL": "4"},
        cwd=REPO, capture_output=True, text=True)
    out = p.stdout + p.stderr
    assert p.returncode == 0, out
    assert "--spatial 4" in out
