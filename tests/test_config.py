"""Config system tests: YAML merge, --set overrides, coercion, immutability."""

import os
import textwrap

import pytest

from dasac_tpu.core.config import (
    cfg,
    cfg_from_file,
    cfg_from_list,
    reset_cfg,
)


def test_defaults_match_reference_schema():
    # spot-check defaults against reference core/config.py:45-176
    assert cfg.TRAIN.BATCH_SIZE == 16
    assert cfg.TRAIN.GROUP_SIZE == 2
    assert cfg.DATASET.CROP_SIZE == [512, 512]
    assert cfg.DATASET.RND_ZOOM == [0.5, 1.2]
    assert cfg.MODEL.NET_MOMENTUM == 0.99
    assert cfg.MODEL.NET_MOMENTUM_ITER == 100
    assert cfg.MODEL.THRESHOLD_BETA == 1e-3
    assert cfg.MODEL.LOSS == "focal_ce_conf"
    assert cfg.MODEL.RUN_CONF_UPPER == 0.75
    assert cfg.VAL.IGNORE_CLASS == []


def test_reference_yaml_loads(tmp_path):
    """The reference's published train config keys must all merge cleanly."""
    yaml_text = textwrap.dedent(
        """
        DATASET:
          CROP_SIZE: [512, 1024]
          VAL_CROP: False
          RND_JITTER: 0.4
          RND_ZOOM: [.5, 1.]
          GUIDED_HFLIP: True
          RND_GREYSCALE: 0.2
          SCALE_FROM: 0.5
          SCALE_TO: 1.0
          ROOT: "data"
        TRAIN:
          BATCH_SIZE: 8
          GROUP_SIZE: 4
          NUM_GROUPS: 2
          TASK: "train_game_9K"
        MODEL:
          ARCH: "deeplabv2_resnet101"
          LR: 0.00025
          LR_TARGET: 5.
          WEIGHT_DECAY: 0.0005
        TB:
          IM_SIZE: [256, 512]
        """
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    cfg_from_file(str(p))
    assert cfg.DATASET.CROP_SIZE == [512, 1024]
    assert cfg.DATASET.VAL_CROP is False
    assert cfg.DATASET.RND_ZOOM == [0.5, 1.0]
    assert cfg.TRAIN.GROUP_SIZE == 4
    assert cfg.MODEL.LR_TARGET == 5.0
    assert cfg.TB.IM_SIZE == (256, 512)  # list coerced to tuple default


def test_actual_reference_configs_load():
    """All shipped configs/*.yaml parse against the schema."""
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    names = [f for f in os.listdir(cfg_dir) if f.endswith(".yaml")]
    assert len(names) >= 6
    for name in names:
        reset_cfg()
        cfg_from_file(os.path.join(cfg_dir, name))


def test_set_list_override():
    cfg_from_list(["TRAIN.BATCH_SIZE", "4", "MODEL.BASELINE", "True"])
    assert cfg.TRAIN.BATCH_SIZE == 4
    assert cfg.MODEL.BASELINE is True


def test_set_list_rejects_unknown_key():
    with pytest.raises(AssertionError):
        cfg_from_list(["TRAIN.NO_SUCH_KEY", "1"])


def test_yaml_rejects_unknown_key(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("TRAIN:\n  BOGUS: 1\n")
    with pytest.raises(KeyError):
        cfg_from_file(str(p))


def test_type_mismatch_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("TRAIN:\n  BATCH_SIZE: 'a string'\n")
    with pytest.raises(ValueError):
        cfg_from_file(str(p))


def test_immutability():
    cfg.immutable(True)
    with pytest.raises(AttributeError):
        cfg.TRAIN.BATCH_SIZE = 1
    cfg.immutable(False)
    cfg.TRAIN.BATCH_SIZE = 2
    assert cfg.TRAIN.BATCH_SIZE == 2
