"""Tests for auxiliary utils: palettes, sys tools, split-list generation,
visual panels, timers, writers."""

import json
import os

import numpy as np
from PIL import Image

from dasac_tpu.tools import make_split_lists
from dasac_tpu.utils import palette, sys_tools, visualise
from dasac_tpu.utils.logging import ScalarWriter
from dasac_tpu.utils.timer import Timer


def test_voc_colormap():
    cm = palette.colormap()
    assert cm.shape == (256, 3)
    assert tuple(cm[0]) == (0, 0, 0)
    assert tuple(cm[1]) == (128, 0, 0)  # VOC class 1
    assert tuple(cm[2]) == (0, 128, 0)


def test_create_palette():
    p = palette.create_palette(19)
    assert p.shape == (768,)
    assert p[:57].any()


def test_find_free_port_and_check_dir(tmp_path):
    port = sys_tools.find_free_port()
    assert 0 < port < 65536
    d = sys_tools.check_dir(str(tmp_path), "a", "b")
    assert os.path.isdir(d)


def test_make_split_lists(tmp_path):
    root = tmp_path
    (root / "leftImg8bit" / "train" / "cityA").mkdir(parents=True)
    (root / "labels_cs" / "train" / "cityA").mkdir(parents=True)
    for i in range(5):
        img = np.zeros((8, 8, 3), np.uint8)
        Image.fromarray(img).save(
            root / "leftImg8bit" / "train" / "cityA" /
            "f{:02d}_leftImg8bit.png".format(i))
        Image.fromarray(img[..., 0]).save(
            root / "labels_cs" / "train" / "cityA" /
            "f{:02d}_gtFine_labelIds.png".format(i))
    out = str(root / "train_cityscapes.txt")
    make_split_lists.main([
        "--dataset", "cityscapes", "--root", str(root),
        "--image-dir", "leftImg8bit/train", "--label-dir", "labels_cs/train",
        "--out", out, "--limit", "3"])
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 3
    img_rel, lbl_rel = lines[0].split(" ")
    assert os.path.isfile(os.path.join(root, img_rel))
    assert os.path.isfile(os.path.join(root, lbl_rel))


def test_visual_panels():
    b, h, w, c = 2, 8, 8, 5
    rng = np.random.RandomState(0)

    class Views:
        frames_aug = rng.randn(b, h, w, 3).astype(np.float32)
        frames_clean = rng.randn(b, h, w, 3).astype(np.float32)
        labels = rng.randint(0, c, (b, h, w))

    refined = rng.rand(b, h, w, c).astype(np.float32)
    pseudo = rng.randint(0, c, (b, h, w))
    student = rng.randn(b, h, w, c).astype(np.float32)
    panel = visualise.target_panel(Views, refined, pseudo, student,
                                   (0.485, 0.456, 0.406),
                                   (0.229, 0.224, 0.225))
    assert panel.dtype == np.uint8 and panel.ndim == 3
    assert panel.shape[0] == 8 * (h + 2)  # +entropy row

    sp = visualise.source_panel(Views.frames_aug, Views.labels, student,
                                (0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    assert sp.shape[0] == 4 * (h + 2)


def test_fixed_batch():
    fb = visualise.FixedBatch()
    assert not fb.has("x")
    fb.save("x", (np.ones(3),))
    fb.save("x", (np.zeros(3),))  # capture-once: second save ignored
    assert fb.get("x")[0].sum() == 3


def test_scalar_writer_jsonl(tmp_path):
    w = ScalarWriter(str(tmp_path), use_tensorboard=False)
    w.add_scalar("a/b", 1.5, 3)
    w.add_image("img", np.zeros((4, 4, 3), np.uint8), 1)
    w.close()
    recs = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    assert recs[0]["tag"] == "a/b" and recs[0]["value"] == 1.5
    assert os.path.isfile(tmp_path / "images" / "img_000001.png")


def test_timer():
    t = Timer()
    t.update_progress(0.5)
    assert t.est_total() >= t.elapsed()
    assert isinstance(t.str_est_finish(), str)


def test_enable_compile_cache(tmp_path, monkeypatch):
    from dasac_tpu.core.cache import enable_compile_cache

    assert enable_compile_cache("") is False
    target = tmp_path / "xla_cache"
    assert enable_compile_cache(str(target)) is True
    assert target.is_dir()
    import jax

    assert jax.config.jax_compilation_cache_dir == str(target)


def test_enable_repo_cache_targets_repo_root(tmp_path):
    """The shared bench/tools cache must resolve to <repo>/.jax_cache."""
    import jax

    import dasac_tpu
    from dasac_tpu.core.cache import enable_repo_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        assert enable_repo_cache() is True
        repo = os.path.dirname(os.path.dirname(
            os.path.abspath(dasac_tpu.__file__)))
        assert (jax.config.jax_compilation_cache_dir
                == os.path.join(repo, ".jax_cache"))
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
