"""Inference engine + offline tools tests: export bit-compatibility,
multi-scale/flip averaging, IS-weight computation, trainId conversion."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dasac_tpu.data.category import trainid_to_cs_table
from dasac_tpu.data.synth import make_synthetic_root
from dasac_tpu.infer import engine
from dasac_tpu.nn.factory import build_model
from dasac_tpu.tools import compute_is_weights, convert_train_ids


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return make_synthetic_root(str(tmp_path_factory.mktemp("d")),
                               hw=(40, 56), n_val=3)


def _variables(model, hw):
    x = jnp.zeros((1, *hw, 3))
    return model.init({"params": jax.random.PRNGKey(0)}, x,
                      train=False, update_stats=False)


def test_run_inference_exports(root, tmp_path):
    model = build_model("tiny", 19)
    variables = _variables(model, (40, 56))
    ds = engine.InferDataset(root, "val_cityscapes")
    out = str(tmp_path / "masks")
    conf = engine.run_inference(
        model, variables, ds, out, mean=(0.485, 0.456, 0.406),
        std=(0.229, 0.224, 0.225), scales=(1.0,), verbose=False)
    assert conf is not None and conf.shape == (19, 19)

    for i in range(len(ds)):
        name = ds.name(i)
        # trainId export: paletted PNG whose pixel VALUES are trainIds
        pred = np.asarray(Image.open(os.path.join(out, name + ".png")))
        assert pred.dtype == np.uint8 and pred.shape == (40, 56)
        # cs export = LUT of the trainId export
        cs = np.asarray(Image.open(os.path.join(out, "cs", name + ".png")))
        np.testing.assert_array_equal(cs, trainid_to_cs_table()[pred])


def test_cityscapes_name_mapping(root):
    ds = engine.InferDataset(root, "val_cityscapes", cityscapes_names=True)
    assert "_leftImg8bit" not in ds.name(0)
    # names without the suffix pass through unchanged
    assert ds.name(0).startswith("val_")


def test_multiscale_flip_consistency():
    """flip-averaging of a left-right symmetric model output is idempotent;
    multi-scale averaging of constant maps preserves them."""
    model = build_model("tiny", 7)
    variables = _variables(model, (32, 32))
    img = (np.random.RandomState(0).rand(1, 32, 32, 3) * 255).astype(np.uint8)

    f1 = engine.make_infer_fn(model, (0.485, 0.456, 0.406),
                              (0.229, 0.224, 0.225), scales=(1.0,))
    f2 = engine.make_infer_fn(model, (0.485, 0.456, 0.406),
                              (0.229, 0.224, 0.225),
                              scales=(0.75, 1.0, 1.25), flip=True)
    p1 = np.asarray(f1(variables, jnp.asarray(img)))
    p2 = np.asarray(f2(variables, jnp.asarray(img)))
    assert p1.shape == p2.shape == (1, 32, 32, 7)
    np.testing.assert_allclose(p1.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(p2.sum(-1), 1.0, atol=1e-5)

    # flip averaging == explicit (forward(x) + unflip(forward(flip(x)))) / 2
    ff = engine.make_infer_fn(model, (0.485, 0.456, 0.406),
                              (0.229, 0.224, 0.225), scales=(1.0,), flip=True)
    pf = np.asarray(ff(variables, jnp.asarray(img)))
    p_fwd = np.asarray(f1(variables, jnp.asarray(img)))
    p_flip = np.asarray(f1(variables, jnp.asarray(img[:, :, ::-1, :].copy())))
    manual = 0.5 * (p_fwd + p_flip[:, :, ::-1, :])
    np.testing.assert_allclose(pf, manual, atol=1e-5)


def test_argmax_output_matches_probs_argmax():
    """``output="argmax"`` fuses the final argmax into the program (the
    full-res f32 volume never hits HBM); it must reproduce
    argmax(probs-program) exactly — in the single-scale unflipped case the
    softmax is additionally skipped (argmax-invariant), checked too."""
    model = build_model("tiny", 7)
    variables = _variables(model, (32, 48))
    img = (np.random.RandomState(2).rand(2, 32, 48, 3) * 255).astype(np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    for kw in (dict(scales=(1.0,)),                       # softmax-skip path
               dict(scales=(0.75, 1.0), flip=True),       # averaged, full
               dict(scales=(0.75, 1.0), flip=True, fuse="stride8")):
        fp = engine.make_infer_fn(model, mean, std, **kw)
        fa = engine.make_infer_fn(model, mean, std, output="argmax", **kw)
        probs = np.asarray(fp(variables, jnp.asarray(img)))
        labels = np.asarray(fa(variables, jnp.asarray(img)))
        assert labels.dtype == np.uint8 and labels.shape == (2, 32, 48), kw
        np.testing.assert_array_equal(labels, probs.argmax(-1).astype(
            np.uint8), err_msg=str(kw))


def test_flip_batching_bit_identical():
    """The flip forward is batched WITH the unflipped one (one 2B forward
    per scale instead of two sequential B forwards).  Samples are
    independent and BN is frozen, so this must reproduce the sequential
    formulation exactly — checked bitwise at batch 2 across two scales."""
    from dasac_tpu.aug import photometric as P
    from dasac_tpu.nn.functional import resize_bilinear_align_corners

    model = build_model("tiny", 7)
    variables = _variables(model, (32, 48))
    img = (np.random.RandomState(1).rand(2, 32, 48, 3) * 255).astype(np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    scales = (0.5, 1.0)

    fn = jax.jit(engine.make_infer_fn(model, mean, std, scales=scales,
                                      flip=True))
    got = np.asarray(fn(variables, jnp.asarray(img)))

    # sequential reference: one forward per view, never concatenated
    def fwd(xi, h, w):
        _, up = model.apply(variables, xi, train=False, update_stats=False)
        up = resize_bilinear_align_corners(up, (h, w))
        return jax.nn.softmax(up, axis=-1)

    x = P.normalize(jnp.asarray(img).astype(jnp.float32) / 255.0, mean, std)
    h, w = x.shape[1], x.shape[2]
    acc = 0.0
    for s in scales:
        xs = x if s == 1.0 else jax.image.resize(
            x, (x.shape[0], int(round(h * s)), int(round(w * s)), 3),
            "linear")
        acc = acc + fwd(xs, h, w)
        acc = acc + fwd(xs[:, :, ::-1, :], h, w)[:, :, ::-1, :]
    want = np.asarray(acc / (len(scales) * 2))

    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_compute_is_weights(tmp_path):
    d = tmp_path / "preds"
    d.mkdir()
    # image A: 100% class 0; image B: half class 0, half class 1
    Image.fromarray(np.zeros((10, 10), np.uint8)).save(d / "a.png")
    b = np.zeros((10, 10), np.uint8)
    b[5:] = 1
    Image.fromarray(b).save(d / "b.png")
    out = str(tmp_path / "w.data")
    stats = compute_is_weights.count(str(d), out=out, verbose=False)
    # class 0 pixels: a=100, b=50, total 150
    assert abs(stats["a.png"][0] - 100 / 150) < 1e-9
    assert abs(stats["b.png"][0] - 50 / 150) < 1e-9
    assert abs(stats["b.png"][1] - 1.0) < 1e-9
    # default fmt="auto" writes torch.save when torch is importable
    # (reference-compatible); load_sample_weights reads either format
    from dasac_tpu.data.sampler import load_sample_weights
    assert load_sample_weights(out) == stats


def test_compute_is_weights_pickle_format(tmp_path):
    d = tmp_path / "preds"
    d.mkdir()
    Image.fromarray(np.zeros((4, 4), np.uint8)).save(d / "a.png")
    out = str(tmp_path / "w.data")
    stats = compute_is_weights.count(str(d), out=out, verbose=False,
                                     fmt="pickle")
    with open(out, "rb") as f:
        assert pickle.load(f) == stats


def test_is_weights_torch_format_reference_roundtrip(tmp_path):
    """The ``--format torch`` output loads through the reference's OWN
    pipeline: ``torch.load`` (dataloader_target.py:85) followed by
    ``DataTarget.init_sampling`` (dataloader_target.py:146-198) — and the
    reference's cumulative per-class CDFs equal the ones our
    ImportanceSampler builds from the same file (interop both directions,
    closing the asymmetry where the reference could not read our pickle)."""
    torch = pytest.importorskip("torch")
    import sys
    import types

    from dasac_tpu.data.sampler import ImportanceSampler, load_sample_weights
    from dasac_tpu.utils.collections import AttrDict
    from tests.test_fullnet_torch_parity import (REF,
                                                 _install_torchvision_stub)

    # masks with known class content: 3 classes over 3 images
    d = tmp_path / "preds"
    d.mkdir()
    arrs = {
        "a.png": np.zeros((10, 10), np.uint8),                 # all class 0
        "b.png": np.full((10, 10), 1, np.uint8),               # all class 1
        "c.png": np.concatenate([np.zeros((5, 10), np.uint8),  # 0 + 2
                                 np.full((5, 10), 2, np.uint8)]),
    }
    for name, a in arrs.items():
        Image.fromarray(a).save(d / name)
    out = str(tmp_path / "w.data")
    compute_is_weights.count(str(d), out=out, verbose=False,
                             num_classes=3, fmt="torch")

    # --- the reference's exact load call -------------------------------
    loaded = torch.load(out)

    # --- the reference's own init_sampling on the loaded weights -------
    _install_torchvision_stub()
    tv = sys.modules["torchvision"]
    for name in ("torchvision.transforms",
                 "torchvision.transforms.functional"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.transforms.functional = sys.modules[
        "torchvision.transforms.functional"]
    for pkg_name, path in (("datasets", REF + "/datasets"),
                           ("tools", REF + "/tools")):
        mod = sys.modules.get(pkg_name)
        if mod is None or not getattr(mod, "__path__", None):
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [path]
            sys.modules[pkg_name] = pkg
    import datasets.dataloader_target as ref_dt  # noqa: E402

    names = sorted(arrs)  # the split order: a, b, c
    dt = ref_dt.DataTarget.__new__(ref_dt.DataTarget)
    dt.num_classes = 3
    dt.sample_index = {n: i for i, n in enumerate(names)}
    cfg = AttrDict()
    cfg.VAL = AttrDict()
    cfg.VAL.IGNORE_CLASS = []
    dt.cfg = cfg
    groups = dt.init_sampling(len(names), loaded, prior_weight=0.25)

    ours = ImportanceSampler(len(names), num_classes=3, mask_names=names,
                             weights=load_sample_weights(out),
                             prior_weight=0.25)
    for cid in range(3):
        np.testing.assert_allclose(np.asarray(groups[cid]),
                                   ours._cum[cid], rtol=0, atol=1e-12,
                                   err_msg="class %d CDF" % cid)
    # and the weighting really is non-uniform (class 2 mass sits on c.png)
    assert groups[2][0] == pytest.approx(0.25 / 3)
    assert groups[2][2] - groups[2][1] == pytest.approx(0.25 / 3 + 0.75)


def test_is_weights_feed_sampler(tmp_path):
    from dasac_tpu.data import sampler

    d = tmp_path / "preds"
    d.mkdir()
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(d / "x.png")
    y = np.full((8, 8), 2, np.uint8)
    Image.fromarray(y).save(d / "y.png")
    stats = compute_is_weights.count(str(d), verbose=False)
    imp = sampler.ImportanceSampler(
        2, num_classes=3, mask_names=["x.png", "y.png"], weights=stats,
        prior_weight=0.25)
    rng = np.random.RandomState(0)
    draws = [imp.sample(2, rng) for _ in range(500)]  # class 2 -> image y
    assert np.mean(np.asarray(draws) == 1) > 0.8


def test_convert_train_ids(tmp_path):
    src = tmp_path / "raw" / "sub"
    src.mkdir(parents=True)
    raw = np.array([[7, 26], [0, 99]], np.uint8)
    Image.fromarray(raw).save(src / "m.png")
    out = tmp_path / "out"
    n = convert_train_ids.preprocess("gta", str(tmp_path / "raw"), str(out),
                                     verbose=False)
    assert n == 1
    conv = np.asarray(Image.open(out / "sub" / "m.png"))
    assert conv.tolist() == [[0, 13], [255, 255]]


def test_mesh_parallel_inference_matches_single(root, tmp_path):
    """run_inference sharded over the 8-device CPU mesh (batch=4, tail
    padded) produces the same confusion matrix and exported masks as the
    batch-1 single-device path (the reference's nn.DataParallel analogue)."""
    model = build_model("tiny", 19)
    variables = _variables(model, (40, 56))
    ds = engine.InferDataset(root, "val_cityscapes")  # 3 images -> pad to 4
    out1 = str(tmp_path / "m1")
    out4 = str(tmp_path / "m4")
    kw = dict(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
              scales=(1.0,), verbose=False)
    conf1 = engine.run_inference(model, variables, ds, out1,
                                 batch_size=1, **kw)
    conf4 = engine.run_inference(model, variables, ds, out4,
                                 batch_size=4, **kw)
    assert len(jax.devices()) >= 4  # the sharded path really had a mesh
    np.testing.assert_allclose(conf1, conf4, atol=1e-3)
    for i in range(len(ds)):
        a = np.asarray(Image.open(os.path.join(out1, ds.name(i) + ".png")))
        b = np.asarray(Image.open(os.path.join(out4, ds.name(i) + ".png")))
        np.testing.assert_array_equal(a, b)


def test_multi_image_per_chip_inference_matches_single(root, tmp_path):
    """batch_size ABOVE the device count stacks several images per chip
    (the serving throughput dial, infer_val.py --batch; +21% measured on
    the real chip, PARITY.md): results must equal the batch-1 path with
    the tail padded out (3 images, batch 16 -> 8 chips x 2)."""
    model = build_model("tiny", 19)
    variables = _variables(model, (40, 56))
    ds = engine.InferDataset(root, "val_cityscapes")
    out1 = str(tmp_path / "b1")
    out16 = str(tmp_path / "b16")
    kw = dict(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
              scales=(1.0,), verbose=False)
    conf1 = engine.run_inference(model, variables, ds, out1,
                                 batch_size=1, **kw)
    assert len(jax.devices()) == 8
    mesh, _, b, _ = engine.infer_mesh(16, 0)
    assert mesh.devices.shape == (8,) and b == 16  # 2 images per chip
    conf16 = engine.run_inference(model, variables, ds, out16,
                                  batch_size=16, **kw)
    np.testing.assert_allclose(conf1, conf16, atol=1e-3)
    for i in range(len(ds)):
        a = np.asarray(Image.open(os.path.join(out1, ds.name(i) + ".png")))
        b = np.asarray(Image.open(os.path.join(out16, ds.name(i) + ".png")))
        np.testing.assert_array_equal(a, b)


def test_infer_dataset_static_shape(root):
    """Every sample decodes to ONE canonical shape (no per-image recompile)."""
    ds = engine.InferDataset(root, "val_cityscapes")
    shapes = {ds.load(i)[0].shape for i in range(len(ds))}
    assert len(shapes) == 1


def test_spatial_sharded_inference_matches_batch(root, tmp_path):
    """spatial=True shards the image HEIGHT over the mesh (GSPMD conv halo
    exchanges); the result must equal the batch-sharded path exactly —
    no reference counterpart (nn.DataParallel can only split batches)."""
    model = build_model("tiny", 19)
    variables = _variables(model, (40, 56))
    ds = engine.InferDataset(root, "val_cityscapes")
    out_b = str(tmp_path / "batch")
    out_s = str(tmp_path / "spatial")
    kw = dict(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
              scales=(1.0,), verbose=False)
    conf_b = engine.run_inference(model, variables, ds, out_b,
                                  batch_size=1, **kw)
    conf_s = engine.run_inference(model, variables, ds, out_s,
                                  spatial=True, **kw)
    assert len(jax.devices()) >= 4
    np.testing.assert_allclose(conf_b, conf_s, atol=1e-3)
    for i in range(len(ds)):
        a = np.asarray(Image.open(os.path.join(out_b, ds.name(i) + ".png")))
        b = np.asarray(Image.open(os.path.join(out_s, ds.name(i) + ".png")))
        np.testing.assert_array_equal(a, b)


def test_infer_mesh_layout_contract():
    """engine.infer_mesh is the single source of truth for the serving
    layouts (run_inference AND tools/bench_infer): batch trims devices
    down to a small batch / trims the batch down to a mesh multiple;
    spatial honors an explicit smaller batch by trimming the data axis."""
    import pytest

    from dasac_tpu.infer.engine import infer_mesh

    assert len(jax.devices()) == 8
    mesh, _, b, n_sp = infer_mesh(None, 0)        # pure batch, default b
    assert mesh.devices.shape == (8,) and b == 8 and n_sp == 0
    mesh, _, b, _ = infer_mesh(4, 0)              # small batch trims devices
    assert mesh.devices.shape == (4,) and b == 4
    mesh, _, b, _ = infer_mesh(12, 0)             # non-multiple trims batch
    assert mesh.devices.shape == (8,) and b == 8
    mesh, _, b, n_sp = infer_mesh(None, True)     # pure spatial (bool compat)
    assert mesh.devices.shape == (1, 8) and b == 1 and n_sp == 8
    mesh, _, b, n_sp = infer_mesh(None, -1)       # pure spatial (CLI const)
    assert mesh.devices.shape == (1, 8) and b == 1 and n_sp == 8
    mesh, _, b, n_sp = infer_mesh(None, 4)        # combined
    assert mesh.devices.shape == (2, 4) and b == 2 and n_sp == 4
    mesh, _, b, _ = infer_mesh(1, 4)              # explicit b=1 trims data
    assert mesh.devices.shape == (1, 4) and b == 1
    with pytest.raises(AssertionError, match="must divide"):
        infer_mesh(None, 3)


def test_combined_data_spatial_inference_matches_batch(root, tmp_path):
    """spatial=N builds a combined (devices/N, N) mesh: N chips cooperate
    per frame while devices/N frames run in parallel — the
    throughput/latency dial between the pure batch and pure spatial modes.
    Results must equal the batch path exactly (divisible height)."""
    model = build_model("tiny", 19)
    variables = _variables(model, (40, 56))
    ds = engine.InferDataset(root, "val_cityscapes")
    out_b = str(tmp_path / "batch")
    out_c = str(tmp_path / "combined")
    kw = dict(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
              scales=(1.0,), verbose=False)
    conf_b = engine.run_inference(model, variables, ds, out_b,
                                  batch_size=1, **kw)
    assert len(jax.devices()) == 8
    conf_c = engine.run_inference(model, variables, ds, out_c,
                                  spatial=4, **kw)  # (2, 4) mesh
    np.testing.assert_allclose(conf_b, conf_c, atol=1e-3)
    for i in range(len(ds)):
        a = np.asarray(Image.open(os.path.join(out_b, ds.name(i) + ".png")))
        c = np.asarray(Image.open(os.path.join(out_c, ds.name(i) + ".png")))
        np.testing.assert_array_equal(a, c)


def test_spatial_inference_pads_non_divisible_height(tmp_path):
    """GTA's canonical 1052-px height does not tile an 8-device mesh; the
    spatial path must pad/slice instead of crashing device_put (the batch
    path is immune).  Pad-and-slice means the forward runs at a marginally
    taller canvas, so align_corners interpolation positions shift slightly
    (sub-pixel) everywhere — with RANDOM weights that flips a noticeable
    share of argmaxes, with trained weights predictions are essentially
    unchanged.  Exact equality at divisible sizes is asserted by
    test_spatial_sharded_inference_matches_batch."""
    root = make_synthetic_root(str(tmp_path / "d42"), hw=(42, 56), n_val=2)
    model = build_model("tiny", 19)
    variables = _variables(model, (42, 56))
    ds = engine.InferDataset(root, "val_cityscapes")
    assert ds.out_hw[0] % len(jax.devices()) != 0
    kw = dict(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
              scales=(1.0,), verbose=False)
    conf_b = engine.run_inference(model, variables, ds,
                                  str(tmp_path / "b"), batch_size=1, **kw)
    conf_s = engine.run_inference(model, variables, ds,
                                  str(tmp_path / "s"), spatial=True, **kw)
    for i in range(len(ds)):
        a = np.asarray(Image.open(
            os.path.join(str(tmp_path / "b"), ds.name(i) + ".png")))
        bm = np.asarray(Image.open(
            os.path.join(str(tmp_path / "s"), ds.name(i) + ".png")))
        assert bm.shape == a.shape == (42, 56)
        agree = float(np.mean(a == bm))
        assert agree > 0.8, agree  # random-weights sub-pixel-shift flips
    assert abs(float(conf_b.sum()) - float(conf_s.sum())) < 1e-3


def test_spatial_with_multiscale_flip(root, tmp_path):
    """Spatial sharding composes with the multi-scale+flip protocol (the
    internal resizes reshard under GSPMD); results match the batch path."""
    model = build_model("tiny", 19)
    variables = _variables(model, (40, 56))
    ds = engine.InferDataset(root, "val_cityscapes")
    kw = dict(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
              scales=(0.75, 1.0), flip=True, verbose=False)
    conf_b = engine.run_inference(model, variables, ds,
                                  str(tmp_path / "b"), batch_size=1, **kw)
    conf_s = engine.run_inference(model, variables, ds,
                                  str(tmp_path / "s"), spatial=True, **kw)
    np.testing.assert_allclose(conf_b, conf_s, atol=1e-3)


def test_fuse_stride8_single_scale_exactness():
    """fuse='stride8' at scales=(1.0,) == upsample(softmax(raw logits)):
    the ONLY change vs 'full' is softmax before vs after the final
    upsample (make_infer_fn docstring)."""
    from dasac_tpu.aug import photometric as P
    from dasac_tpu.nn.functional import resize_bilinear_align_corners

    model = build_model("tiny", 7)
    variables = _variables(model, (32, 48))
    img = (np.random.RandomState(2).rand(1, 32, 48, 3) * 255).astype(np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    fn = jax.jit(engine.make_infer_fn(model, mean, std, scales=(1.0,),
                                      fuse="stride8"))
    got = np.asarray(fn(variables, jnp.asarray(img)))

    x = P.normalize(jnp.asarray(img).astype(jnp.float32) / 255.0, mean, std)
    raw, _ = model.apply(variables, x, train=False, update_stats=False)
    want = np.asarray(resize_bilinear_align_corners(
        jax.nn.softmax(raw, axis=-1), (32, 48)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # bilinear mixing of simplex vectors stays on the simplex
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_fuse_stride8_multiscale_flip_manual():
    """stride-8 fusion with scales+flip == the manual per-view
    recomputation: every scale's raw logits resampled (align-corners) to
    the LARGEST scale's stride-8 grid, softmaxed + flip/scale-averaged
    there, upsampled once at the end."""
    from dasac_tpu.aug import photometric as P
    from dasac_tpu.nn.functional import resize_bilinear_align_corners

    model = build_model("tiny", 7)
    variables = _variables(model, (32, 48))
    img = (np.random.RandomState(3).rand(2, 32, 48, 3) * 255).astype(np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    scales = (0.5, 1.0)

    fn = jax.jit(engine.make_infer_fn(model, mean, std, scales=scales,
                                      flip=True, fuse="stride8"))
    got = np.asarray(fn(variables, jnp.asarray(img)))

    x = P.normalize(jnp.asarray(img).astype(jnp.float32) / 255.0, mean, std)
    h, w = x.shape[1], x.shape[2]

    def raw(xi):
        lg, _ = model.apply(variables, xi, train=False, update_stats=False)
        return lg

    tgt = raw(x).shape[1:3]  # largest scale's stride-8 grid
    acc = 0.0
    for s in scales:
        xs = x if s == 1.0 else jax.image.resize(
            x, (x.shape[0], int(round(h * s)), int(round(w * s)), 3),
            "linear")
        p = jax.nn.softmax(
            resize_bilinear_align_corners(raw(xs), tgt), axis=-1)
        pm = jax.nn.softmax(
            resize_bilinear_align_corners(raw(xs[:, :, ::-1, :]), tgt),
            axis=-1)
        acc = acc + p + pm[:, :, ::-1, :]
    want = np.asarray(resize_bilinear_align_corners(
        acc / (len(scales) * 2), (h, w)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fuse_stride8_agreement_with_full():
    """The two fusion points may differ only in label-boundary bands
    (softmax/bilinear reorder) — on a structured input the argmax maps
    must agree almost everywhere and the probabilities stay close."""
    model = build_model("tiny", 7)
    variables = _variables(model, (64, 96))
    # structured frame: large constant-color regions -> large-region preds
    rng = np.random.RandomState(4)
    img = np.zeros((1, 64, 96, 3), np.uint8)
    for i in range(4):
        for j in range(6):
            img[:, i * 16:(i + 1) * 16, j * 16:(j + 1) * 16] = rng.randint(
                0, 255, 3)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    kw = dict(scales=(0.5, 1.0), flip=True)

    pf = np.asarray(jax.jit(engine.make_infer_fn(
        model, mean, std, fuse="full", **kw))(variables, jnp.asarray(img)))
    ps = np.asarray(jax.jit(engine.make_infer_fn(
        model, mean, std, fuse="stride8", **kw))(variables,
                                                 jnp.asarray(img)))
    assert pf.shape == ps.shape
    agree = float(np.mean(pf.argmax(-1) == ps.argmax(-1)))
    assert agree > 0.9, agree
    assert float(np.abs(pf - ps).mean()) < 0.02


def test_run_inference_fuse_stride8_exports_and_raw(root, tmp_path):
    """run_inference(fuse='stride8') exports the same artifact set; the
    save_raw path (the only consumer of the full probability readback
    after the device-side-argmax change) round-trips."""
    model = build_model("tiny", 19)
    variables = _variables(model, (40, 56))
    ds = engine.InferDataset(root, "val_cityscapes")
    out = str(tmp_path / "masks")
    conf = engine.run_inference(
        model, variables, ds, out, mean=(0.485, 0.456, 0.406),
        std=(0.229, 0.224, 0.225), scales=(0.5, 1.0), flip=True,
        fuse="stride8", save_raw=True, verbose=False)
    assert conf is not None and conf.shape == (19, 19)
    for i in range(len(ds)):
        name = ds.name(i)
        pred = np.asarray(Image.open(os.path.join(out, name + ".png")))
        assert pred.shape == (40, 56) and pred.dtype == np.uint8
        raw = np.load(os.path.join(out, "raw", name + ".npz"))["raw"]
        assert raw.shape == (40, 56, 19) and raw.dtype == np.float16
        # the exported mask IS the argmax of the exported probabilities
        # (device argmax == host argmax; f16 rounding may flip near-ties)
        agree = float(np.mean(raw.argmax(-1) == pred))
        assert agree > 0.99, agree
