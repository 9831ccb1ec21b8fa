"""Data-layer tests: split lists, epoch sampler, importance sampling
distribution, prefetch loader determinism."""

import numpy as np
import pytest

from dasac_tpu.data import host_loader, lists, sampler
from dasac_tpu.data.synth import make_synthetic_root


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return make_synthetic_root(str(tmp_path_factory.mktemp("d")),
                               hw=(32, 40), n_train_src=6, n_train_tgt=5,
                               n_val=3)


def test_read_split(root):
    imgs, msks = lists.read_split(root, "train_game_9K")
    assert len(imgs) == 6 and all(m is not None for m in msks)


def test_epoch_sampler_determinism_and_sharding():
    s = sampler.EpochSampler(10, shuffle=True, seed=3)
    s.set_epoch(2)
    a = s.indices()
    b = s.indices()
    np.testing.assert_array_equal(a, b)
    s.set_epoch(3)
    assert not np.array_equal(a, s.indices())
    # rank sharding covers all samples exactly once (padded)
    shards = []
    for r in range(2):
        sr = sampler.EpochSampler(10, num_replicas=2, rank=r, seed=3)
        sr.set_epoch(2)
        shards.append(sr.indices())
    allidx = np.concatenate(shards)
    assert len(allidx) == 10
    assert set(allidx) == set(range(10))


def test_epoch_sampler_batch_block_slicing_reproduces_solo_batches():
    """indices(batch_size=b): concatenating the R ranks' batch-i slices in
    rank order must equal the single-process batch i (this is what makes
    the pod trajectory identical to the solo one)."""
    n, R, b = 19, 4, 2
    solo = sampler.EpochSampler(n, seed=7, drop_last=True)
    solo.set_epoch(5)
    solo_idx = solo.indices(batch_size=R * b)
    ranks = []
    for r in range(R):
        sr = sampler.EpochSampler(n, num_replicas=R, rank=r, seed=7,
                                  drop_last=True)
        sr.set_epoch(5)
        ranks.append(sr.indices(batch_size=b).reshape(-1, b))
    nb = ranks[0].shape[0]
    assembled = np.concatenate(ranks, axis=1).reshape(nb * R * b)
    np.testing.assert_array_equal(assembled, solo_idx)
    # padded (drop_last=False) variant still covers every sample
    full = np.concatenate([
        sampler.EpochSampler(n, num_replicas=R, rank=r, seed=7)
        .indices(batch_size=b) for r in range(R)])
    assert set(full) == set(range(n))


def test_importance_sampler_uniform_without_weights():
    imp = sampler.ImportanceSampler(4, num_classes=3)
    rng = np.random.RandomState(0)
    draws = [imp.sample(i, rng) for i in range(3000)]
    counts = np.bincount(draws, minlength=4)
    assert (np.abs(counts / 3000 - 0.25) < 0.05).all()


def test_importance_sampler_weighted():
    names = ["a.png", "b.png", "c.png", "d.png"]
    # class 0 pixels live almost entirely in image b
    weights = {"b.png": {0: 1.0}, "a.png": {1: 1.0},
               "c.png": {1: 0.0}, "d.png": {2: 1.0}}
    imp = sampler.ImportanceSampler(
        4, num_classes=3, mask_names=names, weights=weights,
        prior_weight=0.2)
    rng = np.random.RandomState(1)
    # indices congruent to 0 mod 3 sample class 0 -> mostly image 1 (b)
    draws = [imp.sample(0, rng) for _ in range(2000)]
    frac_b = np.mean(np.asarray(draws) == 1)
    assert frac_b > 0.7, frac_b
    # ignored classes fall back to uniform
    imp2 = sampler.ImportanceSampler(
        4, num_classes=3, mask_names=names, weights=weights,
        prior_weight=0.2, ignore_class=(0,))
    draws2 = [imp2.sample(0, rng) for _ in range(2000)]
    counts = np.bincount(draws2, minlength=4) / 2000
    assert (np.abs(counts - 0.25) < 0.06).all()


def test_prefetch_loader_batches(root):
    imgs, msks = lists.read_split(root, "train_game_9K")
    ds = host_loader.SegDataset(imgs, msks, (32, 40), mode="resize")
    order = np.arange(len(ds))
    loader = host_loader.PrefetchLoader(
        ds, 2, 3, host_loader.make_plain_index_fn(order, 2), threads=2)
    batches = list(loader)
    assert len(batches) == 3
    for bi, (im, mk) in enumerate(batches):
        assert im.shape == (2, 32, 40, 3) and im.dtype == np.uint8
        assert mk.shape == (2, 32, 40)
    # deterministic across iterations
    batches2 = list(loader)
    np.testing.assert_array_equal(batches[0][0], batches2[0][0])


def test_padding_sample():
    ds = host_loader.SegDataset([], [], (8, 8))
    im, mk = ds.load(-1)
    assert (mk == 255).all() and (im == 0).all()


def test_center_crop_mode(root):
    imgs, msks = lists.read_split(root, "val_cityscapes")
    ds = host_loader.SegDataset(imgs, msks, (16, 16), mode="center_crop")
    im, mk = ds.load(0)
    assert im.shape == (16, 16, 3)
    # crop larger than source pads with ignore
    ds2 = host_loader.SegDataset(imgs, msks, (64, 64), mode="center_crop")
    im2, mk2 = ds2.load(0)
    assert (mk2[0, :] == 255).all()


def test_bundled_reference_split_lists(tmp_path):
    """The 8 author-curated reference lists ship verbatim in <repo>/data and
    resolve through read_split when DATASET.ROOT has no local copy
    (reference datasets/__init__.py:21-27; val2_cityscapes is the 500-image
    checkpoint-selection set that cannot be regenerated)."""
    expected = {
        "train_game_9K": 9000, "val_game_1K": 1000,
        "train_synthia_9K": 9400, "val_synthia": 400,
        "train_cityscapes": 2975, "val_cityscapes": 500,
        "val2_cityscapes": 500, "test_cityscapes": 1525,
    }
    root = str(tmp_path)  # a root without lists -> bundled fallback
    for split, n in expected.items():
        imgs, msks = lists.read_split(root, split, must_exist=False)
        assert len(imgs) == n, split
        assert all(i.startswith(root) for i in imgs), split
    _, msks = lists.read_split(root, "val2_cityscapes", must_exist=False)
    assert all(m is not None for m in msks)
    # a local list still takes precedence over the bundled copy
    with open(tmp_path / "val_synthia.txt", "w") as f:
        f.write("a.png b.png\n")
    imgs, _ = lists.read_split(root, "val_synthia", must_exist=False)
    assert len(imgs) == 1


def test_prefetch_loader_propagates_decode_error():
    """A corrupt/unreadable file must raise in the consumer, not hang the
    job (the producer thread forwards its exception through the queue)."""
    ds = host_loader.SegDataset(["/nonexistent_dir/x.png"], [None], (8, 8))
    loader = host_loader.PrefetchLoader(
        ds, 1, 1, host_loader.make_plain_index_fn([0], 1), threads=1)
    with pytest.raises(Exception):
        list(loader)


def test_pil_palette_mask_fallback(tmp_path):
    """The PIL fallback reads P-mode masks as palette INDICES (matching the
    native decoder), not palette-color luminance."""
    from PIL import Image

    mask = np.random.RandomState(0).randint(0, 19, (16, 16)).astype(np.uint8)
    p = Image.fromarray(mask, mode="P")
    pal = np.zeros(768, np.uint8)
    pal[:57] = np.arange(57) * 4  # distinct colors so luminance != index
    p.putpalette(pal.tolist())
    fp = str(tmp_path / "m.png")
    p.save(fp)
    ip = str(tmp_path / "i.png")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(ip)
    # mode="native" skips the C++ decoder -> exercises the PIL path
    _, nm = host_loader._load_pair(ip, fp, None, "native")
    np.testing.assert_array_equal(nm, mask)


def test_native_loader_gate():
    """TPU.NATIVE_LOADER gates the C++ decoder (config key was previously a
    silent no-op)."""
    from dasac_tpu.data import native

    before = native.available()
    try:
        native.set_enabled(False)
        assert native.available() is False
        assert native.decode_pair("x.png", None, (8, 8)) is None
    finally:
        native.set_enabled(True)
    assert native.available() == before


def test_target_sampler_stream_independent(root):
    """The target shuffle at epoch e must differ from the source shuffle at
    epoch e+1 (seed+1 collided: same length after set_num_samples)."""
    from dasac_tpu.data import sampler

    n, seed = 6, 0
    src = sampler.EpochSampler(n, shuffle=True, seed=seed)
    tgt = sampler.EpochSampler(n, shuffle=True, seed=seed + 1_000_003)
    collisions = 0
    for e in range(6):
        tgt.set_epoch(e)
        src.set_epoch(e + 1)
        if np.array_equal(tgt.indices(), src.indices()):
            collisions += 1
    assert collisions == 0


def test_padded_plain_loader_distributed_partition(tmp_path):
    """Multi-host val decode: across ranks the real indices partition the
    dataset exactly (disjoint, complete), every rank sees the same batch
    count, and dummies (-1) are all-ignore (the pod dedup contract)."""
    from PIL import Image

    from dasac_tpu.data import host_loader

    n, bs, reps = 7, 2, 3
    imgs, msks = [], []
    for i in range(n):
        p = str(tmp_path / ("i%d.png" % i))
        m = str(tmp_path / ("m%d.png" % i))
        Image.fromarray(np.full((8, 8, 3), i, np.uint8)).save(p)
        Image.fromarray(np.full((8, 8), i, np.uint8)).save(m)
        imgs.append(p)
        msks.append(m)
    ds = host_loader.SegDataset(imgs, msks, (8, 8))

    seen, counts = [], []
    for rank in range(reps):
        loader = host_loader.padded_plain_loader(
            ds, bs, threads=1, prefetch=1, num_replicas=reps, rank=rank)
        got = []
        batches = 0
        for bi, (bimgs, bmsks) in enumerate(loader):
            assert bimgs.shape == (bs, 8, 8, 3)
            for k in range(bs):
                if (bmsks[k] == 255).all():   # dummy
                    assert (bimgs[k] == 0).all()
                else:
                    got.append(int(bimgs[k, 0, 0, 0]))
            batches += 1
        assert loader.n_real == len(got)
        seen.append(got)
        counts.append(batches)
    assert len(set(counts)) == 1, counts        # same batch count per rank
    flat = sorted(sum(seen, []))
    assert flat == list(range(n)), (flat, seen)  # disjoint + complete
