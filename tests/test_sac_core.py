"""SAC core golden tests vs literal torch/numpy oracles of the reference
semantics (SURVEY.md §4: pseudo-label thresholding, running-conf EMA, focal
loss, EMA teacher)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasac_tpu.sac import core, refine

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


# ---------------------------------------------------------------------------
# pseudo labels
# ---------------------------------------------------------------------------

def _oracle_pseudo_labels(probs_bchw, ignore_augm, running_conf, upper, lower,
                          beta, discount):
    """Literal transcription of the reference's scatter/gt/sum formulation
    (models/sac.py:154-187) as a test oracle."""
    p = torch.from_numpy(probs_bchw)
    B, C, H, W = p.shape
    max_conf, max_idx = p.max(1, keepdim=True)
    peaks = torch.zeros_like(p)
    peaks.scatter_(1, max_idx, max_conf)
    top_peaks, _ = peaks.view(B, C, -1).max(-1)
    top_peaks *= upper
    if discount:
        disc = 1.0 - torch.exp(-torch.from_numpy(running_conf) / beta)
        top_peaks *= disc.view(1, C)
    top_peaks.clamp_(lower)
    over = peaks > top_peaks.view(B, C, 1, 1)
    ignore = over.sum(1, keepdim=True) != 1
    labels = max_idx.clone()
    labels[ignore] = 255
    labels = labels.squeeze(1)
    labels[torch.from_numpy(ignore_augm)] = 255
    return labels.numpy(), max_conf.squeeze(1).numpy()


def test_pseudo_labels_match_oracle():
    rng = np.random.RandomState(0)
    B, C, H, W = 3, 6, 12, 14
    logits = rng.randn(B, H, W, C).astype(np.float32) * 3
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    # zero out some pixels like padded regions do
    mass_zero = rng.rand(B, H, W) < 0.1
    probs = probs * ~mass_zero[..., None]
    ignore_augm = rng.rand(B, H, W) < 0.15
    running_conf = rng.uniform(0, 0.01, C).astype(np.float32)

    labels, max_conf, _ = core.pseudo_labels(
        jnp.asarray(probs), jnp.asarray(ignore_augm), jnp.asarray(running_conf),
        upper=0.75, lower=0.2, threshold_beta=1e-3, discount=True)

    probs_bchw = np.transpose(probs, (0, 3, 1, 2)).copy()
    ref_labels, ref_conf = _oracle_pseudo_labels(
        probs_bchw, ignore_augm, running_conf, 0.75, 0.2, 1e-3, True)

    np.testing.assert_array_equal(np.asarray(labels), ref_labels)
    np.testing.assert_allclose(np.asarray(max_conf), ref_conf, atol=1e-6)


def test_pseudo_labels_no_discount_and_floor():
    """With uniform high prior the discount saturates; the lower floor keeps
    weak predictions out."""
    probs = np.zeros((1, 2, 2, 3), np.float32)
    probs[0, 0, 0] = [0.9, 0.05, 0.05]   # confident class 0
    probs[0, 0, 1] = [0.15, 0.1, 0.05]   # weak class 0 (below floor 0.2)
    probs[0, 1, 0] = [0.1, 0.6, 0.3]     # confident class 1
    probs[0, 1, 1] = [0.0, 0.0, 0.0]     # zero mass
    rc = np.full(3, 0.9, np.float32)
    labels, _, _ = core.pseudo_labels(
        jnp.asarray(probs), jnp.zeros((1, 2, 2), bool), jnp.asarray(rc),
        upper=0.75, lower=0.2, threshold_beta=1e-3, discount=True)
    labels = np.asarray(labels)
    assert labels[0, 0, 0] == 0
    assert labels[0, 0, 1] == 255        # below the 0.2 floor
    assert labels[0, 1, 0] == 1          # 0.6 > max(0.75*0.6*disc~0.45, 0.2)
    assert labels[0, 1, 1] == 255


# ---------------------------------------------------------------------------
# running conf
# ---------------------------------------------------------------------------

def test_running_conf_update():
    beta = 1e-3
    rc = np.array([beta, 0.5, beta], np.float32)  # classes 0,2 still at init
    probs = np.zeros((1, 2, 2, 3), np.float32)
    probs[..., 0] = 0.3
    probs[..., 1] = 0.6
    # class 2 stays ~0 -> below tolerance, keeps EMA from init value
    new_rc = np.asarray(core.update_running_conf(
        jnp.asarray(rc), jnp.asarray(probs), 0.99, beta))
    assert abs(new_rc[0] - 0.3) < 1e-6           # new class copies avg
    assert abs(new_rc[1] - (0.99 * 0.5 + 0.01 * 0.6)) < 1e-6
    assert abs(new_rc[2] - 0.99 * beta) < 1e-7   # EMA toward 0


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def test_source_ce_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 8, 9, 5).astype(np.float32)
    labels = rng.randint(0, 5, (2, 8, 9)).astype(np.int32)
    labels[0, :2] = 255
    ours = float(core.cross_entropy_mean(jnp.asarray(logits), jnp.asarray(labels)))
    ref = TF.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels.astype(np.int64)),
        ignore_index=255, reduction="none").mean().item()
    assert abs(ours - ref) < 1e-6


def test_focal_ce_conf_matches_torch():
    rng = np.random.RandomState(2)
    B, H, W, C = 2, 6, 7, 4
    logits = rng.randn(B, H, W, C).astype(np.float32)
    labels = rng.randint(0, C, (B, H, W)).astype(np.int32)
    labels[1, 3:] = 255
    conf = rng.rand(B, H, W).astype(np.float32)
    rc = rng.uniform(0, 1, C).astype(np.float32)

    loss, per_class = core.focal_ce(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(conf),
        jnp.asarray(rc), p=3, use_conf=True)

    w = torch.from_numpy((1.0 - np.clip(rc, 0, None)) ** 3)
    ce = TF.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels.astype(np.int64)),
        weight=w, ignore_index=255, reduction="none")
    # literal reference semantics (sac.py:148): loss_ce [B,H,W] *
    # teacher_conf [B,1,H,W] broadcasts to [B,B,H,W] before .mean()
    ref = (ce * torch.from_numpy(conf)[:, None]).mean().item()
    assert abs(float(loss) - ref) < 1e-6

    # per-class diagnostic: mean over all pixels of ce restricted to class
    for c in range(C):
        mask = (labels == c)
        ref_c = (ce.numpy() * mask).sum() / labels.size
        assert abs(float(per_class[c]) - ref_c) < 1e-5


# ---------------------------------------------------------------------------
# EMA teacher with lazy init under jit
# ---------------------------------------------------------------------------

def test_maybe_update_teacher_phases():
    student = {"w": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([3.0])}
    teacher = {"w": jnp.asarray([0.0, 0.0]), "b": jnp.asarray([0.0])}
    rc = jnp.asarray([0.5, 0.5])
    beta = 1e-3

    f = jax.jit(lambda t, s, si, rc, do: core.maybe_update_teacher(
        t, s, si, rc, momentum=0.9, threshold_beta=beta, do_update=do))

    # no-op when do_update=False
    t1, si1, rc1, d1 = f(teacher, student, jnp.float32(0), rc, False)
    np.testing.assert_allclose(t1["w"], [0, 0])
    assert float(si1) == 0 and float(d1) > 0

    # first update: wholesale copy + running_conf reset
    t2, si2, rc2, d2 = f(teacher, student, jnp.float32(0), rc, True)
    np.testing.assert_allclose(t2["w"], [1, 2])
    np.testing.assert_allclose(rc2, [beta, beta])
    assert float(si2) == 1 and float(d2) == 0

    # subsequent update: EMA
    t3, si3, rc3, d3 = f(t2, {"w": jnp.asarray([2.0, 2.0]), "b": jnp.asarray([3.0])},
                         si2, rc2, True)
    np.testing.assert_allclose(t3["w"], [0.9 * 1 + 0.1 * 2, 2.0])
    np.testing.assert_allclose(rc3, [beta, beta])
    assert float(d3) > 0


# ---------------------------------------------------------------------------
# refinement
# ---------------------------------------------------------------------------

def test_refine_identity_affines_avg_pool():
    """With identity affines the refined map is the plain view average."""
    rng = np.random.RandomState(3)
    G, T, H, W, C = 2, 3, 8, 8, 4
    B = G * T
    logits = rng.randn(B, H, W, C).astype(np.float32)
    ident = np.tile(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32), (B, 1, 1))
    ignore = np.zeros((B, H, W), bool)

    refined, diags = refine.refine(
        jnp.asarray(logits), jnp.asarray(ident), jnp.asarray(ident),
        jnp.asarray(ignore), group_size=T)

    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    expected = probs.reshape(G, T, H, W, C).mean(1, keepdims=True)
    expected = np.broadcast_to(expected, (G, T, H, W, C)).reshape(B, H, W, C)
    np.testing.assert_allclose(np.asarray(refined), expected, atol=1e-5)


def test_refine_flip_consistency():
    """A flipped view's predictions fuse consistently: refined view equals
    the average computed in the reference frame warped back (here: flipped
    content must land on the right pixels)."""
    G, T, H, W, C = 1, 2, 8, 8, 2
    # view 0: class 0 on the left half; view 1 is flipped so class 0 on right
    base = np.zeros((H, W, C), np.float32)
    base[:, : W // 2, 0] = 8.0
    base[:, W // 2:, 1] = 8.0
    flipped = base[:, ::-1, :].copy()
    logits = np.stack([base, flipped], 0)

    ident = np.asarray([[1, 0, 0], [0, 1, 0]], np.float32)
    flip = np.asarray([[-1, 0, 0], [0, 1, 0]], np.float32)
    aff = np.stack([ident, flip])
    inv = np.stack([ident, flip])
    ignore = np.zeros((2, H, W), bool)

    refined, _ = refine.refine(
        jnp.asarray(logits), jnp.asarray(aff), jnp.asarray(inv),
        jnp.asarray(ignore), group_size=T)
    r = np.asarray(refined)
    # both views agree after alignment -> refined ~= own view's softmax
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    np.testing.assert_allclose(r, probs, atol=1e-4)


def test_minentropy_pool():
    G, T, H, W, C = 1, 2, 4, 4, 3
    sharp = np.zeros((H, W, C), np.float32)
    sharp[..., 0] = 0.98
    sharp[..., 1] = 0.01
    sharp[..., 2] = 0.01
    flat = np.full((H, W, C), 1.0 / 3, np.float32)
    probs = np.stack([flat, sharp])[None]
    pooled, valid = refine.minentropy_pool_views(jnp.asarray(probs))
    np.testing.assert_allclose(np.asarray(pooled[0, 0]), sharp, atol=1e-6)
    assert np.asarray(valid).min() == 1.0
