"""Affine bookkeeping for the multi-view consistency pipeline.

Builds the forward/inverse 2x3 view->reference matrices from per-view
similarity parameters (dy, dx, alpha, scale, flip) with the exact math of the
reference (``datasets/dataloader_target.py:220-262``), vectorized over views.
``alpha`` (rotation) is always 0 in the reference pipeline but kept for parity.

Convention: ``affine`` maps reference-frame normalized coords to view coords,
so ``grid_sample(view_probs, affine_grid(affine))`` aligns a view's
predictions into the reference frame (``models/sac.py:289-290``), and
``affine_inv`` maps back.
"""

import jax.numpy as jnp

IDENTITY_PARAMS = (0.0, 0.0, 0.0, 1.0, 1.0)  # dy, dx, alpha, scale, flip


def build_affine(params, crop_hw):
    """params [T,5] (dy,dx,alpha,scale,flip) -> affine [T,2,3].

    ``dy``/``dx`` are the crop-center displacements in pixels, ``scale`` the
    recorded 1/zoom, ``flip`` +-1.  Matches dataloader_target.py:220-246
    including the aspect-ratio coupling and the ``crop//2`` normalization.
    """
    params = jnp.asarray(params, jnp.float32)
    dy, dx, alpha, scale, flip = (params[:, i] for i in range(5))
    ch, cw = float(crop_hw[0]), float(crop_hw[1])
    aspect = ch / cw

    rad = alpha * jnp.pi / 180.0
    sin, cos = jnp.sin(rad), jnp.cos(rad)

    a00 = flip * cos
    a01 = sin * aspect
    a10 = -sin / aspect
    a11 = cos
    # translation: -(R^T t), then normalized by half crop extents
    t0 = -(cos * dx + sin * dy) / float(int(cw) // 2)
    t1 = -(-sin * dx + cos * dy) / float(int(ch) // 2)

    affine = jnp.stack(
        [jnp.stack([a00, a01, t0], -1), jnp.stack([a10, a11, t1], -1)], axis=1
    )
    return affine * scale[:, None, None]


def build_affine_inv(affine, params, crop_hw):
    """Inverse matrices (dataloader_target.py:248-262).

    Exact inverse for alpha=0 (the only case exercised); for alpha!=0 it
    reproduces the reference's aspect-coupled approximation.
    """
    params = jnp.asarray(params, jnp.float32)
    scale = params[:, 3]
    ch, cw = float(crop_hw[0]), float(crop_hw[1])
    aspect = ch / cw

    i00 = affine[:, 0, 0]
    i11 = affine[:, 1, 1]
    i01 = affine[:, 1, 0] * aspect**2
    i10 = affine[:, 0, 1] / aspect**2
    i02 = -(i00 * affine[:, 0, 2] + i01 * affine[:, 1, 2])
    i12 = -(i10 * affine[:, 0, 2] + i11 * affine[:, 1, 2])

    inv = jnp.stack(
        [jnp.stack([i00, i01, i02], -1), jnp.stack([i10, i11, i12], -1)], axis=1
    )
    return inv / (scale**2)[:, None, None]


def compose(a, b):
    """Compose two [.., 2, 3] affines: result(x) = a(b(x)) on homogeneous coords."""
    a_lin, a_t = a[..., :2], a[..., 2]
    b_lin, b_t = b[..., :2], b[..., 2]
    lin = jnp.einsum("...ij,...jk->...ik", a_lin, b_lin)
    t = jnp.einsum("...ij,...j->...i", a_lin, b_t) + a_t
    return jnp.concatenate([lin, t[..., None]], axis=-1)


def to3x3(a):
    """[.., 2, 3] -> [.., 3, 3] homogeneous."""
    pad = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0]), a.shape[:-2] + (1, 3)
    )
    return jnp.concatenate([a, pad], axis=-2)
