"""Device-side photometric augmentations (replaces the reference's PIL /
torchvision CPU path: tf_target.py:331-390, tf_seg.py ColorJitter/Blur).

All ops are batched, elementwise/VPU-friendly, and driven by jax.random keys:
  * color jitter with torchvision semantics (random factor ranges, random
    op order via a 4-step switch, p-gated per image)
  * random grayscale (p-gated)
  * gaussian blur with a per-image random radius (separable, static taps,
    edge padding; PIL treats radius as sigma)

Images are float32 RGB in [0, 1], layout [B, H, W, 3].
"""

import jax
import jax.numpy as jnp

# plain tuple: a module-level jnp array would initialize the device
# backend at import time (breaks late platform selection)
_GRAY = (0.299, 0.587, 0.114)


def _grayscale(img):
    g = jnp.tensordot(img, jnp.asarray(_GRAY, img.dtype), axes=[[-1], [0]])
    return g[..., None] * jnp.ones((3,), img.dtype)


def _blend(a, b, f):
    return jnp.clip(f * a + (1.0 - f) * b, 0.0, 1.0)


def adjust_brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def adjust_contrast(img, f, valid=None):
    # torchvision: blend with the mean of the grayscale image; ``valid``
    # [..., H, W] restricts the mean to real pixels (excludes warp padding)
    gray = jnp.tensordot(img, jnp.asarray(_GRAY, img.dtype), axes=[[-1], [0]])
    if valid is None:
        mean = jnp.mean(gray, axis=(-2, -1), keepdims=True)[..., None]
    else:
        v = valid.astype(img.dtype)
        mean = (jnp.sum(gray * v, axis=(-2, -1), keepdims=True)
                / jnp.maximum(jnp.sum(v, axis=(-2, -1), keepdims=True), 1.0)
                )[..., None]
    return _blend(img, jnp.broadcast_to(mean, img.shape), f)


def adjust_saturation(img, f):
    return _blend(img, _grayscale(img), f)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img, delta):
    h, s, v = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    return jnp.clip(_hsv_to_rgb((h + delta) % 1.0, s, v), 0.0, 1.0)


def color_jitter(key, img, strength, hue_strength, p=0.5, valid=None):
    """torchvision ColorJitter on a batch: per-image factors, random op
    order, applied with probability ``p`` per image.

    Args:
        img: [B, H, W, 3] float in [0,1].
        strength: brightness/contrast/saturation range half-width.
        valid: optional [B, H, W] bool — restricts the contrast mean to real
            pixels (source chain, where the reference jitters pre-padding).
    """
    b = img.shape[0]
    k_apply, k_f, k_h, k_ord = jax.random.split(key, 4)
    apply = jax.random.uniform(k_apply, (b,)) < p
    lo = max(0.0, 1.0 - strength)
    hi = 1.0 + strength
    factors = jax.random.uniform(k_f, (b, 3), minval=lo, maxval=hi)
    hues = jax.random.uniform(
        k_h, (b,), minval=-hue_strength, maxval=hue_strength)
    # random order: argsort of 4 uniforms per image
    order = jnp.argsort(jax.random.uniform(k_ord, (b, 4)), axis=-1)
    if valid is None:
        valid = jnp.ones(img.shape[:3], bool)

    def per_image(img_i, fac_i, hue_i, order_i, apply_i, valid_i):
        def body(carry, op_idx):
            x = carry
            x = jax.lax.switch(
                op_idx,
                [
                    lambda z: adjust_brightness(z, fac_i[0]),
                    lambda z: adjust_contrast(z, fac_i[1], valid_i),
                    lambda z: adjust_saturation(z, fac_i[2]),
                    lambda z: adjust_hue(z, hue_i),
                ],
                x,
            )
            return x, None
        out, _ = jax.lax.scan(body, img_i, order_i)
        return jnp.where(apply_i, out, img_i)

    return jax.vmap(per_image)(img, factors, hues, order, apply, valid)


def random_grayscale(key, img, p):
    b = img.shape[0]
    apply = jax.random.uniform(key, (b,)) < p
    return jnp.where(apply[:, None, None, None], _grayscale(img), img)


# gaussian blur: radius <= 2 in the reference -> 3-sigma support of 6 px
_BLUR_TAPS = 13  # center +- 6


def gaussian_blur(key, img, radius_range=(0.1, 2.0), valid=None):
    """Separable gaussian blur, per-image random sigma (tf_target.py:331-349:
    PIL GaussianBlur with radius ~ U[0.1, 2])."""
    b = img.shape[0]
    sigma = jax.random.uniform(
        key, (b,), minval=radius_range[0], maxval=radius_range[1])
    return gaussian_blur_sigma(img, sigma, valid=valid)


def gaussian_blur_sigma(img, sigma, taps=_BLUR_TAPS, valid=None):
    """Blur with per-image sigma [B] via 2 passes of ``taps`` shifted adds.

    Edge padding matches PIL's edge-extension behavior.  With ``valid``
    [B, H, W] the blur is renormalized over real pixels (blur(x*v)/blur(v)),
    so warp padding neither bleeds black into valid pixels nor vice versa
    (source chain: the reference blurs before RandCrop introduces padding).
    """
    half = taps // 2
    offs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (offs[None, :] / jnp.maximum(sigma[:, None], 1e-3)) ** 2)
    w = w / jnp.sum(w, axis=1, keepdims=True)  # [B, taps]

    def pass_axis(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (half, half)
        xp = jnp.pad(x, pad, mode="edge")
        out = jnp.zeros_like(x)
        size = x.shape[axis]
        for i in range(taps):
            sl = jax.lax.slice_in_dim(xp, i, i + size, axis=axis)
            wi = w[:, i].reshape((-1,) + (1,) * (x.ndim - 1))
            out = out + sl * wi
        return out

    x = img.astype(jnp.float32)
    if valid is not None:
        v = valid.astype(jnp.float32)[..., None]
        x = jnp.concatenate([x * v, v], axis=-1)  # blur value+mask together
    out = pass_axis(x, 1)
    out = pass_axis(out, 2)
    if valid is not None:
        out = out[..., :-1] / jnp.maximum(out[..., -1:], 1e-6)
        out = jnp.where(valid[..., None], out, img.astype(jnp.float32))
    return out.astype(img.dtype)


def normalize(img, mean, std):
    """(img - mean) / std with broadcast constants."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img.astype(jnp.float32) - mean) / std


def denormalize(img, mean, std):
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return img.astype(jnp.float32) * std + mean
