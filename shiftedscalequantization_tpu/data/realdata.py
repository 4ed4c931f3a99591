"""Real + procedural datasets for on-device accuracy experiments.

The north-star metric is accuracy recovery on genuinely TRAINED weights
(the reference's entire validation story is ImageNet top-1,
/root/reference/README.md:20-27), but this environment has no dataset
mounts, no pretrained checkpoints, and no network. Two datasets make a
real accuracy story possible anyway (see ACCURACY.md):

  * ``digits``: sklearn's bundled REAL handwritten-digit images (1797
    samples, 8x8 grayscale, 10 classes — the classic UCI/NIST test set)
    upsampled to 32x32 RGB. Real data, deterministic train/test split.
  * ``synth10``: a seeded procedural 10-class 32x32x3 shape/texture
    dataset rendered ON DEVICE from a PRNG key (circle / square /
    triangle / ring / cross / diamond / two-dots x solid / striped).
    Class identity is carried ONLY by geometry + texture; position,
    scale, rotation, color, background and pixel noise are nuisance
    variables, so a classifier must learn genuine shape invariances.
    The train stream is infinite (a fresh sample per key), so test
    accuracy is true generalization, and the 32x32x3 shapes exercise
    the exact CIFAR-10 pipeline configs of the reference
    (main_cifar10.py, ShiftedScaleQuant.py --dataset cifar10).
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# digits (real data)
# ---------------------------------------------------------------------------

DIGITS_MEAN = 0.30
DIGITS_STD = 0.33


def digits_arrays(size: int = 32):
    """(x_train, y_train, x_test, y_test) NHWC float32, normalized.

    Every 5th sample is test (deterministic, class-balanced in
    expectation): 1438 train / 359 test.
    """
    from sklearn.datasets import load_digits
    import jax

    d = load_digits()
    x = (d.images / 16.0).astype(np.float32)          # (1797, 8, 8) in [0,1]
    y = d.target.astype(np.int32)
    x = np.asarray(jax.image.resize(x, (x.shape[0], size, size), "bilinear"))
    x = np.repeat(x[..., None], 3, axis=-1)           # grayscale -> RGB
    x = (x - DIGITS_MEAN) / DIGITS_STD
    test_mask = (np.arange(x.shape[0]) % 5) == 4
    return (x[~test_mask], y[~test_mask], x[test_mask], y[test_mask])


# ---------------------------------------------------------------------------
# synth10 (procedural, on-device)
# ---------------------------------------------------------------------------

# class -> shape primitive: 0 circle, 1 square, 2 triangle, 3 ring,
# 4 cross, 5 diamond, 6 two-dots
_SHAPE_OF_CLASS = (0, 1, 2, 3, 4, 0, 1, 5, 6, 4)
_STRIPED_CLASS = (0., 0., 0., 0., 0., 1., 1., 0., 0., 1.)


def synth10_batch(key, n: int, size: int = 32):
    """Render a batch of synth10 samples on device. Returns (x NHWC f32
    normalized, y int32). Pure and jittable — use inside training scans.
    """
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 14)
    shape_of_class = jnp.asarray(_SHAPE_OF_CLASS, jnp.int32)
    striped_class = jnp.asarray(_STRIPED_CLASS, jnp.float32)

    y = jax.random.randint(ks[0], (n,), 0, 10)
    shape_id = shape_of_class[y]                       # (n,)
    striped = striped_class[y][:, None, None]

    u = lambda k, lo, hi: jax.random.uniform(k, (n, 1, 1), minval=lo,
                                             maxval=hi)
    cx, cy = u(ks[1], -5, 5), u(ks[2], -5, 5)
    scale = u(ks[3], 0.75, 1.25)
    rot_full = u(ks[4], 0.0, 2 * np.pi)
    rot_lim = u(ks[5], -0.35, 0.35)
    # square (1) vs diamond (5) differ only by 45 degrees — those two
    # classes get bounded rotation so they stay distinguishable
    sq_fam = ((shape_id == 1) | (shape_id == 5))[:, None, None]
    rot = jnp.where(sq_fam, rot_lim, rot_full)

    c = (size - 1) / 2.0
    grid = jnp.arange(size, dtype=jnp.float32) - c
    xx = grid[None, None, :]                           # (1,1,S)
    yy = grid[None, :, None]                           # (1,S,1)
    dx, dy = xx - cx, yy - cy
    cr, sr = jnp.cos(rot), jnp.sin(rot)
    xr = cr * dx + sr * dy                             # (n,S,S)
    yr = -sr * dx + cr * dy

    r0 = 9.0 * scale
    e = 0.9                                            # soft (antialiased) edge
    sig = jax.nn.sigmoid
    d = jnp.sqrt(xr ** 2 + yr ** 2 + 1e-6)
    circle = sig((0.85 * r0 - d) / e)
    square = sig((0.72 * r0 - jnp.maximum(jnp.abs(xr), jnp.abs(yr))) / e)
    tri = sig((0.55 * r0
               - jnp.maximum(0.866 * jnp.abs(xr) + 0.5 * yr, -yr)) / e)
    ring = sig((0.95 * r0 - d) / e) * sig((d - 0.5 * r0) / e)
    bar_h = sig((r0 - jnp.abs(xr)) / e) * sig((0.28 * r0 - jnp.abs(yr)) / e)
    bar_v = sig((0.28 * r0 - jnp.abs(xr)) / e) * sig((r0 - jnp.abs(yr)) / e)
    cross = jnp.maximum(bar_h, bar_v)
    diamond = sig((0.9 * r0 - (jnp.abs(xr) + jnp.abs(yr))) / e)
    d1 = jnp.sqrt((xr - 0.55 * r0) ** 2 + yr ** 2 + 1e-6)
    d2 = jnp.sqrt((xr + 0.55 * r0) ** 2 + yr ** 2 + 1e-6)
    dots = jnp.maximum(sig((0.42 * r0 - d1) / e), sig((0.42 * r0 - d2) / e))

    prims = jnp.stack([circle, square, tri, ring, cross, diamond, dots])
    mask = jnp.take_along_axis(
        prims, shape_id[None, :, None, None], axis=0)[0]   # (n,S,S)

    phase = u(ks[6], 0.0, 2 * np.pi)
    stripe = 0.3 + 0.7 * sig(4.0 * jnp.sin(1.6 * xr + phase))
    mask = mask * jnp.where(striped > 0, stripe, 1.0)

    fg = jax.random.uniform(ks[7], (n, 1, 1, 3), minval=0.45, maxval=1.0)
    f1, f2 = u(ks[8], 0.1, 0.5), u(ks[9], 0.1, 0.5)
    p1, p2 = u(ks[10], 0, 2 * np.pi), u(ks[11], 0, 2 * np.pi)
    bg = (0.25 + 0.10 * jnp.sin(f1 * dx + 0.7 * f1 * dy + p1)
          + 0.10 * jnp.sin(0.6 * f2 * dx - f2 * dy + p2))  # (n,S,S)
    img = bg[..., None] + (fg - bg[..., None]) * mask[..., None]
    img = img + 0.06 * jax.random.normal(ks[12], img.shape)
    img = (img - 0.5) / 0.25
    return img.astype(jnp.float32), y.astype(jnp.int32)


def synth10_test_arrays(n: int = 2048, seed: int = 7, size: int = 32):
    """Fixed held-out test set as numpy arrays (generated on host CPU)."""
    import jax

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        x, y = jax.jit(synth10_batch, static_argnums=(1, 2))(
            jax.random.PRNGKey(seed), n, size)
        return np.asarray(x), np.asarray(y)
