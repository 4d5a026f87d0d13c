"""Image augmentations, TPU-first.

Capability parity: reference `serl_launcher/vision/data_augmentations.py`
(batched_random_crop :22-36, color jitter :226-298, gaussian blur :308-331,
grayscale, flip, solarize).

TPU-first design for the hot one (DrQ's random crop, run twice per update on
the whole batch): the reference pads each image and takes a per-image
`dynamic_slice` under vmap. Here the crop is expressed through *edge-clamped
selection indices* — for each image, row indices `clip(i + dy - pad, 0, H-1)`
and column indices likewise. Identical semantics to pad-edge-then-slice
(clamping reproduces edge padding). The shipped implementation expresses
the two selections as batched ONE-HOT MATMULS on the MXU (4x faster than
the gather lowering on v5e, measured loop-timed at 2.5 vs 9.9 ms for
2048x128x128x3 — TPU gathers over small-minor-dim image tensors
scalarize); `batched_random_crop_gather` keeps the gather formulation for
comparison. (A Pallas dynamic-slice kernel was also tried; Mosaic rejects
uint8 dynamic windows on this toolchain, and the matmul form already sits
near the bandwidth bound.)
"""

from functools import partial

import jax
import jax.numpy as jnp


def random_crop(img, rng, *, padding):
    """Single image (H, W, C), reference semantics (pad edge + random slice)."""
    return batched_random_crop(img[None], rng, padding=padding, num_batch_dims=1)[0]


@partial(jax.jit, static_argnames=("padding", "num_batch_dims"))
def batched_random_crop(img, rng, *, padding, num_batch_dims: int = 1):
    """Random crop with edge padding over arbitrary leading batch dims.

    img: (..., H, W, C); one independent crop per leading-batch element.

    TPU implementation: the per-image row/column selections are expressed as
    two batched ONE-HOT MATMULS (R @ img @ C^T per image) instead of
    gathers — TPU gathers on small-minor-dim image tensors scalarize
    (~10 ms for 2048x128x128x3 on v5e), while the selection matmuls ride
    the MXU (~2.5 ms, 4x). Exact: one-hot bf16 x integer-valued bf16 with
    f32 accumulation reproduces the gather bit-for-bit for uint8 pixels
    (values <= 255 are exactly representable; golden test vs pad+slice in
    tests/test_vision.py). `batched_random_crop_gather` keeps the gather
    formulation for comparison.
    """
    if jnp.issubdtype(jnp.asarray(img).dtype, jnp.floating):
        # the bf16 matmul path is only bit-exact for integer-valued pixels
        # (uint8 <= 255); float inputs keep the dtype-exact gather
        # formulation (advisor r4 finding)
        return batched_random_crop_gather(
            img, rng, padding=padding, num_batch_dims=num_batch_dims
        )
    original_shape = img.shape
    img = img.reshape((-1,) + img.shape[num_batch_dims:])
    b, h, w = img.shape[0], img.shape[1], img.shape[2]

    rows, cols = _crop_indices(img, rng, padding)
    R = (rows[:, :, None] == jnp.arange(h)[None, None, :]).astype(jnp.bfloat16)
    Cm = (cols[:, :, None] == jnp.arange(w)[None, None, :]).astype(jnp.bfloat16)
    x = img.astype(jnp.bfloat16)
    x = jnp.einsum("bih,bhwc->biwc", R, x)
    x = jnp.einsum("bjw,biwc->bijc", Cm, x)
    return x.astype(img.dtype).reshape(original_shape)


def _crop_indices(img, rng, padding):
    """Edge-clamped row/col source indices for a random crop window."""
    b, h, w = img.shape[0], img.shape[1], img.shape[2]
    offsets = jax.random.randint(rng, (b, 2), 0, 2 * padding + 1)
    # crop window starts at offset-padding in unpadded coords; clamp = edge pad
    rows = jnp.clip(
        jnp.arange(h)[None, :] + offsets[:, 0:1] - padding, 0, h - 1
    )  # (B, H)
    cols = jnp.clip(
        jnp.arange(w)[None, :] + offsets[:, 1:2] - padding, 0, w - 1
    )  # (B, W)
    return rows, cols


@partial(jax.jit, static_argnames=("padding", "num_batch_dims"))
def batched_random_crop_gather(img, rng, *, padding, num_batch_dims: int = 1):
    """Gather formulation (two batched take_along_axis) — kept for
    comparison/benchmarking; same semantics as `batched_random_crop`."""
    original_shape = img.shape
    img = img.reshape((-1,) + img.shape[num_batch_dims:])
    rows, cols = _crop_indices(img, rng, padding)
    img = jnp.take_along_axis(img, rows[:, :, None, None], axis=1)
    img = jnp.take_along_axis(img, cols[:, None, :, None], axis=2)
    return img.reshape(original_shape)


# ------------------------- photometric transforms ------------------------- #


def rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    rng_ = v - jnp.minimum(jnp.minimum(r, g), b)
    s = jnp.where(v > 0, rng_ / v, 0.0)
    norm = jnp.where(rng_ != 0, 1.0 / (6.0 * rng_), 1e9)
    hr = norm * (g - b)
    hg = norm * (b - r) + 2.0 / 6.0
    hb = norm * (r - g) + 4.0 / 6.0
    h = jnp.where(r == v, hr, jnp.where(g == v, hg, hb))
    h = h * (rng_ > 0)
    h = h + (h < 0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    c = s * v
    m = v - c
    dh = (h % 1.0) * 6.0
    x = c * (1.0 - jnp.abs(dh % 2.0 - 1.0))
    cat = jnp.floor(dh).astype(jnp.int32)
    r = jnp.where((cat == 0) | (cat == 5), c, jnp.where((cat == 1) | (cat == 4), x, 0))
    g = jnp.where((cat == 1) | (cat == 2), c, jnp.where((cat == 0) | (cat == 3), x, 0))
    b = jnp.where((cat == 3) | (cat == 4), c, jnp.where((cat == 2) | (cat == 5), x, 0))
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def to_grayscale(image):
    weights = jnp.asarray([0.2989, 0.5870, 0.1140])
    gray = jnp.tensordot(image, weights, axes=(-1, -1))[..., None]
    return jnp.repeat(gray, 3, axis=-1)


def color_transform(
    image,
    rng,
    *,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.05,
    to_grayscale_prob: float = 0.0,
    color_jitter_prob: float = 1.0,
    apply_prob: float = 1.0,
    shuffle: bool = False,
):
    """Color jitter on a single float image in [0, 1] (reference :226-298).
    Applies brightness/contrast/saturation/hue perturbations (optionally in a
    random order), optional grayscale."""
    keys = jax.random.split(rng, 8)
    should_apply = jax.random.uniform(keys[0]) <= apply_prob
    should_gs = jax.random.uniform(keys[1]) <= to_grayscale_prob
    should_jit = jax.random.uniform(keys[2]) <= color_jitter_prob

    def bright(x, k):
        d = jax.random.uniform(k, (), minval=-brightness, maxval=brightness)
        return jnp.clip(x + d, 0.0, 1.0)

    def contr(x, k):
        f = jax.random.uniform(k, (), minval=1 - contrast, maxval=1 + contrast)
        mean = x.mean(axis=(-3, -2), keepdims=True)
        return jnp.clip(f * (x - mean) + mean, 0.0, 1.0)

    def satur(x, k):
        f = jax.random.uniform(k, (), minval=1 - saturation, maxval=1 + saturation)
        hsv = rgb_to_hsv(x)
        hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * f, 0.0, 1.0))
        return jnp.clip(hsv_to_rgb(hsv), 0.0, 1.0)

    def huef(x, k):
        d = jax.random.uniform(k, (), minval=-hue, maxval=hue)
        hsv = rgb_to_hsv(x)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + d) % 1.0)
        return jnp.clip(hsv_to_rgb(hsv), 0.0, 1.0)

    fns = [bright, contr, satur, huef]
    fn_keys = list(keys[3:7])

    def jitter(x):
        if shuffle:
            order = jax.random.permutation(keys[7], 4)
            for slot in range(4):
                x = jax.lax.switch(
                    order[slot], [partial(f, k=k) for f, k in zip(fns, fn_keys)], x
                )
        else:
            for f, k in zip(fns, fn_keys):
                x = f(x, k)
        return x

    out = jnp.where(should_apply & should_jit, jitter(image), image)
    out = jnp.where(should_apply & should_gs, to_grayscale(out), out)
    return jnp.clip(out, 0.0, 1.0)


def gaussian_blur(
    image, rng, *, blur_divider=10.0, sigma_min=0.1, sigma_max=2.0, apply_prob=1.0
):
    """Separable gaussian blur of one (H, W, C) image (reference :308-331)."""
    k1, k2 = jax.random.split(rng)
    kernel_size = int(image.shape[0] / blur_divider)
    radius = max(1, int(kernel_size / 2))
    size = 2 * radius + 1
    sigma = jax.random.uniform(k2, (), minval=sigma_min, maxval=sigma_max)
    x = jnp.arange(-radius, radius + 1).astype(jnp.float32)
    f = jnp.exp(-(x**2) / (2.0 * sigma**2))
    f = f / f.sum()

    img = image[None]
    c = image.shape[-1]
    blur_h = jnp.tile(f.reshape(1, size, 1, 1), (1, 1, 1, c))
    blur_v = jnp.tile(f.reshape(size, 1, 1, 1), (1, 1, 1, c))

    def conv(i, k):
        return jax.lax.conv_general_dilated(
            i, k, (1, 1), "SAME",
            feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    blurred = conv(conv(img, blur_h), blur_v)[0]
    apply = jax.random.uniform(k1) <= apply_prob
    return jnp.where(apply, blurred, image)


def random_flip(image, rng):
    """Left-right flip with p=0.5 (reference :301-305)."""
    flip = jax.random.uniform(rng) <= 0.5
    return jnp.where(flip, jnp.flip(image, axis=-2), image)


def solarize(image, rng, *, threshold=0.5, apply_prob=1.0):
    """Invert pixels above threshold (reference :334-338)."""
    apply = jax.random.uniform(rng) <= apply_prob
    sol = jnp.where(image < threshold, image, 1.0 - image)
    return jnp.where(apply, sol, image)
