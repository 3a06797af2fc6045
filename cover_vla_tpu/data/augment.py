"""On-device image augmentation (training frame transforms).

JAX equivalents of the reference's tf.image augmentations
(INT-ACT/src/data/obs_transforms.py + dataset config: random_resized_crop
scale [0.8,1.0] / ratio [0.9,1.1], brightness/contrast/saturation/hue
jitter) — executed inside the jitted train step so the host pipeline ships
raw uint8 frames and the TPU does the math.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cover_vla_tpu.ops.image import resize_bilinear_torch


def random_resized_crop(key: jax.Array, img: jax.Array, out_hw: Tuple[int, int],
                        scale=(0.8, 1.0), ratio=(0.9, 1.1)) -> jax.Array:
    """img: [H, W, 3] float. Area-scale + aspect-ratio jittered crop, then
    bilinear resize to out_hw. Crop geometry is rounded to a static-size
    dynamic_slice so the op stays jittable."""
    h, w = img.shape[:2]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_ratio)
    crop_w = jnp.clip(jnp.sqrt(area * r), 8, w).astype(jnp.int32)
    crop_h = jnp.clip(jnp.sqrt(area / r), 8, h).astype(jnp.int32)
    y0 = jax.random.randint(k3, (), 0, h - crop_h + 1)
    x0 = jax.random.randint(k4, (), 0, w - crop_w + 1)

    # gather-based crop+resize with dynamic bounds (static output size)
    oh, ow = out_hw
    ys = y0 + (jnp.arange(oh) + 0.5) * crop_h / oh - 0.5
    xs = x0 + (jnp.arange(ow) + 0.5) * crop_w / ow - 0.5
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    y_lo = jnp.floor(ys).astype(jnp.int32)
    x_lo = jnp.floor(xs).astype(jnp.int32)
    y_hi = jnp.minimum(y_lo + 1, h - 1)
    x_hi = jnp.minimum(x_lo + 1, w - 1)
    wy = (ys - y_lo)[:, None, None]
    wx = (xs - x_lo)[None, :, None]
    top = img[y_lo][:, x_lo] * (1 - wx) + img[y_lo][:, x_hi] * wx
    bot = img[y_hi][:, x_lo] * (1 - wx) + img[y_hi][:, x_hi] * wx
    return top * (1 - wy) + bot * wy


def color_jitter(key: jax.Array, img: jax.Array, brightness=0.1,
                 contrast=0.1, saturation=0.1, hue=0.025) -> jax.Array:
    """img in [0, 1]. Brightness/contrast/saturation/hue jitter matching
    tf.image semantics (additive brightness, mean-anchored contrast,
    grayscale-anchored saturation, HSV hue rotation approximated in YIQ)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = img + jax.random.uniform(k1, (), minval=-brightness,
                                   maxval=brightness)
    c = jax.random.uniform(k2, (), minval=1 - contrast, maxval=1 + contrast)
    mean = img.mean(axis=(-3, -2), keepdims=True)
    img = (img - mean) * c + mean
    s = jax.random.uniform(k3, (), minval=1 - saturation,
                           maxval=1 + saturation)
    gray = (img * jnp.asarray([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
    img = gray + (img - gray) * s
    # hue rotation in YIQ space
    theta = jax.random.uniform(k4, (), minval=-hue, maxval=hue) * 2 * jnp.pi
    yiq = jnp.einsum("...c,cd->...d", img, _RGB2YIQ)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.stack([
        jnp.stack([jnp.ones(()), jnp.zeros(()), jnp.zeros(())]),
        jnp.stack([jnp.zeros(()), cos, -sin]),
        jnp.stack([jnp.zeros(()), sin, cos])])
    yiq = jnp.einsum("...c,cd->...d", yiq, rot.T)
    img = jnp.einsum("...c,cd->...d", yiq, _YIQ2RGB)
    return jnp.clip(img, 0.0, 1.0)


_RGB2YIQ = jnp.asarray([[0.299, 0.596, 0.211],
                        [0.587, -0.274, -0.523],
                        [0.114, -0.322, 0.312]])
_YIQ2RGB = jnp.asarray([[1.0, 1.0, 1.0],
                        [0.956, -0.272, -1.106],
                        [0.621, -0.647, 1.703]])


def augment_frame(key: jax.Array, img_uint8: jax.Array,
                  out_hw: Tuple[int, int]) -> jax.Array:
    """uint8 [H,W,3] -> augmented float [-1,1] at out_hw (training path)."""
    k1, k2 = jax.random.split(key)
    x = img_uint8.astype(jnp.float32) / 255.0
    x = random_resized_crop(k1, x, out_hw)
    x = color_jitter(k2, x)
    return x * 2.0 - 1.0
