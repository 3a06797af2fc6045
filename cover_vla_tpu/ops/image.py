"""Image preprocessing ops, on-device (XLA) — channels-last [B, H, W, C].

Two resize flavours are needed for parity with the reference:
  * `resize_bilinear_torch`: torch F.interpolate(mode="bilinear",
    align_corners=False, antialias=False) — used by pi0's resize_with_pad
    (modeling_pi0.py:131-150).
  * `resize_lanczos4`: cv2.resize(interpolation=INTER_LANCZOS4) semantics —
    used by the SimplerAdapter observation preprocess
    (INT-ACT/src/experiments/env_adapters/simpler.py:43-94).

Both are expressed as two separable 1-D sparse interpolation matrices so XLA
lowers them to two small matmuls on the MXU instead of gathers.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] interpolation matrix for align_corners=False bilinear."""
    scale = src / dst
    coords = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0.0, src - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, src - 1)
    frac = coords - lo
    m = np.zeros((dst, src), dtype=np.float32)
    m[np.arange(dst), lo] += (1.0 - frac).astype(np.float32)
    m[np.arange(dst), hi] += frac.astype(np.float32)
    return m


def _lanczos_kernel(x: np.ndarray, a: int) -> np.ndarray:
    out = np.sinc(x) * np.sinc(x / a)
    out[np.abs(x) >= a] = 0.0
    return out


@functools.lru_cache(maxsize=64)
def _lanczos4_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] Lanczos-4 matrix matching cv2 INTER_LANCZOS4.

    cv2 uses a fixed 8-tap (a=4) window around the source coordinate and
    does NOT widen the kernel when downscaling; taps outside the image are
    clamped to the border (replicate).
    """
    a = 4
    scale = src / dst
    coords = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    m = np.zeros((dst, src), dtype=np.float64)
    for i, c in enumerate(coords):
        base = int(np.floor(c))
        taps = np.arange(base - a + 1, base + a + 1)
        w = _lanczos_kernel(c - taps, a)
        w = w / w.sum()
        taps = np.clip(taps, 0, src - 1)
        for t, wt in zip(taps, w):
            m[i, t] += wt
    return m.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _bicubic_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] PIL-style bicubic (Catmull-Rom a=-0.5) matrix.

    Matches PIL/torchvision Resize(BICUBIC): kernel support scales with the
    downscale factor (antialias); out-of-bounds taps are dropped and the
    remaining weights renormalised. Used for the verifier's open_clip
    preprocessing (Resize((384,384), bicubic)).
    """
    a = -0.5
    scale = src / dst
    support_scale = max(1.0, scale)
    support = 2.0 * support_scale

    def cubic(x):
        x = np.abs(x)
        return np.where(
            x <= 1.0, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
            np.where(x < 2.0, a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a,
                     0.0))

    coords = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    m = np.zeros((dst, src), dtype=np.float64)
    for i, c in enumerate(coords):
        lo = int(np.floor(c - support)) + 1
        taps = np.arange(lo, int(np.ceil(c + support)) + 1)
        w = cubic((c - taps) / support_scale)
        valid = (taps >= 0) & (taps < src)
        w = np.where(valid, w, 0.0)
        s = w.sum()
        if s > 0:
            w = w / s
        for t, wt in zip(taps[valid], w[valid]):
            m[i, t] += wt
    return m.astype(np.float32)


def _separable_resize(img: jax.Array, h: int, w: int, matrix_fn,
                      clip_range=None) -> jax.Array:
    """Apply row/col interpolation matrices. img: [B, H, W, C] float.
    clip_range: optional (lo, hi) applied after EACH 1-D pass (PIL clamps
    uint8 intermediates between passes)."""
    b, src_h, src_w, c = img.shape
    dtype = img.dtype
    x = img.astype(jnp.float32)
    # PIL order: horizontal pass first, with a ROUNDED+clipped uint8
    # intermediate for 8-bit images
    if src_w != w:
        mw = jnp.asarray(matrix_fn(src_w, w))           # [w, src_w]
        x = jnp.einsum("ws,bhsc->bhwc", mw, x,
                       precision=jax.lax.Precision.HIGHEST)
        if clip_range is not None:
            x = jnp.clip(jnp.round(x), *clip_range)
    if src_h != h:
        mh = jnp.asarray(matrix_fn(src_h, h))           # [h, src_h]
        x = jnp.einsum("hs,bswc->bhwc", mh, x,
                       precision=jax.lax.Precision.HIGHEST)
        if clip_range is not None:
            x = jnp.clip(jnp.round(x), *clip_range)
    return x.astype(dtype)


def resize_bilinear_torch(img: jax.Array, height: int, width: int) -> jax.Array:
    """torch bilinear (align_corners=False, no antialias) resize."""
    return _separable_resize(img, height, width, _bilinear_matrix)


def resize_lanczos4(img: jax.Array, height: int, width: int) -> jax.Array:
    """cv2 INTER_LANCZOS4 resize (no clipping of over/undershoot for floats)."""
    return _separable_resize(img, height, width, _lanczos4_matrix)


def resize_bicubic_pil(img: jax.Array, height: int, width: int,
                       clip_range=(0.0, 255.0)) -> jax.Array:
    """PIL/torchvision BICUBIC resize (antialiased on downscale). PIL
    clamps uint8 data to [0,255] after each separable pass; pass
    clip_range=None for float semantics."""
    return _separable_resize(img, height, width, _bicubic_matrix,
                             clip_range=clip_range)


def resize_with_pad(img: jax.Array, height: int, width: int,
                    pad_value: float = 0.0) -> jax.Array:
    """pi0 resize_with_pad (modeling_pi0.py:131-150), channels-last.

    Scales to fit inside (height, width) preserving aspect ratio with
    non-antialiased bilinear, then pads on the TOP and LEFT with pad_value.
    Shapes are static, so the ratio arithmetic happens at trace time.
    """
    b, cur_h, cur_w, c = img.shape
    ratio = max(cur_w / width, cur_h / height)
    resized_h = int(cur_h / ratio)
    resized_w = int(cur_w / ratio)
    out = resize_bilinear_torch(img, resized_h, resized_w)
    pad_h = max(0, height - resized_h)
    pad_w = max(0, width - resized_w)
    return jnp.pad(out, ((0, 0), (pad_h, 0), (pad_w, 0), (0, 0)),
                   constant_values=pad_value)


def to_siglip_range(img_uint8: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float [-1, 1] (SigLIP input convention)."""
    return img_uint8.astype(jnp.float32) / 127.5 - 1.0


def patchify(img: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C] row-major patches."""
    b, h, w, c = img.shape
    gh, gw = h // patch, w // patch
    x = img.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)
