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


@functools.lru_cache(maxsize=64)
def _lanczos4_fixed_tables(src: int, dst: int):
    """cv2's fixed-point INTER_LANCZOS4 tap tables for 8-bit images:
    (indices int32[dst, 8], coefficients int32[dst, 8] at scale 2048).

    Reproduces imgproc/resize.cpp bit-for-bit: the source coordinate is
    computed in double then cast to float32; per-tap kernel values are
    evaluated in double via the sin/cos quadrant table, cast to float32,
    normalised in float32, and quantised with round-half-to-even at
    INTER_RESIZE_COEF_SCALE=2048. Border taps clamp to the edge.
    """
    scale = src / dst
    x = np.arange(dst)
    fxx = ((x + 0.5) * scale - 0.5).astype(np.float32)
    sx = np.floor(fxx).astype(np.int64)
    fx = (fxx - sx).astype(np.float32)

    s45 = 0.70710678118654752440084436210485
    cs = np.array([[1, 0], [-s45, -s45], [0, 1], [s45, -s45],
                   [-1, 0], [s45, s45], [0, -1], [-s45, s45]])
    fx64 = fx.astype(np.float64)
    y0 = -(fx64 + 3) * np.pi * 0.25
    s0, c0 = np.sin(y0), np.cos(y0)
    coeffs = np.zeros((dst, 8), np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        for k in range(8):
            y = -(fx64 + 3 - k) * np.pi * 0.25
            coeffs[:, k] = ((cs[k, 0] * s0 + cs[k, 1] * c0)
                            / (y * y)).astype(np.float32)
    ssum = coeffs.sum(axis=1, dtype=np.float32)
    with np.errstate(invalid="ignore"):  # small-fx rows overwritten below
        coeffs = (coeffs * (np.float32(1.0) / ssum)[:, None]
                  ).astype(np.float32)
    small = fx < np.finfo(np.float32).eps
    coeffs[small] = 0.0
    coeffs[small, 3] = 1.0
    quant = np.rint((coeffs * np.float32(2048.0)
                     ).astype(np.float64)).astype(np.int32)
    idx = np.clip(sx[:, None] + np.arange(8)[None, :] - 3,
                  0, src - 1).astype(np.int32)
    return idx, quant


def resize_lanczos4_uint8(img: np.ndarray, height: int,
                          width: int) -> np.ndarray:
    """Host (numpy) cv2.resize(uint8, INTER_LANCZOS4) — bit-exact: same
    fixed-point coefficients, int accumulation, rounding shift and
    saturation as cv2's 8-bit path. img: uint8[H, W, C]."""
    h, w = img.shape[:2]
    if (h, w) == (height, width):
        return img
    xi, xc = _lanczos4_fixed_tables(w, width)
    yi, yc = _lanczos4_fixed_tables(h, height)
    src = img.astype(np.int64)
    tmp = (src[:, xi, :] * xc[None, :, :, None]).sum(2)      # [h, W', C]
    acc = (tmp[yi, :, :] * yc[:, :, None, None]).sum(1)      # [H', W', C]
    out = (acc + (1 << 21)) >> 22
    return np.clip(out, 0, 255).astype(np.uint8)


def resize_lanczos4_uint8_device(img: jax.Array, height: int,
                                 width: int) -> jax.Array:
    """On-device twin of `resize_lanczos4_uint8` (same fixed-point math in
    int32, so the jitted observation path matches the host adapter — and
    cv2 — bit-for-bit). img: uint8[H, W, C] -> uint8[height, width, C]."""
    h, w = img.shape[:2]
    if (h, w) == (height, width):
        return img
    xi, xc = _lanczos4_fixed_tables(w, width)
    yi, yc = _lanczos4_fixed_tables(h, height)
    src = img.astype(jnp.int32)
    tmp = jnp.sum(src[:, xi, :] * jnp.asarray(xc)[None, :, :, None], axis=2)
    acc = jnp.sum(tmp[yi, :, :] * jnp.asarray(yc)[:, :, None, None], axis=1)
    out = jnp.right_shift(acc + (1 << 21), 22)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


@functools.lru_cache(maxsize=64)
def _bilinear_antialias_tf_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] matrix for tf.image.resize(method=BILINEAR,
    antialias=True): triangle kernel whose support scales with the
    downscale factor; out-of-range taps dropped and weights renormalised
    (used by the reference's verifier-image prep, eval_utils.py:228-286)."""
    scale = src / dst
    kscale = max(1.0, scale)
    coords = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    m = np.zeros((dst, src), dtype=np.float64)
    for i, c in enumerate(coords):
        lo = int(np.floor(c - kscale)) + 1
        hi = int(np.ceil(c + kscale))
        taps = np.arange(lo, hi + 1)
        w = np.maximum(0.0, 1.0 - np.abs((taps - c) / kscale))
        valid = (taps >= 0) & (taps < src)
        w = np.where(valid, w, 0.0)
        s = w.sum()
        if s > 0:
            w = w / s
        for t, wt in zip(taps[valid], w[valid]):
            m[i, t] += wt
    return m.astype(np.float32)


def resize_bilinear_tf_antialias(img: jax.Array, height: int,
                                 width: int) -> jax.Array:
    """tf.image.resize(..., BILINEAR, antialias=True) equivalent."""
    return _separable_resize(img, height, width, _bilinear_antialias_tf_matrix)


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
