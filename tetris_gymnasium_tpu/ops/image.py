"""Device image kernels for the reference CNN preprocessing chain.

The reference's DQN workload trains on RgbObservation -> Resize(84, 84) ->
Grayscale -> FrameStack(4), all computed per env on the host with cv2/
gymnasium wrappers (ref: examples/train_cnn.py:127-147).  These kernels run
the same chain fused on device over the whole env batch:

* :func:`resize_area_zoom` reproduces ``cv2.resize(..., INTER_AREA)`` for the
  enlargement case (the board composite is smaller than 84x84) with cv2's own
  fixed-point arithmetic: the INTER_AREA zoom coordinate scheme
  (``sx = floor(dx*scale)``, ``fx = (dx+1)-(sx+1)/scale`` with OpenCV's
  ``scale = 1/inv_scale`` double, resize.cpp) and 11-bit integer coefficients
  with the scalar rounding cast ``(acc + 2^21) >> 22``.  cv2's exact output
  additionally depends on its SIMD build (the vectorized row kernel rounds
  ``((b0*(h0>>4)+b1*(h1>>4))>>16 + 2)>>2``, the scalar tail rounds the full
  product), so the last bit is implementation-defined there; this kernel is
  deterministic scalar-semantics and matches cv2 within +/-1 everywhere
  (pinned in tests/test_image_ops.py).

* :func:`grayscale_u8` reproduces gymnasium's ``GrayscaleObservation``
  (``sum(rgb * [0.2125, 0.7154, 0.0721])`` in float64, truncation-cast to
  uint8).  float64 is unavailable on device (x64 disabled).  Two kernels:
  the pipeline default uses 22-bit fixed-point weights (three VPU
  multiply-adds; 780 of the 16.7M RGB triples differ from numpy by 1 —
  46 ppm, exhaustively measured), and :func:`grayscale_u8_exact` evaluates
  the exact real-arithmetic sum via 25-bit limb tables (164 triples / 10 ppm
  off — only where numpy's own sequential double addition rounds an
  intermediate onto an integer boundary — but gather-bound on TPU).  Both
  are deterministic; a float32 kernel would deviate on 341 triples AND vary
  by platform.

Both are weight-table contractions with static shapes: resize lowers to two
small integer matmuls, grayscale to a one-hot palette contraction — the
layouts XLA tiles well, no per-pixel gathers (round-4 one-hot rule).
"""
from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

_COEF_BITS = 11  # INTER_RESIZE_COEF_BITS
_COEF_SCALE = 1 << _COEF_BITS


@functools.lru_cache(maxsize=None)
def _area_zoom_matrix(n_src: int, n_dst: int) -> np.ndarray:
    """Row-interpolation matrix ``R[n_dst, n_src]`` (int32, rows sum 2048).

    cv2's INTER_AREA zoom coordinates (resize.cpp): the source cell of output
    ``dx`` is ``floor(dx * scale)`` with ``scale = 1.0 / inv_scale`` — the
    double ``1/(dst/src)``, NOT ``src/dst``; the two differ by an ulp exactly
    at cell boundaries and cv2's choice decides which source wins there.  The
    blend fraction ``(dx+1) - (sx+1)*inv_scale`` is <= 0 in the interior of a
    cell (pure replication) and only blends across cell boundaries, computed
    in float32 like cv2 before the 11-bit coefficient rounding.
    """
    if n_dst < n_src:
        raise ValueError(
            f"resize_area_zoom only enlarges (src {n_src} -> dst {n_dst}); "
            "the reference chain upscales the board composite to 84x84"
        )
    inv = n_dst / n_src
    scale = 1.0 / inv
    dx = np.arange(n_dst)
    s = np.floor(dx * scale).astype(np.int64)
    f = ((dx + 1) - (s + 1) * inv).astype(np.float32)
    f = np.where(f <= 0, np.float32(0), f - np.floor(f))
    hi = (s >= n_src - 1) & (f > 0)  # clamp at the right border (resize.cpp)
    f = np.where(hi, 0, f)
    s = np.where(hi, n_src - 1, s)
    s2 = np.minimum(s + 1, n_src - 1)
    # cv2 rounds the two coefficients independently in float32
    # (saturate_cast<short>(coef * 2048)); they are not forced to sum to 2048
    a1 = np.rint((f * np.float32(_COEF_SCALE)).astype(np.float32)).astype(np.int32)
    a0 = np.rint(
        ((np.float32(1.0) - f) * np.float32(_COEF_SCALE)).astype(np.float32)
    ).astype(np.int32)
    R = np.zeros((n_dst, n_src), dtype=np.int32)
    R[dx, s] += a0
    R[dx, s2] += a1
    return R


def resize_area_zoom(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """``cv2.resize(img, (out_w, out_h), INTER_AREA)`` for uint8 enlargement.

    Args:
        img: ``[..., H, W]`` or ``[..., H, W, C]`` uint8.
        out_h / out_w: target size, each >= the source size.

    Returns:
        uint8 of the same rank with the spatial dims resized.

    The two interpolation passes are integer matmuls against static
    coefficient matrices (scaled 2048); the final cast is cv2's scalar
    fixed-point rounding ``(acc + 2^21) >> 22`` — acc <= 255*2048*2048 + 2^21
    < 2^31, so int32 is exact.
    """
    has_c = img.ndim >= 3 and img.shape[-1] in (1, 3, 4)
    spatial = (-3, -2) if has_c else (-2, -1)
    H, W = img.shape[spatial[0]], img.shape[spatial[1]]
    Rx = jnp.asarray(_area_zoom_matrix(W, out_w))  # [out_w, W]
    Ry = jnp.asarray(_area_zoom_matrix(H, out_h))  # [out_h, H]
    x = img.astype(jnp.int32)
    if has_c:
        h = jnp.einsum("...hwc,Ww->...hWc", x, Rx)  # scaled 2048
        acc = jnp.einsum("...hWc,Hh->...HWc", h, Ry)  # scaled 2048^2
    else:
        h = jnp.einsum("...hw,Ww->...hW", x, Rx)
        acc = jnp.einsum("...hW,Hh->...HW", h, Ry)
    out = (acc + (1 << (2 * _COEF_BITS - 1))) >> (2 * _COEF_BITS)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


# gymnasium's GrayscaleObservation weights (transform_observation.py)
_GRAY_WEIGHTS = (0.2125, 0.7154, 0.0721)
_LIMB_BITS = 25
_FRAC_BITS = 45  # every double in [0, 256) is a multiple of 2^-45


@functools.lru_cache(maxsize=None)
def _gray_tables():
    """Per-channel scaled-integer tables ``(hi[3, 256], lo[3, 256])``.

    ``v * w_c`` computed in float64 (exactly what gymnasium does) scaled by
    2^45 is an integer < 2^53; split into a high limb (>= 2^25) and a low
    limb (< 2^25) so the three-term sum stays within int32.
    """
    v = np.arange(256, dtype=np.float64)
    hi, lo = [], []
    for w in _GRAY_WEIGHTS:
        t = np.round((v * w) * float(2**_FRAC_BITS)).astype(np.int64)
        hi.append(t >> _LIMB_BITS)
        lo.append(t & ((1 << _LIMB_BITS) - 1))
    return (
        np.stack(hi).astype(np.int32),
        np.stack(lo).astype(np.int32),
    )


# 22-bit fixed-point weights: the largest scale where r*W0+g*W1+b*W2 stays
# within int32 (sum of weights is exactly 2^22, max acc = 255*2^22 < 2^30)
_W22 = tuple(int(round(w * (1 << 22))) for w in _GRAY_WEIGHTS)


def grayscale_u8(rgb: jnp.ndarray) -> jnp.ndarray:
    """gymnasium ``GrayscaleObservation`` on device — the pipeline kernel.

    ``trunc((r*W0 + g*W1 + b*W2) >> 22)`` with 22-bit integer weights:
    three multiply-adds per pixel, pure VPU arithmetic.  Exhaustively over
    all 16.7M RGB triples this differs from numpy's float64 value on 780
    triples (46 ppm), by exactly 1 — within the chain's documented ±1
    envelope (the resize bound).  Chosen over the exact kernel below after
    measuring on hardware (tools/profile_rgb.py): a per-pixel 256-entry
    gather ran at 76k frames/s at B=4096 (gathers serialize on TPU), a
    ``[..., 3, 256]`` one-hot contraction materialized 165 GB at B=8192,
    and any int32 temp with the 3-wide channel axis minor gets lane-padded
    3→128 by TPU tiling (a 30 GB copy).

    Args:
        rgb: ``[..., 3]`` uint8.

    Returns:
        ``[...]`` uint8.
    """
    acc = None
    for c in range(3):
        t = rgb[..., c].astype(jnp.int32) * jnp.int32(_W22[c])
        acc = t if acc is None else acc + t
    return (acc >> 22).astype(jnp.uint8)


def grayscale_u8_exact(rgb: jnp.ndarray) -> jnp.ndarray:
    """The exact-real-sum grayscale (10 ppm vs numpy float64, module doc).

    Evaluates the scaled double products via 25-bit limb tables — one
    256-entry gather per channel.  Bit-deterministic and the closest
    integer evaluation of gymnasium's formula, but gather-bound on TPU
    (~76k frames/s at B=4096): use for verification and host-scale work,
    not the training pipeline.
    """
    hi_t, lo_t = _gray_tables()
    hi = lo = None
    for c in range(3):
        idx = rgb[..., c].astype(jnp.int32)
        h = jnp.take(jnp.asarray(hi_t[c]), idx, axis=0)
        l = jnp.take(jnp.asarray(lo_t[c]), idx, axis=0)
        hi = h if hi is None else hi + h
        lo = l if lo is None else lo + l
    total_hi = hi + (lo >> _LIMB_BITS)
    return (total_hi >> (_FRAC_BITS - _LIMB_BITS)).astype(jnp.uint8)


def preprocess_rgb84(rgb: jnp.ndarray, out_h: int = 84, out_w: int = 84) -> jnp.ndarray:
    """The reference chain's resize+grayscale stage, fused.

    ``[..., H, W, 3] uint8 -> [..., out_h, out_w] uint8`` — exactly
    ``GrayscaleObservation(ResizeObservation(env, (84, 84)))`` (cv2 resize
    within +/-1 as documented above, grayscale bit-exact given its input).
    Ref: examples/train_cnn.py:140-141.
    """
    return grayscale_u8(resize_area_zoom(rgb, out_h, out_w))
