"""Color-jitter augmentation, sequence-consistent.

Replicates the reference's per-sequence jitter (dataset/kubric.py:465-513,
enabled for GSO training with brightness 0.2, contrast/saturation/hue 0.3,
dataset/gso.py:34-38): ONE random factor set per sequence, applied to every
frame, with the four adjustments applied in a random order. Implemented in
numpy over channels-last float images.
"""

from __future__ import annotations

import random
from typing import List, Optional

import numpy as np

_GRAY = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    # torchvision: blend with the mean of the grayscale image
    mean = (img @ _GRAY).mean()
    return np.clip(mean + factor * (img - mean), 0.0, 1.0)


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    gray = (img @ _GRAY)[..., None]
    return np.clip(gray + factor * (img - gray), 0.0, 1.0)


def adjust_hue(img: np.ndarray, factor: float) -> np.ndarray:
    """factor in [-0.5, 0.5]: rotate hue via HSV round trip (torchvision)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = img.max(-1)
    minc = img.min(-1)
    v = maxc
    c = maxc - minc
    s = np.where(maxc > 0, c / np.maximum(maxc, 1e-12), 0.0)
    safe_c = np.maximum(c, 1e-12)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    h = np.where(r == maxc, bc - gc,
                 np.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = np.where(c == 0, 0.0, h)

    h = (h + factor) % 1.0
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    r2 = np.choose(i, [v, q, p, p, t, v])
    g2 = np.choose(i, [t, v, v, q, p, p])
    b2 = np.choose(i, [p, p, t, v, v, q])
    return np.clip(np.stack([r2, g2, b2], axis=-1), 0.0, 1.0)


def color_jitter_seq(
    imgs: np.ndarray,
    rng: random.Random,
    brightness: float = 0.2,
    contrast: float = 0.3,
    saturation: float = 0.3,
    hue: float = 0.3,
) -> np.ndarray:
    """Jitter a sequence [t, H, W, 3] with shared random factors.

    reference: dataset/kubric.py:488-513 (factors drawn once, op order
    shuffled, applied to every frame).
    """
    ops = []
    if brightness > 0:
        f = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(lambda im: adjust_brightness(im, f))
    if saturation > 0:
        f = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        ops.append(lambda im: adjust_saturation(im, f))
    if hue > 0:
        f = rng.uniform(-hue, hue)
        ops.append(lambda im: adjust_hue(im, f))
    if contrast > 0:
        f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        ops.append(lambda im: adjust_contrast(im, f))
    rng.shuffle(ops)
    out = imgs
    for op in ops:
        out = op(out)
    return out.astype(np.float32)
