"""Host-side image decode/preprocess with the reference's exact numerics.

Reproduces dataset.py:37-73 (`read_images`) / dataset.py:235-261 /
inference.py:39-68 — the reference keeps three near-identical copies; this
is the single canonical implementation:

- PIL open -> RGB -> numpy
- domain 'A' (edge side of pix2pix-style AB images): left 256px crop,
  invert (255.-x, promoting to float64 exactly like the reference),
  cv2.dilate with a 3x3 ones kernel / 1 iteration (edge thickening),
  invert back
- domain 'B': right 256px crop
- domain None: whole image
- cv2.resize to (size, size) (default INTER_LINEAR)
- float32/255, output **NHWC** (the TPU-native layout; the reference
  transposes to CHW for torch)

Decode-failure policy follows the call sites: `read_images` skips the file
(dataset.py:44-46), `load_image` returns None (inference.py:66-68), and the
loader substitutes a random image (dataset.py:258-261) via
`decode_image(..., on_error="random")`.

cv2 is used when importable for bit-exact parity with the reference; a
numpy fallback (exact for dilate, float-exact bilinear for resize) keeps
the framework importable without OpenCV.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

try:  # pragma: no cover - environment probe
    import cv2
    HAVE_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAVE_CV2 = False

from PIL import Image


def _dilate3x3(img: np.ndarray) -> np.ndarray:
    """3x3 ones-kernel dilation (max filter), matching cv2.dilate's default
    border handling (constant -inf, i.e. max over valid neighbors)."""
    if HAVE_CV2:
        kernel = np.ones((3, 3), np.uint8)
        return cv2.dilate(img, kernel, iterations=1)
    pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="constant",
                 constant_values=-np.inf)
    out = img.copy()
    h, w = img.shape[:2]
    for dy in range(3):
        for dx in range(3):
            np.maximum(out, pad[dy:dy + h, dx:dx + w], out)
    return out


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    """cv2.resize(..., (size, size)) with default INTER_LINEAR."""
    if HAVE_CV2:
        return cv2.resize(img, (size, size))
    # Float bilinear with half-pixel centers (cv2 convention).
    h, w = img.shape[:2]
    ys = (np.arange(size) + 0.5) * h / size - 0.5
    xs = (np.arange(size) + 0.5) * w / size - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    img = img.astype(np.float64)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def preprocess_array(image: np.ndarray, domain: Optional[str], image_size: int) -> np.ndarray:
    """Domain crop/dilate + resize + normalize. HWC uint8/float in, NHWC-ready
    float32 HWC out.

    Path selection: cv2 when importable (bit-parity with the reference);
    the fused native C++ pass (data/native.py) when DISCOGAN_NATIVE=1 or
    cv2 is absent; pure-numpy as last resort.
    """
    if isinstance(image, np.ndarray) and image.dtype == np.uint8:
        try:
            from . import native

            if native.prefer_native() or (not HAVE_CV2 and native.available()):
                return native.preprocess(image, domain, image_size)
        except Exception:  # pragma: no cover - fall through to python path
            pass
    if domain == "A":
        image = image[:, :256, :]
        image = 255.0 - image
        image = _dilate3x3(image)
        image = 255.0 - image
    elif domain == "B":
        image = image[:, 256:, :]
    image = _resize(image, image_size)
    return (np.asarray(image, np.float32) / 255.0)


def decode_image(path, domain: Optional[str] = None, image_size: int = 64,
                 on_error: str = "raise") -> Optional[np.ndarray]:
    """Decode one file to (H, W, 3) float32 in [0,1].

    on_error: "raise" | "none" (return None) | "random" (random image,
    the DataLoader fallback of dataset.py:258-261).
    """
    try:
        image = np.array(Image.open(path).convert("RGB"))
        return preprocess_array(image, domain, image_size)
    except Exception as e:  # noqa: BLE001 - mirrors reference behavior
        if on_error == "none":
            print(f"이미지 로딩 실패: {path}, 오류: {e}")
            return None
        if on_error == "random":
            print(f"이미지 로딩 실패: {path}, 오류: {e}")
            return np.random.rand(image_size, image_size, 3).astype(np.float32)
        raise


def read_images(filenames: List[str], domain: Optional[str] = None,
                image_size: int = 64) -> np.ndarray:
    """Batch decode, skipping failures (ref dataset.py:37-73). NHWC output."""
    images = []
    for fn in filenames:
        img = decode_image(fn, domain, image_size, on_error="none")
        if img is not None:
            images.append(img)
    if not images:
        raise ValueError("유효한 이미지가 없습니다.")
    return np.stack(images)


def load_image(path, image_size: int = 64, domain: Optional[str] = None,
               dataset_type: Optional[str] = None) -> Optional[np.ndarray]:
    """Inference-CLI variant (ref inference.py:39-68): domain preprocessing
    applies only for the edges2* dataset types; returns None on failure."""
    if dataset_type not in ("edges2handbags", "edges2shoes"):
        domain = None
    return decode_image(path, domain, image_size, on_error="none")


def shuffle_data(da, db) -> Tuple[np.ndarray, np.ndarray]:
    """Independent per-domain shuffles — unpaired training (ref dataset.py:24-35)."""
    a_idx = np.arange(len(da))
    np.random.shuffle(a_idx)
    b_idx = np.arange(len(db))
    np.random.shuffle(b_idx)
    return np.array(da)[a_idx], np.array(db)[b_idx]
