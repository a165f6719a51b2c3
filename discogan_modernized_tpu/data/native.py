"""ctypes bindings for the native preprocessing library (native/discodata.cpp).

Build-on-first-use: compiles the C++ source with g++ -O3 -march=native
into a HOST-LOCAL cache (~/.cache/discogan_native, override with
DISCOGAN_NATIVE_CACHE), keyed by the source's content hash. The binary is
deliberately never stored in the repo: -march=native makes it
ISA-specific, so a committed .so from one machine could SIGILL on
another; the content key also removes the mtime races of a
next-to-source artifact. The fused `preprocess_u8` replaces the
reference's PIL->numpy->cv2 chain (crop, invert+dilate+invert, resize,
/255 — dataset.py:52-66) with one C++ pass.

Selection order in the pipeline (data/preprocess.py): cv2 when importable
(bit-parity with the reference), else this native path, else pure numpy.
Set DISCOGAN_NATIVE=1 to prefer the native path explicitly.

Measured on the dev host (round 2, after vectorizing the morphology as
separable flattened-row min/max passes and restructuring the resize as
two-pass with a row cache — discodata.cpp): matches the cv2 path to
~6e-8 AND beats it on most shapes — 0.58x cv2's time on the 64px
A-domain edge+resize, 0.67x on B, 1.00x on the 512px identity resize,
1.14x (worst case) on a general 800->512 downscale. The dependency-free
path no longer trades speed for portability (PERF.md).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "discodata.cpp"
_lib = None
_DOMAIN_CODES = {None: 0, "A": 1, "B": 2}


def _build() -> Path:
    import hashlib

    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    cache = Path(os.environ.get("DISCOGAN_NATIVE_CACHE",
                                str(Path.home() / ".cache" /
                                    "discogan_native")))
    cache.mkdir(parents=True, exist_ok=True)
    lib = cache / f"discodata-{digest}.so"
    if lib.exists():
        return lib
    tmp = lib.with_name(f"{lib.name}.{os.getpid()}.tmp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(_SRC), "-o", str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(f"native build failed: {e.stderr}") from e
    except FileNotFoundError as e:
        raise RuntimeError("g++ not available for native build") from e
    os.replace(tmp, lib)  # atomic — concurrent builders race safely
    return lib


def load():
    """Load (building if needed) the native library. Raises on failure.
    Failures are cached: without a compiler (or with a corrupt .so) the
    per-image fallback path must not re-attempt the build for every
    sample of every epoch."""
    global _lib
    if _lib is False:
        raise RuntimeError("native build previously failed this process")
    if _lib is None:
        try:
            lib = ctypes.CDLL(str(_build()))
            f32p = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.erode3x3_f32.argtypes = [f32p, f32p] + [ctypes.c_int] * 3
            lib.dilate3x3_f32.argtypes = [f32p, f32p] + [ctypes.c_int] * 3
            lib.resize_bilinear_f32.argtypes = [f32p, f32p] + [ctypes.c_int] * 5
            lib.preprocess_u8.argtypes = [u8p] + [ctypes.c_int] * 5 + [f32p]
        except Exception as e:
            _lib = False
            raise RuntimeError(f"native build/load failed: {e}") from e
        _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except RuntimeError:
        return False


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def erode3x3(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty_like(img)
    h, w, c = img.shape
    load().erode3x3_f32(_f32p(img), _f32p(out), h, w, c)
    return out


def dilate3x3(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty_like(img)
    h, w, c = img.shape
    load().dilate3x3_f32(_f32p(img), _f32p(out), h, w, c)
    return out


def resize_bilinear(img: np.ndarray, size: int) -> np.ndarray:
    img = np.ascontiguousarray(img, np.float32)
    ih, iw, c = img.shape
    out = np.empty((size, size, c), np.float32)
    load().resize_bilinear_f32(_f32p(img), _f32p(out), ih, iw, size, size, c)
    return out


def preprocess(image_u8: np.ndarray, domain, size: int) -> np.ndarray:
    """Fused crop/edge/resize/normalize for one uint8 HWC image."""
    image_u8 = np.ascontiguousarray(image_u8, np.uint8)
    h, w, c = image_u8.shape
    if _DOMAIN_CODES[domain] == 2 and w <= 256:
        # B-domain right crop of a <=256px-wide image is empty; the cv2
        # path raises here too (cv2.resize of a 0-width array) — raising
        # keeps decode_image's skip/substitute error handling identical
        # instead of reading out of bounds in the C++ fast path.
        raise ValueError(f"domain 'B' crop is empty for width {w} <= 256")
    out = np.empty((size, size, c), np.float32)
    load().preprocess_u8(
        image_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c, _DOMAIN_CODES[domain], size, _f32p(out))
    return out


def prefer_native() -> bool:
    return os.environ.get("DISCOGAN_NATIVE", "0") == "1"
