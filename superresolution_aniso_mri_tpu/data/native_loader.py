"""ctypes binding for the native data-loader runtime (native/srloader.cc).

The reference rides torch's native DataLoader machinery for its host
data path; this framework's native equivalent is a small C++ runtime:
zlib-backed NIfTI decode, a thread-pool directory ingest, and a threaded
channel-interleaving gather for triplet batch assembly. The pure-Python
implementations (utils/nifti.py, data/pairs.py) remain the behavioural
reference — everything here is an exact, tested drop-in that the
callers use opportunistically.

The shared library builds on demand with the baked-in g++ (no pip);
set SRL_DISABLE_NATIVE=1 to force the Python fallback.

Measured (tools/loader_bench.py, single-core container): batch gather
2.75x faster than the numpy per-item stack (cache-friendly channel
interleave); per-file NIfTI decode at parity with the Python reader
(both are zlib-bound). The ingest thread pool needs >1 visible core to
pay off — this container exposes one, so read_nifti_many falls back to
effectively sequential decode there.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsrloader.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


class _SrlImage(ctypes.Structure):
    _fields_ = [
        ("ndim", ctypes.c_int32),
        ("sform", ctypes.c_int32),
        ("dims", ctypes.c_int64 * 8),
        ("spacing", ctypes.c_double * 3),
        ("affine", ctypes.c_double * 12),
        ("data", ctypes.POINTER(ctypes.c_float)),
        ("count", ctypes.c_int64),
        ("err", ctypes.c_char * 256),
    ]


def _build() -> bool:
    """Build (or refresh) the shared library through native/Makefile —
    the single source of truth for compiler flags. The Makefile compiles
    to a pid-unique temp and renames into place, so concurrent builders
    and interrupted compiles never leave a corrupt .so behind."""
    src = os.path.join(_NATIVE_DIR, "srloader.cc")
    if not os.path.isfile(src):
        # source-stripped deployment: accept a prebuilt .so as-is
        # instead of silently (and permanently) disabling the native
        # runtime just because there is nothing to rebuild from
        return os.path.isfile(_SO_PATH)
    # newest of source AND Makefile — the Makefile carries the compiler
    # flags, so a flags-only change must trigger a rebuild too
    mk = os.path.join(_NATIVE_DIR, "Makefile")
    src_mtime = max(os.path.getmtime(src),
                    os.path.getmtime(mk) if os.path.isfile(mk) else 0.0)
    if (os.path.isfile(_SO_PATH)
            and os.path.getmtime(_SO_PATH) >= src_mtime):
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=True, timeout=300)
        return os.path.isfile(_SO_PATH)
    except Exception:
        return False


def _get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("SRL_DISABLE_NATIVE"):
            _load_failed = True
            return None
        if not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _load_failed = True
            return None
        lib.srl_version.restype = ctypes.c_int
        lib.srl_read_nifti.restype = ctypes.POINTER(_SrlImage)
        lib.srl_read_nifti.argtypes = [ctypes.c_char_p]
        lib.srl_free_image.argtypes = [ctypes.POINTER(_SrlImage)]
        lib.srl_read_nifti_many.restype = ctypes.c_int
        lib.srl_read_nifti_many.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(_SrlImage)), ctypes.c_int]
        lib.srl_gather.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.c_int,
            ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native runtime compiled and loaded."""
    return _get_lib() is not None


def _image_to_numpy(im) -> Tuple[np.ndarray, np.ndarray,
                                 Optional[np.ndarray]]:
    if not im:
        # the native firewall returns NULL only when it could not even
        # allocate the error struct (extreme memory pressure)
        raise IOError("native decode failed (out of memory)")
    c = im.contents
    if c.err:
        raise IOError(c.err.decode())
    shape = tuple(int(c.dims[i]) for i in range(c.ndim))
    arr = np.ctypeslib.as_array(c.data, shape=shape).copy()
    spacing = np.array([c.spacing[0], c.spacing[1], c.spacing[2]],
                       np.float64)
    affine = None
    if c.sform:
        affine = np.vstack([np.array(c.affine, np.float64).reshape(3, 4),
                            [0.0, 0.0, 0.0, 1.0]])
    return arr, spacing, affine


def read_nifti_native(path: str):
    """Native counterpart of utils.nifti.read_nifti. Returns
    (float32 array [z,y,x] / [t,z,y,x], spacing (z,y,x), affine|None).
    Raises IOError on decode failure (callers may fall back)."""
    lib = _get_lib()
    if lib is None:
        raise IOError("native loader unavailable")
    im = lib.srl_read_nifti(path.encode())
    try:
        return _image_to_numpy(im)
    finally:
        lib.srl_free_image(im)


def read_nifti_many(paths: Sequence[str], nthreads: int = 0,
                    strict: bool = True) -> List:
    """Decode many NIfTI files in parallel on the native thread pool.
    Returns a list of (array, spacing, affine) in input order.
    ``strict=False`` keeps successful decodes and returns ``None`` for
    failed files (with a warning) instead of raising the first error."""
    lib = _get_lib()
    if lib is None:
        raise IOError("native loader unavailable")
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_out = (ctypes.POINTER(_SrlImage) * n)()
    lib.srl_read_nifti_many(c_paths, n, c_out, int(nthreads))
    results, first_err = [], None
    # free EVERY native buffer no matter what raises mid-loop — a
    # MemoryError from the .copy() in _image_to_numpy must not leak the
    # remaining volumes' float buffers (potentially GBs)
    freed = 0
    try:
        for i in range(n):
            try:
                results.append(_image_to_numpy(c_out[i]))
            except IOError as e:
                first_err = first_err or e
                results.append(None)
            finally:
                lib.srl_free_image(c_out[i])
                freed = i + 1
    finally:
        for i in range(freed, n):
            lib.srl_free_image(c_out[i])
    if first_err is not None:
        if strict:
            raise first_err
        # keep the good decodes: one corrupt file must not throw away
        # (and force a full Python re-read of) the whole directory —
        # callers retry the None entries individually
        import warnings
        n_bad = sum(1 for r in results if r is None)
        warnings.warn(f"native ingest: {n_bad}/{n} file(s) failed "
                      f"({first_err}); falling back per-file")
    return results


def gather_triplets(slices: Sequence[Sequence[np.ndarray]],
                    out: Optional[np.ndarray] = None) -> np.ndarray:
    """Assemble [B, H, W, C] from B lists of C contiguous [H, W] float32
    planes — the native version of per-item np.stack(chans, axis=-1) +
    batch stack, threaded over items."""
    lib = _get_lib()
    if lib is None:
        raise IOError("native loader unavailable")
    b = len(slices)
    c = len(slices[0])
    h, w = slices[0][0].shape
    if out is None:
        out = np.empty((b, h, w, c), np.float32)
    elif (out.shape != (b, h, w, c) or out.dtype != np.float32
          or not out.flags["C_CONTIGUOUS"]):
        raise ValueError(
            f"gather_triplets: out must be C-contiguous float32 "
            f"{(b, h, w, c)}, got {out.dtype} {out.shape}")
    ptrs = (ctypes.POINTER(ctypes.c_float) * (b * c))()
    keepalive = []
    for i, chans in enumerate(slices):
        if len(chans) != c:
            raise ValueError(
                f"gather_triplets: item {i} has {len(chans)} channel "
                f"planes, expected {c}")
        for j, plane in enumerate(chans):
            if plane.shape != (h, w):
                # the numpy fallback's np.stack would raise too — the
                # native path must not silently read out of bounds
                raise ValueError(
                    f"gather_triplets: plane [{i}][{j}] has shape "
                    f"{plane.shape}, expected {(h, w)}")
            if (plane.dtype != np.float32
                    or not plane.flags["C_CONTIGUOUS"]):
                plane = np.ascontiguousarray(plane, np.float32)
            keepalive.append(plane)
            ptrs[i * c + j] = plane.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float))
    lib.srl_gather(ptrs, b, c, h * w,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 0)
    return out
