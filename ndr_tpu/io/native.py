"""ctypes bindings for the native IO runtime (native/ndrio.cpp).

Builds the shared library on first use (g++ via the bundled Makefile)
and exposes fast mesh/field IO; every entry point has a pure-Python
fallback in :mod:`ndr_tpu.io.export`, so the framework works without a
toolchain — just slower on multi-million-voxel exports.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libndrio.so"))
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=os.path.abspath(_NATIVE_DIR), check=True,
            capture_output=True,
        )
        return True
    except Exception as e:  # toolchain missing / build failure
        sys.stderr.write(f"[ndrio] native build failed ({e}); using Python IO\n")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        sys.stderr.write(f"[ndrio] load failed ({e}); using Python IO\n")
        return None

    lib.ndrio_write_msh.restype = ctypes.c_int
    lib.ndrio_write_msh.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64), ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64), ctypes.c_int64,
    ]
    lib.ndrio_read_msh_field.restype = ctypes.c_int64
    lib.ndrio_read_msh_field.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64), ctypes.c_int64,
    ]
    lib.ndrio_write_vtr.restype = ctypes.c_int
    lib.ndrio_write_vtr.argtypes = [
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.float64),
    ]
    lib.ndrio_load_ct_slices.restype = ctypes.c_int
    lib.ndrio_load_ct_slices.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32),
    ]
    _lib = lib
    return _lib


def write_msh(path: str, grid, field: np.ndarray, name: str = "density") -> bool:
    """Fast binary Gmsh export; returns False if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    dims = np.zeros(3, np.int64)
    dims[: grid.ndim] = grid.dims
    origin = np.zeros(3)
    origin[: grid.ndim] = grid.domain_min
    spacing = np.ones(3)
    spacing[: grid.ndim] = grid.stretchings
    field = np.ascontiguousarray(np.asarray(field, np.float64).reshape(-1))
    rc = lib.ndrio_write_msh(
        path.encode(), grid.ndim, dims, origin, spacing, name.encode(),
        field, field.size,
    )
    if rc != 0:
        raise IOError(f"ndrio_write_msh failed with code {rc}")
    return True


def read_msh_field(path: str, name: str, num_elements: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros(num_elements, np.float64)
    n = lib.ndrio_read_msh_field(path.encode(), name.encode(), out, out.size)
    if n < 0:
        raise IOError(f"ndrio_read_msh_field failed with code {n}")
    return out[:n]


def write_vtr(path: str, field: np.ndarray, spacing=None, origin=None,
              name: str = "data") -> bool:
    lib = get_lib()
    if lib is None:
        return False
    field = np.asarray(field, np.float64)
    if field.ndim == 2:
        field = field[..., None]
    dims = np.asarray(field.shape, np.int64)
    spacing = np.asarray(
        (spacing or (1.0, 1.0, 1.0))[:3] if spacing else (1.0, 1.0, 1.0),
        np.float64,
    )
    origin = np.asarray(origin or (0.0, 0.0, 0.0), np.float64)
    if not path.endswith(".vtr"):
        path = path + ".vtr"
    rc = lib.ndrio_write_vtr(
        path.encode(), dims, origin, spacing, name.encode(),
        np.ascontiguousarray(field.reshape(-1)),
    )
    if rc != 0:
        raise IOError(f"ndrio_write_vtr failed with code {rc}")
    return True


def load_ct(path: str, shape, interpolate_size=None) -> np.ndarray:
    """Load a directory of 16-bit big-endian CT slices into a volume of
    shape (h, w, n_slices) scaled to [0,1], optionally trilinearly
    resized in-plane (reference: utils.load_ct, utils.py:379-406)."""
    files: List[str] = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if os.path.isfile(os.path.join(path, f))
    )
    n = len(files)
    h, w = shape
    lib = get_lib()
    if lib is not None:
        out = np.zeros((n, h, w), np.float32)
        blob = b"\0".join(f.encode() for f in files) + b"\0"
        rc = lib.ndrio_load_ct_slices(blob, n, h, w, out)
        if rc != 0:
            raise IOError(f"ndrio_load_ct_slices failed with code {rc}")
        vol = np.transpose(out, (1, 2, 0))
    else:
        slices = []
        for f in files:
            data = np.frombuffer(open(f, "rb").read(), dtype=">u2")
            slices.append(data.reshape(shape).astype(np.float32) / 65535.0)
        vol = np.stack(slices, axis=-1)
    if interpolate_size is not None:
        import jax
        vol = np.asarray(
            jax.image.resize(
                vol, (interpolate_size[0], interpolate_size[1], n), "trilinear"
            )
        )
    return np.clip(vol, 0.0, 1.0)
