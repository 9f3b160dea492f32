"""ctypes bridge to the native batch-packing kernels (csrc/fastpack.c).

Compiled on first use with the system C compiler into a per-version cached
shared object; every entry point has a numpy fallback so the framework
works without a toolchain. This is the TPU-native counterpart of the
native code the reference outsources to apsw/torch-scatter (SURVEY §2.9):
host-side input packing off the Python interpreter's critical path.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import subprocess
import tempfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parent.parent.parent / "csrc" / "fastpack.c"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SRC.exists():
        return None
    tag = hashlib.md5(_SRC.read_bytes()).hexdigest()[:12]
    so_path = Path(tempfile.gettempdir()) / f"nabladft_fastpack_{tag}.so"
    if not so_path.exists():
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", "-o", str(so_path), str(_SRC)],
                    check=True, capture_output=True,
                )
                break
            except (FileNotFoundError, subprocess.CalledProcessError):
                continue
        else:
            logger.warning("no C compiler available; using numpy fallback")
            return None
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.pack_energy_batch.argtypes = [
        i32p, f32p, f32p, f32p, i64p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i32p, f32p, f32p, u8p, u8p, f32p,
    ]
    lib.pack_square_matrices.argtypes = [
        f32p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f32p, u8p,
    ]
    _lib = lib
    logger.info("fastpack native kernels loaded (%s)", so_path)
    return _lib


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def available() -> bool:
    return _build() is not None


def pack_energy_batch(
    z_cat: np.ndarray,
    pos_cat: np.ndarray,
    forces_cat: np.ndarray,
    energy_all: np.ndarray,
    offsets: np.ndarray,
    indices: np.ndarray,
    batch_size: int,
    max_atoms: int,
) -> Tuple[np.ndarray, ...]:
    """Returns (z, pos, forces, node_mask, graph_mask, energy) padded arrays."""
    lib = _build()
    b, a = batch_size, max_atoms
    indices = np.ascontiguousarray(indices, np.int64)
    if lib is None:
        z = np.zeros((b, a), np.int32)
        pos = np.zeros((b, a, 3), np.float32)
        forces = np.zeros((b, a, 3), np.float32)
        node_mask = np.zeros((b, a), bool)
        graph_mask = np.zeros((b,), bool)
        energy = np.zeros((b,), np.float32)
        for slot, mol in enumerate(indices):
            s, e = offsets[mol], offsets[mol + 1]
            n = min(int(e - s), a)
            z[slot, :n] = z_cat[s : s + n]
            pos[slot, :n] = pos_cat[s : s + n]
            forces[slot, :n] = forces_cat[s : s + n]
            node_mask[slot, :n] = True
            graph_mask[slot] = True
            energy[slot] = energy_all[mol]
        return z, pos, forces, node_mask, graph_mask, energy

    z = np.empty((b, a), np.int32)
    pos = np.empty((b, a, 3), np.float32)
    forces = np.empty((b, a, 3), np.float32)
    node_mask = np.empty((b, a), np.uint8)
    graph_mask = np.empty((b,), np.uint8)
    energy = np.empty((b,), np.float32)
    lib.pack_energy_batch(
        _ptr(np.ascontiguousarray(z_cat, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(pos_cat, np.float32), ctypes.c_float),
        _ptr(np.ascontiguousarray(forces_cat, np.float32), ctypes.c_float),
        _ptr(np.ascontiguousarray(energy_all, np.float32), ctypes.c_float),
        _ptr(np.ascontiguousarray(offsets, np.int64), ctypes.c_int64),
        _ptr(indices, ctypes.c_int64),
        len(indices), b, a,
        _ptr(z, ctypes.c_int32), _ptr(pos, ctypes.c_float),
        _ptr(forces, ctypes.c_float), _ptr(node_mask, ctypes.c_uint8),
        _ptr(graph_mask, ctypes.c_uint8), _ptr(energy, ctypes.c_float),
    )
    return z, pos, forces, node_mask.astype(bool), graph_mask.astype(bool), energy


def pack_square_matrices(
    mats: list, batch_size: int, max_orb: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a list of [n_i, n_i] float32 matrices to [B, O, O] + orbital mask."""
    lib = _build()
    if lib is None:
        out = np.zeros((batch_size, max_orb, max_orb), np.float32)
        mask = np.zeros((batch_size, max_orb), bool)
        for i, m in enumerate(mats):
            n = min(m.shape[0], max_orb)
            out[i, :n, :n] = m[:n, :n]
            mask[i, :n] = True
        return out, mask
    sizes = np.asarray([m.shape[0] for m in mats], np.int64)
    cat = (
        np.concatenate([np.ascontiguousarray(m, np.float32).ravel() for m in mats])
        if mats
        else np.zeros(0, np.float32)
    )
    out = np.empty((batch_size, max_orb, max_orb), np.float32)
    mask = np.empty((batch_size, max_orb), np.uint8)
    lib.pack_square_matrices(
        _ptr(cat, ctypes.c_float), _ptr(sizes, ctypes.c_int64),
        len(mats), batch_size, max_orb,
        _ptr(out, ctypes.c_float), _ptr(mask, ctypes.c_uint8),
    )
    return out, mask.astype(bool)
