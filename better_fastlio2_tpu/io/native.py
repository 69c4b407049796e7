"""ctypes bindings for the native host runtime (native/src/preprocess.cc).

Loads (and on first use builds, via g++ or cmake) the shared library; if
the toolchain is unavailable every entry point falls back to the numpy
implementations in io/preprocess.py — identical behavior, slower host
path.  The native path mirrors the reference's C++ Preprocess layer
(SURVEY.md §2.1 [NATIVE-CORE]).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "decode_xyzi", "decode_livox", "decode_nclt",
           "write_pcd_xyzi", "voxel_downsample_host", "pack_quant_bulk"]

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "src", "preprocess.cc")
_LIB_PATH = os.path.join(_REPO, "native", "libbflio2_native.so")

_lib = None
_tried = False


def _build() -> bool:
    # link to a temp file + atomic replace: never truncate a .so another
    # process (or a previously-dlopened handle in THIS process) has
    # mapped — glibc dedups dlopen by inode, so an in-place relink both
    # fails to refresh the handle and risks corrupting mapped pages
    tmp = _LIB_PATH + ".tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _is_stale() -> bool:
    """Pre-dlopen staleness check: the v2 wire symbol must appear in the
    .so's symbol strings (checked on the raw bytes — loading first and
    rebuilding after would hand back the stale inode-deduped handle)."""
    try:
        with open(_LIB_PATH, "rb") as f:
            return b"pack_quant2" not in f.read()
    except OSError:
        return True


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.path.exists(_SRC) and (
            not os.path.exists(_LIB_PATH) or _is_stale()):
        _build()
    if os.path.exists(_LIB_PATH) and not _is_stale():
        lib = ctypes.CDLL(_LIB_PATH)
        c_i64, c_f32p, c_f64p = ctypes.c_int64, np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(np.float64)
        lib.decode_xyzi.restype = c_i64
        lib.decode_xyzi.argtypes = [
            c_f32p, c_i64, ctypes.c_int, ctypes.c_void_p, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, c_f32p, c_f64p,
            c_f32p,
        ]
        lib.decode_livox.restype = c_i64
        lib.decode_livox.argtypes = [
            c_f32p, ctypes.c_void_p, np.ctypeslib.ndpointer(np.uint8),
            np.ctypeslib.ndpointer(np.int64), c_i64, ctypes.c_double,
            ctypes.c_int, c_f32p, c_f64p, c_f32p,
        ]
        lib.decode_nclt.restype = c_i64
        lib.decode_nclt.argtypes = [
            np.ctypeslib.ndpointer(np.uint8), c_i64, c_f32p, c_f32p,
        ]
        lib.write_pcd_xyzi.restype = ctypes.c_int
        lib.write_pcd_xyzi.argtypes = [ctypes.c_char_p, c_f32p,
                                       ctypes.c_void_p, c_i64]
        lib.voxel_downsample.restype = c_i64
        lib.voxel_downsample.argtypes = [
            c_f32p, c_i64, ctypes.c_double,
            np.ctypeslib.ndpointer(np.int64), c_f64p, c_i64, c_f32p,
        ]
        try:
            lib.pack_quant2.restype = None
            lib.pack_quant2.argtypes = [
                c_f32p, c_f32p, c_i64, ctypes.c_double, ctypes.c_double,
                np.ctypeslib.ndpointer(np.uint16),
            ]
        except AttributeError:  # stale pre-built .so without the symbol
            pass
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_xyzi(xyzi: np.ndarray, t_in: np.ndarray | None = None,
                time_scale: float = 1.0, scan_period: float = 0.1,
                blind: float = 0.01, point_filter_num: int = 1):
    """Native velodyne/ouster-style decode; numpy fallback otherwise."""
    lib = _load()
    xyzi = np.ascontiguousarray(xyzi, np.float32)
    n, stride = xyzi.shape
    if lib is None:
        from .preprocess import preprocess_velodyne

        return preprocess_velodyne(
            xyzi[:, :3], xyzi[:, 3] if stride > 3 else None,
            t_in, 0 if time_scale == 1.0 else 2,
            1.0 / scan_period, blind, point_filter_num,
        )
    pts = np.empty((n, 3), np.float32)
    t = np.empty(n, np.float64)
    inten = np.empty(n, np.float32)
    t_ptr = (
        np.ascontiguousarray(t_in, np.float64).ctypes.data_as(ctypes.c_void_p)
        if t_in is not None
        else None
    )
    m = lib.decode_xyzi(xyzi, n, stride, t_ptr, time_scale, scan_period,
                        blind, point_filter_num, pts, t, inten)
    return pts[:m], t[:m], inten[:m]


def decode_livox(xyz, inten, tag, offset_ns, blind=0.01, point_filter_num=1):
    lib = _load()
    if lib is None:
        from .preprocess import preprocess_livox

        return preprocess_livox(xyz, inten, tag, offset_ns, blind,
                                point_filter_num)
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    pts = np.empty((n, 3), np.float32)
    t = np.empty(n, np.float64)
    out_i = np.empty(n, np.float32)
    inten_ptr = (
        np.ascontiguousarray(inten, np.float32).ctypes.data_as(ctypes.c_void_p)
        if inten is not None
        else None
    )
    m = lib.decode_livox(
        xyz, inten_ptr, np.ascontiguousarray(tag, np.uint8),
        np.ascontiguousarray(offset_ns, np.int64), n, blind,
        point_filter_num, pts, t, out_i,
    )
    return pts[:m], t[:m], out_i[:m]


def decode_nclt(raw: bytes | np.ndarray):
    lib = _load()
    raw = np.frombuffer(raw, np.uint8) if isinstance(raw, bytes) else raw
    if lib is None:
        import io as _io

        from .nclt import decode_nclt_bin  # numpy path reads from file

        raise RuntimeError("native library unavailable; use nclt.decode_nclt_bin")
    n = len(raw) // 8
    pts = np.empty((n, 3), np.float32)
    inten = np.empty(n, np.float32)
    m = lib.decode_nclt(np.ascontiguousarray(raw), len(raw), pts, inten)
    return pts[:m], inten[:m]


def write_pcd_xyzi(path: str, xyz: np.ndarray,
                   inten: np.ndarray | None = None) -> None:
    lib = _load()
    if lib is None:
        from .pcd import write_pcd

        write_pcd(path, xyz, inten)
        return
    xyz = np.ascontiguousarray(xyz, np.float32)
    ptr = (
        np.ascontiguousarray(inten, np.float32).ctypes.data_as(ctypes.c_void_p)
        if inten is not None
        else None
    )
    rc = lib.write_pcd_xyzi(path.encode(), xyz, ptr, len(xyz))
    if rc != 0:
        raise IOError(f"write_pcd_xyzi failed rc={rc}")


def voxel_downsample_host(pts: np.ndarray, voxel: float) -> np.ndarray:
    """Host-side centroid downsample (native, with numpy fallback)."""
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float32)
    if lib is None:
        keys = np.floor(pts / voxel).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        acc = np.zeros((len(uniq), 3))
        np.add.at(acc, inv, pts)
        cnt = np.bincount(inv)
        return (acc / cnt[:, None]).astype(np.float32)
    cap = 1
    while cap < 2 * len(pts):
        cap <<= 1
    tk = np.empty(cap, np.int64)
    ta = np.empty(cap * 4, np.float64)
    out = np.empty((cap, 3), np.float32)
    m = lib.voxel_downsample(pts, len(pts), voxel, tk, ta, cap, out)
    return out[:m]


def pack_quant_bulk(pts: np.ndarray, t: np.ndarray, pos_scale: float,
                    dur: float) -> np.ndarray | None:
    """Native bulk-row packer for the quantized wire format
    (pipeline/lio.QuantWindowInputs, v2: uint8 time pairs); None if the
    library lacks it (caller falls back to numpy)."""
    lib = _load()
    if lib is None or not hasattr(lib, "pack_quant2") or \
            lib.pack_quant2.argtypes is None:
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    t = np.ascontiguousarray(t, np.float32)
    n_raw = len(t)
    bulk = np.empty(3 * n_raw + n_raw // 2, np.uint16)
    lib.pack_quant2(pts, t, n_raw, float(pos_scale), float(dur), bulk)
    return bulk
