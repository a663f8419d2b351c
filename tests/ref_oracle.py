"""Golden oracle: the reference trico C library, compiled out-of-tree.

If the reference sources are mounted (``/root/reference``) we build them into
``/tmp/ref_build/libtrico_ref.so`` and expose the pieces our tests cross-check
against (FP codec, LZ4, the archive API). Tests that use this module skip when
the reference is unavailable — the in-repo sequential emulator still pins the
format in that case.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_REF = Path("/root/reference")
_SO = Path("/tmp/ref_build/libtrico_ref.so")
_lib = None
_failed = False


def get():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    try:
        if not _SO.exists():
            if not _REF.exists():
                _failed = True
                return None
            _SO.parent.mkdir(parents=True, exist_ok=True)
            srcs = [
                _REF / "trico/trico.c",
                _REF / "trico/floating_point_stream_compression.c",
                _REF / "trico/transpose_aos_to_soa.c",
                _REF / "lz4/lz4.c",
                _REF / "trico_io/iostl.c",
            ]
            cmd = ["gcc", "-O2", "-fPIC", "-shared", f"-I{_REF}"] + [str(s) for s in srcs] + ["-o", str(_SO)]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u8pp = ctypes.POINTER(ctypes.c_void_p)
        lib.trico_compress.restype = None
        lib.trico_compress.argtypes = [u32p, u8pp, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32]
        lib.trico_compress_double_precision.restype = None
        lib.trico_compress_double_precision.argtypes = [u32p, u8pp, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint64, ctypes.c_uint64]
        lib.trico_decompress.restype = None
        lib.trico_decompress.argtypes = [u32p, u8pp, ctypes.c_void_p]
        lib.trico_decompress_double_precision.restype = None
        lib.trico_decompress_double_precision.argtypes = [u32p, u8pp, ctypes.c_void_p]
        lib.LZ4_compress_default.restype = ctypes.c_int
        lib.LZ4_compress_default.argtypes = [ctypes.c_void_p] * 2 + [ctypes.c_int] * 2
        lib.LZ4_decompress_safe.restype = ctypes.c_int
        lib.LZ4_decompress_safe.argtypes = [ctypes.c_void_p] * 2 + [ctypes.c_int] * 2
        lib.trico_open_archive_for_writing.restype = ctypes.c_void_p
        lib.trico_open_archive_for_writing.argtypes = [ctypes.c_uint64]
        lib.trico_open_archive_for_reading.restype = ctypes.c_void_p
        lib.trico_open_archive_for_reading.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.trico_get_buffer_pointer.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.trico_get_buffer_pointer.argtypes = [ctypes.c_void_p]
        lib.trico_get_size.restype = ctypes.c_uint64
        lib.trico_get_size.argtypes = [ctypes.c_void_p]
        lib.trico_close_archive.argtypes = [ctypes.c_void_p]
        for name in ["vertices", "vertex_normals", "triangle_normals"]:
            f = getattr(lib, f"trico_write_{name}")
            f.restype = ctypes.c_int
            f.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32]
        for name in ["triangles", "vertex_colors", "attributes_uint16", "attributes_uint32",
                     "attributes_uint8", "attributes_float", "attributes_double",
                     "vertices_double", "triangles_long", "uv_per_vertex", "attributes_uint64"]:
            f = getattr(lib, f"trico_write_{name}")
            f.restype = ctypes.c_int
            f.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32]
        _lib = lib
    except Exception:
        _failed = True
    return _lib


def ref_fp_compress(values: np.ndarray, e1: int, e2: int) -> bytes:
    lib = get()
    values = np.ascontiguousarray(values)
    nbytes = ctypes.c_uint32(0)
    outp = ctypes.c_void_p(0)
    if values.dtype == np.uint32:
        lib.trico_compress(ctypes.byref(nbytes), ctypes.byref(outp), values.ctypes.data_as(ctypes.c_void_p), len(values), e1, e2)
    else:
        lib.trico_compress_double_precision(ctypes.byref(nbytes), ctypes.byref(outp), values.ctypes.data_as(ctypes.c_void_p), len(values), e1, e2)
    out = ctypes.string_at(outp.value, nbytes.value)
    # reference mallocs; leak-free enough for tests (no exported free of this ptr
    # besides libc free)
    ctypes.CDLL(None).free(outp)
    return out


def ref_fp_decompress(data: bytes, bits: int) -> np.ndarray:
    lib = get()
    n = ctypes.c_uint32(0)
    outp = ctypes.c_void_p(0)
    buf = ctypes.create_string_buffer(bytes(data), len(data))
    if bits == 32:
        lib.trico_decompress(ctypes.byref(n), ctypes.byref(outp), buf)
        arr = np.ctypeslib.as_array((ctypes.c_uint32 * n.value).from_address(outp.value)).copy()
    else:
        lib.trico_decompress_double_precision(ctypes.byref(n), ctypes.byref(outp), buf)
        arr = np.ctypeslib.as_array((ctypes.c_uint64 * n.value).from_address(outp.value)).copy()
    ctypes.CDLL(None).free(outp)
    return arr


def ref_lz4_compress(data: bytes) -> bytes:
    lib = get()
    cap = len(data) + len(data) // 255 + 32
    out = ctypes.create_string_buffer(cap)
    sz = lib.LZ4_compress_default(data, out, len(data), cap)
    assert sz > 0 or len(data) == 0
    return out.raw[:sz]


def ref_lz4_decompress(data: bytes, out_size: int) -> bytes:
    lib = get()
    out = ctypes.create_string_buffer(max(out_size, 1))
    sz = lib.LZ4_decompress_safe(data, out, len(data), out_size)
    assert sz == out_size, f"ref lz4 decode gave {sz}, want {out_size}"
    return out.raw[:out_size]


def ref_archive(mesh: dict) -> bytes | None:
    """Encode a mesh-stream dict with the compiled reference library into a
    complete v0 archive (stream order mirrors tools/trico_encoder/main.c:
    vertices, triangles, then optional attribute streams).

    Keys: vertices (f32/f64 (n,3)), triangles (u32/u64 (m,3)),
    vertex_normals (f32), vertex_colors (u32), uv_per_vertex (f32 (n,2)).
    Returns archive bytes, or None when the reference is unavailable."""
    lib = get()
    if lib is None:
        return None
    a = lib.trico_open_archive_for_writing(1 << 20)
    try:
        def vp(arr):
            return np.ascontiguousarray(arr).ctypes.data_as(ctypes.c_void_p)

        verts = np.ascontiguousarray(mesh["vertices"])
        nv = len(verts)
        if verts.dtype == np.float64:
            assert lib.trico_write_vertices_double(a, vp(verts), nv)
        else:
            assert lib.trico_write_vertices(a, vp(verts.astype(np.float32)), nv)
        tris = mesh.get("triangles")
        if tris is not None:
            tris = np.ascontiguousarray(tris)
            if tris.dtype == np.uint64:
                assert lib.trico_write_triangles_long(a, vp(tris), len(tris))
            else:
                assert lib.trico_write_triangles(
                    a, vp(tris.astype(np.uint32)), len(tris))
        if "vertex_normals" in mesh:
            assert lib.trico_write_vertex_normals(
                a, vp(np.ascontiguousarray(mesh["vertex_normals"],
                                           np.float32)), nv)
        if "vertex_colors" in mesh:
            assert lib.trico_write_vertex_colors(
                a, vp(np.ascontiguousarray(mesh["vertex_colors"],
                                           np.uint32)), nv)
        if "uv_per_vertex" in mesh:
            assert lib.trico_write_uv_per_vertex(
                a, vp(np.ascontiguousarray(mesh["uv_per_vertex"],
                                           np.float32)), nv)
        size = lib.trico_get_size(a)
        return ctypes.string_at(lib.trico_get_buffer_pointer(a), size)
    finally:
        lib.trico_close_archive(a)
