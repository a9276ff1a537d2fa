"""Wavefront OBJ ingestion (triangles only).

The reference loads meshes with tinyobjloader in double precision and
accepts only triangular faces, throwing otherwise (reference
src/main.cpp:109-131).  This loader reproduces that contract in pure
Python/NumPy: ``v`` and ``f`` records, vertex indices only (normals/UVs in
``a/b/c`` face entries are parsed and ignored, as the reference ignores
them), negative OBJ indices supported, everything else skipped.

A C++ fast path (rtow_tpu.native) is used automatically for large meshes
when the extension is built; this is the always-available fallback.

Documented deviation — multi-shape files: the reference loads
``shapes[0]`` only (src/main.cpp:115), silently dropping every other
object in the file.  This loader ingests the WHOLE file: ``o``/``g``
records are treated as pass-through (all shapes' faces concatenate into
one triangle array), so a multi-object export renders complete instead
of truncated.  Per-shape materials are out of scope either way — the
reference binds one shared gray Lambertian to every face
(src/main.cpp:100-101,127) and so do our mesh builders.  Tested in
tests/test_builders.py::test_multi_shape_loads_all_shapes.
"""
from __future__ import annotations

import numpy as np


class ObjError(RuntimeError):
    pass


def load_obj(path: str, use_native: bool = True) -> np.ndarray:
    """Load an OBJ file -> triangle vertex array (M, 3, 3) float64.

    Raises ObjError on non-triangular faces, like the reference
    (src/main.cpp:130).  Dispatches to the C++ loader (rtow_tpu.native)
    when its shared library is available; this Python path is the
    always-available fallback and the parity oracle.
    """
    if use_native:
        try:
            from .. import native

            if native.available():
                return native.load_obj(path)
        except ObjError:
            raise
        except Exception:
            pass  # toolchain missing / load failure -> Python fallback
    verts: list[tuple[float, float, float]] = []
    faces: list[tuple[int, int, int]] = []
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for lineno, raw in enumerate(f, 1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                if len(parts) < 4:
                    raise ObjError(f"{path}:{lineno}: malformed vertex")
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif tag == "f":
                corners = parts[1:]
                if len(corners) != 3:
                    raise ObjError(
                        f"{path}:{lineno}: found a face that isn't a triangle "
                        f"({len(corners)} vertices)"
                    )
                idx = []
                for c in corners:
                    # "v", "v/vt", "v//vn", "v/vt/vn" — keep the vertex index.
                    v_str = c.split("/", 1)[0]
                    v = int(v_str)
                    # OBJ is 1-based; negatives count from the end.
                    idx.append(v - 1 if v > 0 else len(verts) + v)
                faces.append((idx[0], idx[1], idx[2]))
            # 'vn', 'vt', 'o', 'g', 's', 'usemtl', 'mtllib': ignored.
    if not faces:
        raise ObjError(f"{path}: no triangular faces found")
    v = np.asarray(verts, dtype=np.float64)
    f_arr = np.asarray(faces, dtype=np.int64)
    if f_arr.min() < 0 or f_arr.max() >= len(v):
        raise ObjError(f"{path}: face index out of range")
    return v[f_arr]  # (M, 3 corners, 3 coords)
