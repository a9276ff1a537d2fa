#!/usr/bin/env python
"""Generate a high-poly triangle OBJ (dragon.obj substitute).

The reference repo's dragon.obj is stripped from this mount
(.MISSING_LARGE_BLOBS:1); BASELINE config (e) needs a large mesh to
exercise the native OBJ loader and BVH at scale.  This writes a finely
tessellated trefoil-knot tube — smooth, self-occluding, arbitrary
triangle count.

Usage: python tools/make_mesh.py out.obj [segments] [rings]
Triangles = 2 * segments * rings  (default 600x300 -> 360k).
"""
from __future__ import annotations

import argparse

import numpy as np


def trefoil(t: np.ndarray) -> np.ndarray:
    x = np.sin(t) + 2.0 * np.sin(2.0 * t)
    y = np.cos(t) - 2.0 * np.cos(2.0 * t)
    z = -np.sin(3.0 * t)
    return np.stack([x, y, z], axis=-1) * 0.25


def make_knot(segments: int, rings: int, radius: float = 0.12) -> tuple:
    t = np.linspace(0.0, 2.0 * np.pi, segments, endpoint=False)
    c = trefoil(t)  # (S, 3) centerline
    # Frames via finite differences.
    tang = trefoil(t + 1e-4) - trefoil(t - 1e-4)
    tang /= np.linalg.norm(tang, axis=-1, keepdims=True)
    ref = np.array([0.0, 0.0, 1.0])
    n1 = np.cross(tang, ref)
    bad = np.linalg.norm(n1, axis=-1) < 1e-6
    n1[bad] = np.cross(tang[bad], [1.0, 0.0, 0.0])
    n1 /= np.linalg.norm(n1, axis=-1, keepdims=True)
    n2 = np.cross(tang, n1)

    phi = np.linspace(0.0, 2.0 * np.pi, rings, endpoint=False)
    verts = (
        c[:, None, :]
        + radius * (np.cos(phi)[None, :, None] * n1[:, None, :]
                    + np.sin(phi)[None, :, None] * n2[:, None, :])
    ).reshape(-1, 3)  # (S*R, 3)

    faces = []
    for i in range(segments):
        i2 = (i + 1) % segments
        for j in range(rings):
            j2 = (j + 1) % rings
            a = i * rings + j
            b = i2 * rings + j
            cc = i2 * rings + j2
            d = i * rings + j2
            # Wound so outward normals face the camera under the
            # reference's backface culling (det >= 1e-6).
            faces.append((a, cc, b))
            faces.append((a, d, cc))
    return verts, np.asarray(faces, np.int64)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("out", nargs="?", default="knot.obj",
                    help="output OBJ path (default: knot.obj)")
    ap.add_argument("segments", nargs="?", type=int, default=600)
    ap.add_argument("rings", nargs="?", type=int, default=300)
    args = ap.parse_args()
    out, segments, rings = args.out, args.segments, args.rings
    if out.startswith("-"):
        # A 13 MB mesh literally named `--help` was once committed this
        # way; refuse option-like output paths outright.
        ap.error(f"output path {out!r} looks like an option")
    verts, faces = make_knot(segments, rings)
    with open(out, "w") as f:
        f.write(f"# trefoil knot {segments}x{rings}\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:  # OBJ is 1-based
            f.write(f"f {a} {b} {c}\n")
    print(f"{out}: {len(verts)} verts, {len(faces)} tris")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
