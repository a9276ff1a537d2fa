"""Backend/parallelism dispatch for rendering.

Picks the intersection backend (brute-force sweep, stackless BVH, or the
Pallas megakernel) and the execution layout (single device vs mesh-sharded)
from a Config.  Keeps `render.py` (the scheduler) free of policy.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .config import Config
from .models.camera import Camera
from .models.scene import Scene
from .render import render


def pick_nearest_hit(scene: Scene, cfg: Config):
    """Choose the nearest-hit implementation for this scene/config."""
    if cfg.use_bvh and scene.n_triangles > 64:
        from .ops import bvh

        return bvh.make_nearest_hit(scene)
    return None  # integrator defaults to the brute-force sweep


def render_auto(
    scene: Scene,
    camera: Camera,
    cfg: Config,
    key=None,
    progress: bool = False,
) -> np.ndarray:
    """Render with the best available backend for the config."""
    import jax

    nearest = pick_nearest_hit(scene, cfg)
    if cfg.n_devices > 1 and len(jax.devices()) > 1:
        from .parallel.sharded import render_sharded

        return render_sharded(scene, camera, cfg, key=key, nearest_hit=nearest,
                              progress=progress)
    return render(scene, camera, cfg, key=key, nearest_hit=nearest, progress=progress)
