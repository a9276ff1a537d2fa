"""rtow_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of joaotavora/raytracing-one-weekend
(C++ CPU path tracer): SoA scenes, counter-based RNG, a wavefront bounce
loop instead of recursion, mesh-sharded rendering via shard_map, and
reverse-mode gradients w.r.t. scene geometry and materials.
"""
import os as _os

import jax as _jax

# Persistent compilation cache: the megakernel + fused bounce loops take
# minutes to compile (remote Mosaic/XLA compile on the TPU host); cache
# them across processes.  Opt out with RTOW_NO_COMPILE_CACHE=1; no-op
# when the embedder already configured a cache dir.
if (_jax.config.jax_compilation_cache_dir is None
        and not _os.environ.get("RTOW_NO_COMPILE_CACHE")):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.expanduser("~"), ".cache", "jax"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from .config import Config
from .models.builders import (
    cover_scene,
    mesh_scene,
    one_sphere_scene,
    scene_for_config,
    three_sphere_scene,
)
from .models.camera import Camera, Rays, camera_rays, make_camera
from .models.scene import Scene, SceneBuilder
from .render import render

__version__ = "0.1.0"

__all__ = [
    "Config",
    "Camera",
    "Rays",
    "Scene",
    "SceneBuilder",
    "camera_rays",
    "cover_scene",
    "make_camera",
    "mesh_scene",
    "one_sphere_scene",
    "render",
    "scene_for_config",
    "three_sphere_scene",
]
