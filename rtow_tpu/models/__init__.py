"""Scene object model: cameras, materials, SoA scene arrays, builders."""
from .camera import Camera, Rays, camera_rays, make_camera, pixel_coords
from .materials import HitRecord, ScatterResult, scatter, sky_color
from .scene import (
    DIELECTRIC,
    LAMBERTIAN,
    METAL,
    Materials,
    Scene,
    SceneBuilder,
    Spheres,
    Triangles,
)
