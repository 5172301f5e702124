from codenerf_tpu.core.geometry import (
    pixel_directions,
    ray_bundle,
    select_ray_indices,
    pose_spherical,
    ndc_rays,
)
from codenerf_tpu.core.encoding import positional_encoding, encoding_dim
from codenerf_tpu.core import lie
from codenerf_tpu.core.metrics import mse2psnr

__all__ = [
    "pixel_directions",
    "ray_bundle",
    "select_ray_indices",
    "pose_spherical",
    "ndc_rays",
    "positional_encoding",
    "encoding_dim",
    "lie",
    "mse2psnr",
]
