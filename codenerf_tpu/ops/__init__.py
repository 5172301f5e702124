from codenerf_tpu.ops.sampling import (
    base_z_vals,
    stratified_bins,
    sample_stratified,
    sample_pdf,
)
from codenerf_tpu.ops.volume_render import (
    volume_render,
    widened_sigmoid,
    shifted_softplus,
)

__all__ = [
    "base_z_vals",
    "stratified_bins",
    "sample_stratified",
    "sample_pdf",
    "volume_render",
    "widened_sigmoid",
    "shifted_softplus",
]
