from codenerf_tpu.models.mlp import (
    CodeNeRFConfig,
    FlexibleNeRFConfig,
    init_codenerf,
    apply_codenerf,
    init_flexible_nerf,
    apply_flexible_nerf,
)
from codenerf_tpu.models.codes import (
    init_code_tables,
    lookup_codes,
    mean_codes,
    code_table_norms,
)

__all__ = [
    "CodeNeRFConfig",
    "FlexibleNeRFConfig",
    "init_codenerf",
    "apply_codenerf",
    "init_flexible_nerf",
    "apply_flexible_nerf",
    "init_code_tables",
    "lookup_codes",
    "mean_codes",
    "code_table_norms",
]
