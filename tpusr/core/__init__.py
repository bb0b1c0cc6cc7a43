from tpusr.core.pad import pad_amounts, reflect_pad
from tpusr.core.resize import resize, resize_weights
from tpusr.core.patches import (
    patch_grid_size,
    patchify,
    overlap_add,
    overlap_weight,
)
