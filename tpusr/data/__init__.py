from tpusr.data.loading import (
    add_padding,
    get_all_image_paths,
    load_dataset_as_patches,
    load_defects_dataset_as_patches,
    load_predictions_dataset,
)
from tpusr.data.degrade import degrade_image, DegradeConfig
