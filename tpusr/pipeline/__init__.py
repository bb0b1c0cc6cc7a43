from tpusr.pipeline.inference import (
    sr_inference_fn,
    super_resolve_image,
    super_resolve_full_image,
    srcnn_super_resolve,
)
from tpusr.pipeline.defect_pipeline import (
    make_patch_classifier,
    classify_defects,
    FusedSRClassifyPipeline,
    make_serving_pipeline,
    run_defect_detection_comparison,
)
from tpusr.pipeline.serving import PipelineServer
