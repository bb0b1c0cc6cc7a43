from tpusr.dist.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    pad_to_multiple,
)
from tpusr.dist.tp import (
    make_tp_mesh,
    tp_spec,
    shard_params_tp,
)
from tpusr.dist.spatial import (
    make_ring_attention,
    spatial_sharding,
    full_image_esrgan_sr,
)
from tpusr.dist.pp import (
    make_pp_mesh,
    make_pp_edsr_apply,
    make_pp_train_step,
    stack_res_params,
)
