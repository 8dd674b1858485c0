from exoground_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from exoground_tpu.parallel.train_step import (
    make_grounding_eval_step,
    make_grounding_train_step,
    make_s3d_nce_step,
    make_tan_eval_step,
    make_tan_train_step,
)
from exoground_tpu.parallel.sequence import (
    ring_attention,
    sequence_parallel_dual_sim,
    sequence_parallel_sim,
    sequence_sharded_self_attention,
)
