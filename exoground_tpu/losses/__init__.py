from exoground_tpu.losses.infonce import (
    info_nce_diag,
    pairwise_view_info_nce,
    cross_view_info_nce,
    l1_cosine_metrics,
    symmetric_info_nce,
)
from exoground_tpu.losses.milnce import tan_loss
from exoground_tpu.losses.grounding import grounding_loss, view_invariant_loss, egoexo_loss
