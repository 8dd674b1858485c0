from exoground_tpu.evals.align import (
    AlignEvalConfig,
    test_alignment_htm,
    make_tan_sim_fn,
    roc_auc,
)
from exoground_tpu.evals.align_fused import test_alignment_htm_fused, FusedAlignEvaluator
from exoground_tpu.evals.retrieval import test_retrieval_yc2, compute_retrieval_metrics
