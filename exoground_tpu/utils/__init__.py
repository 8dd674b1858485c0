from exoground_tpu.utils.meters import AverageMeter, ProgressMeter, MovingAverage
from exoground_tpu.utils.convert import (
    convert_tan_state_dict,
    convert_word2vec_from_s3d,
    load_torch_checkpoint,
)
