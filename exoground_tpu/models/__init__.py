from exoground_tpu.models.word2vec import Word2VecTokenizer, Word2VecModel
from exoground_tpu.models.aligner import TemporalAligner
from exoground_tpu.models.grounding import ExoGroundingTransformer, GroundingModel
from exoground_tpu.models.vi_encoder import ViewInvariantEncoder, ViewInvariantMLP
from exoground_tpu.models.ema import ema_init, ema_update
