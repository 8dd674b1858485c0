from exoground_tpu.data.io import FeatureStore, load_npy_window, load_pt
from exoground_tpu.data.sampling import (
    CurriculumShardedSampler,
    ShardedSampler,
    batched,
    get_phase,
)
from exoground_tpu.data.pipeline import (
    BackgroundIterator,
    ThreadedLoader,
    device_prefetch,
)
from exoground_tpu.data.collate import (
    collate_dicts,
    pad_by_last,
    stack_features,
    stack_texts,
    stack_videos,
)
from exoground_tpu.data.htm import HTMAlignDataset, HTMConfig, HTMFeatureDataset
from exoground_tpu.data.egoexo4d import (
    EgoExo4DDataset,
    EgoExo4DTANDataset,
    EgoExoConfig,
    EgoExoSource,
    camera_view_order,
)
from exoground_tpu.data.lemma import LemmaConfig, LemmaDataset
from exoground_tpu.data.youcook2 import YouCook2Config, YouCook2Dataset
