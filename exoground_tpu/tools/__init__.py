from exoground_tpu.tools.sentencify import (
    Sentencify,
    english_score,
    filter_language,
    filter_length,
    merge_linebreaks,
    process_corpus,
)
from exoground_tpu.tools.extract_features import (
    ExtractConfig,
    bf16_params_keep_layernorm,
    extract_corpus,
    extract_video_features,
)
from exoground_tpu.tools.asr import (
    WhisperASR,
    detect_language,
    save_asr_json,
    transcribe_or_translate,
)
