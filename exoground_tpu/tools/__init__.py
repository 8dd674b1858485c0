from exoground_tpu.tools.sentencify import (
    Sentencify,
    english_score,
    filter_language,
    filter_length,
    merge_linebreaks,
    process_corpus,
)
