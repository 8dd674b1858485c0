from exoground_tpu.ops.activations import quick_gelu
from exoground_tpu.ops.pos_embed import (
    get_position_embedding_sine,
    position_embedding_sine_from_mask,
    interpolate_pos_embed,
    slice_or_interpolate_pos_embed,
)
from exoground_tpu.ops.attention import (
    MultiHeadAttention,
    attention_xla,
    set_default_attention_impl,
)
from exoground_tpu.ops.blocks import (
    ResidualAttentionBlock,
    ResidualDecoderBlock,
    TemporalEncoder,
    TemporalDecoder,
    MLP,
)
from exoground_tpu.ops.masks import (
    mask_from_time,
    window_scan_kernel,
    masked_quantile,
)
