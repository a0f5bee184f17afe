"""Model layer: backbones, skip-pyramid encoder, ConvLSTM recurrent decoder."""

from .backbones import BACKBONES, SKIP_DIMS  # noqa: F401
from .clstm import ConvLSTMCell  # noqa: F401
from .decoder import RSISDecoder, init_carry, decoder_widths  # noqa: F401
from .encoder import FeatureExtractor  # noqa: F401
from .rsis import (  # noqa: F401
    build_models,
    compute_dtype,
    decode_sequence,
    forward,
    init_variables,
)
