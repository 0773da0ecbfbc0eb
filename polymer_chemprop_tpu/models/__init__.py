"""Model layer: functional wD-MPNN encoder + FFN head."""

from .encoder import EncoderConfig, apply_encoder, init_encoder
from .model import (
    ModelConfig,
    apply_ffn,
    apply_model,
    encode,
    fingerprint,
    init_model,
    postprocess_preds,
)
from .nn import (
    compute_gnorm,
    compute_pnorm,
    dropout,
    get_activation,
    init_linear,
    linear,
    param_count,
    xavier_normal,
)

__all__ = [
    "EncoderConfig", "apply_encoder", "init_encoder",
    "ModelConfig", "apply_ffn", "apply_model", "encode", "fingerprint",
    "init_model", "postprocess_preds",
    "compute_gnorm", "compute_pnorm", "dropout", "get_activation",
    "init_linear", "linear", "param_count", "xavier_normal",
]
