"""MoleculeModel: wD-MPNN encoder(s) + feed-forward head.

Functional equivalent of the reference MoleculeModel/MPN pair
(reference models/model.py:14-195, models/mpn.py:176-289): one encoder per
molecule position (optionally shared), position encodings concatenated,
optional molecule-level extra features appended, then an FFN whose output is
sigmoid-ed (classification, eval only), softmax-reshaped (multiclass), or
exp/softplus-activated (spectra).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .encoder import EncoderConfig, apply_encoder, init_encoder
from .nn import dropout, get_activation, init_linear, linear


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model hyperparameters (subset of reference TrainArgs)."""

    encoder: EncoderConfig
    dataset_type: str = "regression"  # regression|classification|multiclass|spectra
    num_tasks: int = 1
    multiclass_num_classes: int = 3
    number_of_molecules: int = 1
    mpn_shared: bool = False
    ffn_num_layers: int = 2
    ffn_hidden_size: int = 300
    features_size: int = 0        # molecule-level extra features dim
    features_only: bool = False
    use_input_features: bool = False
    spectra_activation: str = "exp"
    atom_descriptors: Optional[str] = None
    atom_descriptors_size: int = 0

    @property
    def output_size(self) -> int:
        n = self.num_tasks
        if self.dataset_type == "multiclass":
            n *= self.multiclass_num_classes
        return n

    @property
    def first_linear_dim(self) -> int:
        """FFN input width (reference model.py:66-74)."""
        if self.features_only:
            return self.features_size
        dim = self.encoder.hidden_size * self.number_of_molecules
        if self.use_input_features:
            dim += self.features_size
        if self.atom_descriptors == "descriptor":
            dim += self.atom_descriptors_size
        return dim


def init_model(key: jax.Array, cfg: ModelConfig) -> Dict:
    """Initialize all parameters (Xavier-normal weights, zero biases —
    reference nn_utils.py:102-112 applied model-wide by model.py:39)."""
    k_enc, k_ffn = jax.random.split(key)
    params: Dict = {}
    if not cfg.features_only:
        enc_keys = jax.random.split(k_enc, cfg.number_of_molecules)
        if cfg.mpn_shared:
            shared = init_encoder(enc_keys[0], cfg.encoder)
            params["encoders"] = [shared] * cfg.number_of_molecules
        else:
            params["encoders"] = [init_encoder(k, cfg.encoder) for k in enc_keys]

    # FFN stack (reference model.py:79-100)
    dims: List[Tuple[int, int]] = []
    if cfg.ffn_num_layers == 1:
        dims.append((cfg.first_linear_dim, cfg.output_size))
    else:
        dims.append((cfg.first_linear_dim, cfg.ffn_hidden_size))
        for _ in range(cfg.ffn_num_layers - 2):
            dims.append((cfg.ffn_hidden_size, cfg.ffn_hidden_size))
        dims.append((cfg.ffn_hidden_size, cfg.output_size))
    ffn_keys = jax.random.split(k_ffn, len(dims))
    params["ffn"] = [init_linear(k, i, o, bias=True)
                     for k, (i, o) in zip(ffn_keys, dims)]
    return params


def encode(params: Dict, batches: Sequence[Dict[str, jnp.ndarray]],
           cfg: ModelConfig,
           features: Optional[jnp.ndarray] = None,
           atom_descriptors: Optional[jnp.ndarray] = None,
           dropout_key: Optional[jax.Array] = None,
           deterministic: bool = True) -> jnp.ndarray:
    """MPN forward: concat per-position encodings + input features
    (reference mpn.py:210-289)."""
    if cfg.features_only:
        return features
    keys = jax.random.split(dropout_key, len(batches)) \
        if dropout_key is not None else [None] * len(batches)
    encodings = [
        apply_encoder(p, b, cfg.encoder, dropout_key=k,
                      deterministic=deterministic,
                      atom_descriptors=atom_descriptors)
        for p, b, k in zip(params["encoders"], batches, keys)
    ]
    out = jnp.concatenate(encodings, axis=1) if len(encodings) > 1 else encodings[0]
    if cfg.use_input_features and features is not None:
        out = jnp.concatenate([out, features], axis=1)
    return out


def apply_ffn(params: Dict, x: jnp.ndarray, cfg: ModelConfig,
              dropout_key: Optional[jax.Array] = None,
              deterministic: bool = True,
              truncate_last: bool = False) -> jnp.ndarray:
    """FFN head: dropout -> linear [-> act -> dropout -> linear]*
    (reference model.py:79-100). ``truncate_last`` stops before the final
    linear layer (last_FFN fingerprints, reference model.py:146-148)."""
    act = get_activation(cfg.encoder.activation)
    import jax.numpy as jnp
    cdt = jnp.bfloat16 if cfg.encoder.compute_dtype == "bfloat16" else None
    layers = params["ffn"]
    n = len(layers)
    keys = jax.random.split(dropout_key, n) if dropout_key is not None \
        else [None] * n
    h = x
    for i, lp in enumerate(layers):
        if i > 0:
            h = act(h)
        h = dropout(h, cfg.encoder.dropout, keys[i], deterministic)
        if truncate_last and i == n - 1:
            return h
        h = linear(lp, h, cdt)
    return h


def apply_model(params: Dict, batches: Sequence[Dict[str, jnp.ndarray]],
                cfg: ModelConfig,
                features: Optional[jnp.ndarray] = None,
                atom_descriptors: Optional[jnp.ndarray] = None,
                dropout_key: Optional[jax.Array] = None,
                deterministic: bool = True,
                return_embeddings: bool = False):
    """Full forward pass -> raw predictions (training) with eval-time
    post-processing applied by the caller via :func:`postprocess_preds`
    (reference model.py:152-194 applies sigmoid/softmax only at eval)."""
    k_enc = k_ffn = None
    if dropout_key is not None:
        k_enc, k_ffn = jax.random.split(dropout_key)
    emb = encode(params, batches, cfg, features=features,
                 atom_descriptors=atom_descriptors,
                 dropout_key=k_enc, deterministic=deterministic)
    out = apply_ffn(params, emb, cfg, dropout_key=k_ffn,
                    deterministic=deterministic)
    if cfg.dataset_type == "spectra":
        if cfg.spectra_activation == "softplus":
            out = jax.nn.softplus(out)
        else:
            out = jnp.exp(out)
    if return_embeddings:
        return out, emb
    return out


def postprocess_preds(preds: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Eval-time post-processing (reference model.py:181-188)."""
    if cfg.dataset_type == "classification":
        return jax.nn.sigmoid(preds)
    if cfg.dataset_type == "multiclass":
        preds = preds.reshape(preds.shape[0], -1, cfg.multiclass_num_classes)
        return jax.nn.softmax(preds, axis=2)
    return preds


def fingerprint(params: Dict, batches, cfg: ModelConfig,
                features=None, fingerprint_type: str = "MPN") -> jnp.ndarray:
    """Latent representations (reference model.py:123-150)."""
    emb = encode(params, batches, cfg, features=features, deterministic=True)
    if fingerprint_type == "MPN":
        return emb
    if fingerprint_type == "last_FFN":
        return apply_ffn(params, emb, cfg, deterministic=True,
                         truncate_last=True)
    raise ValueError(f"Unsupported fingerprint type {fingerprint_type}.")
