"""Gated cross-modal fusion ("Combiner").

Parity with the reference's CirFuseModule — historically named
`cir_multi_modal_feature_fuse` (reference: lib/support_model/cir_feature_fuse.py:10-64;
SURVEY.md §0.1 confirms the two are the same module):

    atten_I, atten_T = sigmoid(MLP([img ; txt]))        (modality gates)
    gated_img, gated_txt = atten_I * img, atten_T * txt
    dynamic = sigmoid(MLP([gated_img ; gated_txt]))     (scalar in [0, 1])
    repres = normalize(dynamic * gated_img + (1 - dynamic) * gated_txt)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from cor_tpu.ops.common import (
    Params,
    dense,
    dropout,
    init_dense,
    l2_normalize,
)


def init_cir_fuse(key: jax.Array, image_dim: int, text_dim: int) -> Params:
    keys = jax.random.split(key, 6)
    cat = image_dim + text_dim
    return {
        "atten_image": {
            "lin1": init_dense(keys[0], cat, image_dim),
            "lin2": init_dense(keys[1], image_dim, image_dim),
        },
        "atten_text": {
            "lin1": init_dense(keys[2], cat, text_dim),
            "lin2": init_dense(keys[3], text_dim, text_dim),
        },
        "dynamic_scalar": {
            "lin1": init_dense(keys[4], cat, image_dim),
            "lin2": init_dense(keys[5], image_dim, 1),
        },
    }


def _gate(p: Params, x: jax.Array, key: Optional[jax.Array], train: bool) -> jax.Array:
    """Linear -> ReLU -> Dropout(0.5) -> Linear -> Sigmoid."""
    h = jax.nn.relu(dense(p["lin1"], x))
    h = dropout(h, 0.5, key, train)
    return jax.nn.sigmoid(dense(p["lin2"], h).astype(jnp.float32)).astype(x.dtype)


def cir_fuse_compose(
    p: Params,
    image_features: jax.Array,  # [N, D]
    text_features: jax.Array,  # [N, D]
    key: Optional[jax.Array] = None,
    train: bool = False,
) -> Dict[str, jax.Array]:
    if key is not None:
        k1, k2, k3 = jax.random.split(key, 3)
    else:
        k1 = k2 = k3 = None
    raw = jnp.concatenate([image_features, text_features], axis=-1)
    atten_i = _gate(p["atten_image"], raw, k1, train)
    atten_t = _gate(p["atten_text"], raw, k2, train)
    gated_img = atten_i * image_features
    gated_txt = atten_t * text_features
    new = jnp.concatenate([gated_img, gated_txt], axis=-1)
    dynamic = _gate(p["dynamic_scalar"], new, k3, train)  # [N, 1]
    combined = dynamic * gated_img + (1.0 - dynamic) * gated_txt
    return {
        "repres": l2_normalize(combined),
        "fuseimg": gated_img,
        "fusetxt": gated_txt,
        "dynamic_scalar": dynamic,
    }
