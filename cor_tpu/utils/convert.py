"""Checkpoint dialect converters: torch state_dicts -> cor_tpu pytrees.

Three external dialects (reference: SURVEY.md §7.3):
1. Stock SAM ``.pth`` (facebookresearch/segment-anything key naming) — only
   ``image_encoder.*`` and ``mask_decoder.*`` are loaded; prompt-encoder keys
   are filtered so ``no_mask_embed`` trains from scratch, exactly matching the
   reference's checkpoint surgery (reference: lib/build_model.py:96-109).
2. open_clip SigLIP ``.bin`` (timm vision trunk + open_clip text tower).
3. A trained CORE checkpoint (the full composite state dict, optionally with
   DDP ``module.`` prefixes — reference: my_test.py:126-135).

Layout translations (torch -> cor_tpu NHWC/HWIO):
- Linear weight [out, in]            -> [in, out]
- Conv2d weight [O, I, kh, kw]       -> [kh, kw, I, O]
- ConvTranspose2d weight [I,O,kh,kw] -> [I, kh, kw, O] (einsum kernel)
- patchify conv [D, C, p, p]         -> [(p*p*C), D] unfold-GEMM kernel with
  feature order (row, col, channel)

torch is used only to deserialize (torch.load, CPU).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Params = Dict[str, Any]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]  # trainer_v3_g.py:137 checkpoint format
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.float().numpy() for k, v in obj.items()}


def audit_params(expected: Params, loaded: Params) -> Dict[str, list]:
    """Missing / unexpected / shape-changed parameter audit
    (reference: my_test.py:126-170 logs the same three classes on load)."""

    import jax

    def flat(tree):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            out[jax.tree_util.keystr(path)] = np.shape(leaf)
        return out

    e, l = flat(expected), flat(loaded)
    return {
        "missing": sorted(set(e) - set(l)),
        "unexpected": sorted(set(l) - set(e)),
        "mismatched": sorted(k for k in set(e) & set(l) if e[k] != l[k]),
    }


def strip_ddp_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove DDP 'module.' prefixes (reference: my_test.py:126-135)."""
    return {
        (k[len("module.") :] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------


def _lin(sd, prefix) -> Params:
    p = {"w": sd[f"{prefix}.weight"].T.copy()}
    if f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"].copy()
    return p


def _conv(sd, prefix, bias=True) -> Params:
    p = {"w": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0).copy()}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"].copy()
    return p


def _convT(sd, prefix) -> Params:
    return {
        "w": sd[f"{prefix}.weight"].transpose(0, 2, 3, 1).copy(),
        "b": sd[f"{prefix}.bias"].copy(),
    }


def _ln(sd, prefix) -> Params:
    return {"scale": sd[f"{prefix}.weight"].copy(), "bias": sd[f"{prefix}.bias"].copy()}


def _patchify(sd, prefix) -> Params:
    w = sd[f"{prefix}.weight"]  # [D, C, p, p]
    d = w.shape[0]
    return {
        # unfold order is (row, col, channel) -> transpose to [p, p, C, D]
        "w": w.transpose(2, 3, 1, 0).reshape(-1, d).copy(),
        "b": sd[f"{prefix}.bias"].copy(),
    }


def _mlp(sd, prefix, names=("lin1", "lin2")) -> Params:
    return {"lin1": _lin(sd, f"{prefix}.{names[0]}"), "lin2": _lin(sd, f"{prefix}.{names[1]}")}


def _attn_qkv(sd, prefix) -> Params:
    """SAM two-way attention: separate q/k/v/out projections."""
    return {
        "q_proj": _lin(sd, f"{prefix}.q_proj"),
        "k_proj": _lin(sd, f"{prefix}.k_proj"),
        "v_proj": _lin(sd, f"{prefix}.v_proj"),
        "out_proj": _lin(sd, f"{prefix}.out_proj"),
    }


def _mlp_stack(sd, prefix, num_layers) -> Params:
    return {"layers": [_lin(sd, f"{prefix}.layers.{j}") for j in range(num_layers)]}


# ---------------------------------------------------------------------------
# SAM encoder + decoder (stock SAM .pth)
# ---------------------------------------------------------------------------


def convert_sam_encoder(sd: Mapping[str, np.ndarray], depth: int, prefix="image_encoder") -> Params:
    p: Params = {"patch_embed": _patchify(sd, f"{prefix}.patch_embed.proj")}
    if f"{prefix}.pos_embed" in sd:
        p["pos_embed"] = sd[f"{prefix}.pos_embed"].copy()  # already [1, g, g, D]
    blocks = []
    for i in range(depth):
        b = f"{prefix}.blocks.{i}"
        attn = {
            "qkv": _lin(sd, f"{b}.attn.qkv"),
            "proj": _lin(sd, f"{b}.attn.proj"),
        }
        if f"{b}.attn.rel_pos_h" in sd:
            attn["rel_pos_h"] = sd[f"{b}.attn.rel_pos_h"].copy()
            attn["rel_pos_w"] = sd[f"{b}.attn.rel_pos_w"].copy()
        blocks.append(
            {
                "norm1": _ln(sd, f"{b}.norm1"),
                "attn": attn,
                "norm2": _ln(sd, f"{b}.norm2"),
                "mlp": _mlp(sd, f"{b}.mlp"),
            }
        )
    p["blocks"] = blocks
    p["neck"] = {
        "conv1": _conv(sd, f"{prefix}.neck.0", bias=False),
        "ln1": _ln(sd, f"{prefix}.neck.1"),
        "conv2": _conv(sd, f"{prefix}.neck.2", bias=False),
        "ln2": _ln(sd, f"{prefix}.neck.3"),
    }
    return p


def convert_sam_decoder(
    sd: Mapping[str, np.ndarray], depth: int = 2, num_mask_tokens: int = 4, prefix="mask_decoder"
) -> Params:
    t = f"{prefix}.transformer"
    layers = []
    for i in range(depth):
        l = f"{t}.layers.{i}"
        layers.append(
            {
                "self_attn": _attn_qkv(sd, f"{l}.self_attn"),
                "norm1": _ln(sd, f"{l}.norm1"),
                "cross_attn_t2i": _attn_qkv(sd, f"{l}.cross_attn_token_to_image"),
                "norm2": _ln(sd, f"{l}.norm2"),
                "mlp": _mlp(sd, f"{l}.mlp"),
                "norm3": _ln(sd, f"{l}.norm3"),
                "norm4": _ln(sd, f"{l}.norm4"),
                "cross_attn_i2t": _attn_qkv(sd, f"{l}.cross_attn_image_to_token"),
            }
        )
    return {
        "iou_token": sd[f"{prefix}.iou_token.weight"].copy(),
        "mask_tokens": sd[f"{prefix}.mask_tokens.weight"].copy(),
        "transformer": {
            "layers": layers,
            "final_attn_t2i": _attn_qkv(sd, f"{t}.final_attn_token_to_image"),
            "norm_final": _ln(sd, f"{t}.norm_final_attn"),
        },
        "output_upscaling": {
            "convt1": _convT(sd, f"{prefix}.output_upscaling.0"),
            "ln": _ln(sd, f"{prefix}.output_upscaling.1"),
            "convt2": _convT(sd, f"{prefix}.output_upscaling.3"),
        },
        "output_hypernetworks_mlps": [
            _mlp_stack(sd, f"{prefix}.output_hypernetworks_mlps.{i}", 3)
            for i in range(num_mask_tokens)
        ],
        "iou_prediction_head": _mlp_stack(sd, f"{prefix}.iou_prediction_head", 3),
    }


def load_sam_weights(params: Params, sam_ckpt_path: str, depth: int) -> Params:
    """Checkpoint surgery with reference semantics (build_model.py:96-109):
    load image_encoder.* and mask_decoder.* only; the prompt encoder keeps its
    random no_mask_embed."""
    sd = strip_ddp_prefix(load_torch_state_dict(sam_ckpt_path))
    out = dict(params)
    out["image_encoder"] = convert_sam_encoder(sd, depth)
    out["mask_decoder"] = convert_sam_decoder(sd)
    return out


# ---------------------------------------------------------------------------
# SigLIP (open_clip .bin)
# ---------------------------------------------------------------------------


def convert_siglip_vision(sd: Mapping[str, np.ndarray], depth: int, prefix="visual.trunk") -> Params:
    p: Params = {
        "patch_embed": _patchify(sd, f"{prefix}.patch_embed.proj"),
        "pos_embed": sd[f"{prefix}.pos_embed"].copy(),
        "norm": _ln(sd, f"{prefix}.norm"),
        "blocks": [],
    }
    for i in range(depth):
        b = f"{prefix}.blocks.{i}"
        p["blocks"].append(
            {
                "norm1": _ln(sd, f"{b}.norm1"),
                "attn": {"qkv": _lin(sd, f"{b}.attn.qkv"), "proj": _lin(sd, f"{b}.attn.proj")},
                "norm2": _ln(sd, f"{b}.norm2"),
                "mlp": _mlp(sd, f"{b}.mlp", names=("fc1", "fc2")),
            }
        )
    ap = f"{prefix}.attn_pool"
    p["attn_pool"] = {
        "latent": sd[f"{ap}.latent"].copy(),
        "q": _lin(sd, f"{ap}.q"),
        "kv": _lin(sd, f"{ap}.kv"),
        "proj": _lin(sd, f"{ap}.proj"),
        "norm": _ln(sd, f"{ap}.norm"),
        "mlp": _mlp(sd, f"{ap}.mlp", names=("fc1", "fc2")),
    }
    return p


def convert_siglip_text(sd: Mapping[str, np.ndarray], depth: int, prefix="text") -> Params:
    p: Params = {
        "token_embedding": sd[f"{prefix}.token_embedding.weight"].copy(),
        "positional_embedding": sd[f"{prefix}.positional_embedding"].copy(),
        "ln_final": _ln(sd, f"{prefix}.ln_final"),
        "text_projection": _lin(sd, f"{prefix}.text_projection"),
        "blocks": [],
    }
    for i in range(depth):
        b = f"{prefix}.transformer.resblocks.{i}"
        p["blocks"].append(
            {
                "norm1": _ln(sd, f"{b}.ln_1"),
                "attn": {
                    "qkv": {
                        "w": sd[f"{b}.attn.in_proj_weight"].T.copy(),
                        "b": sd[f"{b}.attn.in_proj_bias"].copy(),
                    },
                    "proj": _lin(sd, f"{b}.attn.out_proj"),
                },
                "norm2": _ln(sd, f"{b}.ln_2"),
                "mlp": _mlp(sd, f"{b}.mlp", names=("c_fc", "c_proj")),
            }
        )
    return p


def load_siglip_weights(params: Params, siglip_ckpt_path: str, vision_depth: int, text_depth: int) -> Params:
    sd = strip_ddp_prefix(load_torch_state_dict(siglip_ckpt_path))
    out = dict(params)
    sb = dict(out["support_branch"])
    sb["siglip"] = {
        "visual": convert_siglip_vision(sd, vision_depth),
        "text": convert_siglip_text(sd, text_depth),
    }
    out["support_branch"] = sb
    return out


def convert_siglip_hf(sd: Mapping[str, np.ndarray], vision_depth: int, text_depth: int) -> Params:
    """HF-transformers SiglipModel dialect (the reference ships an unused HF
    wrapper alternative — lib/support_model/siglip_hugginface.py).

    HF naming: vision_model.embeddings.{patch_embedding,position_embedding},
    vision_model.encoder.layers.{i}.{layer_norm1,self_attn.{q,k,v,out}_proj,
    layer_norm2,mlp.{fc1,fc2}}, vision_model.post_layernorm, vision_model.head
    (MAP pool: probe/attention/layernorm/mlp); text_model.* analogous with
    final_layer_norm + head (projection).
    """

    def block(prefix):
        # HF keeps q/k/v separate; fuse into our qkv layout
        qw = sd[f"{prefix}.self_attn.q_proj.weight"]
        kw = sd[f"{prefix}.self_attn.k_proj.weight"]
        vw = sd[f"{prefix}.self_attn.v_proj.weight"]
        qb = sd[f"{prefix}.self_attn.q_proj.bias"]
        kb = sd[f"{prefix}.self_attn.k_proj.bias"]
        vb = sd[f"{prefix}.self_attn.v_proj.bias"]
        return {
            "norm1": _ln(sd, f"{prefix}.layer_norm1"),
            "attn": {
                "qkv": {
                    "w": np.concatenate([qw, kw, vw], axis=0).T.copy(),
                    "b": np.concatenate([qb, kb, vb]).copy(),
                },
                "proj": _lin(sd, f"{prefix}.self_attn.out_proj"),
            },
            "norm2": _ln(sd, f"{prefix}.layer_norm2"),
            "mlp": _mlp(sd, f"{prefix}.mlp", names=("fc1", "fc2")),
        }

    v = "vision_model"
    visual: Params = {
        "patch_embed": _patchify(sd, f"{v}.embeddings.patch_embedding"),
        "pos_embed": sd[f"{v}.embeddings.position_embedding.weight"][None].copy(),
        "blocks": [block(f"{v}.encoder.layers.{i}") for i in range(vision_depth)],
        "norm": _ln(sd, f"{v}.post_layernorm"),
        "attn_pool": {
            "latent": sd[f"{v}.head.probe"].copy(),
            # HF MAP head uses a fused in-proj MultiheadAttention
            "q": {
                "w": sd[f"{v}.head.attention.in_proj_weight"][: sd[f"{v}.head.probe"].shape[-1]].T.copy(),
                "b": sd[f"{v}.head.attention.in_proj_bias"][: sd[f"{v}.head.probe"].shape[-1]].copy(),
            },
            "kv": {
                "w": sd[f"{v}.head.attention.in_proj_weight"][sd[f"{v}.head.probe"].shape[-1] :].T.copy(),
                "b": sd[f"{v}.head.attention.in_proj_bias"][sd[f"{v}.head.probe"].shape[-1] :].copy(),
            },
            "proj": _lin(sd, f"{v}.head.attention.out_proj"),
            "norm": _ln(sd, f"{v}.head.layernorm"),
            "mlp": _mlp(sd, f"{v}.head.mlp", names=("fc1", "fc2")),
        },
    }
    t = "text_model"
    text: Params = {
        "token_embedding": sd[f"{t}.embeddings.token_embedding.weight"].copy(),
        "positional_embedding": sd[f"{t}.embeddings.position_embedding.weight"].copy(),
        "blocks": [block(f"{t}.encoder.layers.{i}") for i in range(text_depth)],
        "ln_final": _ln(sd, f"{t}.final_layer_norm"),
        "text_projection": _lin(sd, f"{t}.head"),
    }
    return {"visual": visual, "text": text}


# ---------------------------------------------------------------------------
# trained CORE checkpoint (full composite, reference naming)
# ---------------------------------------------------------------------------


def convert_mask_adapter(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    def cnext(b):
        p = {
            "dwconv": _conv(sd, f"{b}.dwconv"),
            "norm": _ln(sd, f"{b}.norm"),
            "pwconv1": _lin(sd, f"{b}.pwconv1"),
            "pwconv2": _lin(sd, f"{b}.pwconv2"),
        }
        if f"{b}.gamma" in sd:
            p["gamma"] = sd[f"{b}.gamma"].copy()
        return p

    g = f"{prefix}.get_mask_map"
    return {
        "channel_reduction": {
            "conv": _conv(sd, f"{prefix}.channel_clip_to_maskadapter.conv"),
            "norm": _ln(sd, f"{prefix}.channel_clip_to_maskadapter.norm"),
        },
        "mask_downscaling": {
            "conv1": _conv(sd, f"{g}.mask_downscaling.0"),
            "ln1": _ln(sd, f"{g}.mask_downscaling.1"),
            "conv2": _conv(sd, f"{g}.mask_downscaling.3"),
            "ln2": _ln(sd, f"{g}.mask_downscaling.4"),
            "conv3": _conv(sd, f"{g}.mask_downscaling.6"),
        },
        "fuse": _conv(sd, f"{g}.fuse"),
        "cnext1": cnext(f"{g}.cnext1"),
        "cnext2": cnext(f"{g}.cnext2"),
        "cnext3": cnext(f"{g}.cnext3"),
        "norm": _ln(sd, f"{g}.norm"),
        "final": _conv(sd, f"{g}.final"),
    }


def convert_cir_fuse(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    def gate(name):
        return {
            "lin1": _lin(sd, f"{prefix}.{name}.0"),
            "lin2": _lin(sd, f"{prefix}.{name}.3"),
        }

    return {
        "atten_image": gate("atten_Image"),
        "atten_text": gate("atten_Text"),
        "dynamic_scalar": gate("dynamic_scalar"),
    }


def convert_core_checkpoint(
    sd: Mapping[str, np.ndarray],
    encoder_depth: int,
    siglip_vision_depth: int,
    siglip_text_depth: int,
    mask_pooling: str = "MaskAdapterPooling",
) -> Params:
    """Full trained-CORE state dict -> cor_tpu param tree."""
    sd = strip_ddp_prefix(sd)
    sb_prefix = "support_branch"
    support: Params = {
        "siglip": {
            "visual": convert_siglip_vision(
                sd, siglip_vision_depth, prefix=f"{sb_prefix}.siglip.model.visual.trunk"
            ),
            "text": convert_siglip_text(
                sd, siglip_text_depth, prefix=f"{sb_prefix}.siglip.model.text"
            ),
        },
        "cir_fuse": convert_cir_fuse(sd, f"{sb_prefix}.cir_fuse"),
        "ln_channel_first": _ln(sd, f"{sb_prefix}.ln_channel_first"),
        "ln_channel_last": _ln(sd, f"{sb_prefix}.ln_channel_last"),
        "dim_proj": {
            "lin1": _lin(sd, f"{sb_prefix}.dim_proj.0"),
            "lin2": _lin(sd, f"{sb_prefix}.dim_proj.3"),
        },
    }
    if mask_pooling == "MaskAdapterPooling":
        support["mask_pooling"] = convert_mask_adapter(sd, f"{sb_prefix}.mask_pooling")
    return {
        "image_encoder": convert_sam_encoder(sd, encoder_depth),
        "support_branch": support,
        "prompt_encoder": {
            "pe_layer": {
                "gaussian_matrix": sd[
                    "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"
                ].copy()
            },
            "no_mask_embed": sd["prompt_encoder.no_mask_embed.weight"].copy(),
        },
        "mask_decoder": convert_sam_decoder(sd),
    }


def load_trained_params(
    load_checkpoint_path,
    core_cfg,
    params: Params,
    logger,
    mask_pooling: str = "MaskAdapterPooling",
) -> Params:
    """Restore trained CORE weights over ``params`` — the ONE loading path
    shared by every inference-side CLI (eval / retrieve / index / serve), so
    a trained checkpoint is never silently ignored.

    Two dialects:
    - torch ``.pth/.pt/.bin``: the reference's trained CORE checkpoint,
      incl. DDP 'module.' prefixes + missing/unexpected/mismatch audit
      (reference: my_test.py:117-185)
    - anything else: an Orbax training checkpoint directory — params-only
      (best_model) or a FULL training state (checkpoint_epoch_N /
      best_model_full / interrupted_*); restored raw (no template) and the
      'params' subtree taken, so every trainer-written layout loads
    """
    from pathlib import Path

    ckpt = Path(str(load_checkpoint_path))
    if ckpt.suffix in (".pth", ".pt", ".bin"):
        sd = load_torch_state_dict(str(ckpt))
        sig = core_cfg.support.siglip
        loaded = convert_core_checkpoint(
            sd,
            encoder_depth=core_cfg.encoder.depth,
            siglip_vision_depth=sig.vision.depth,
            siglip_text_depth=sig.text.depth,
            mask_pooling=mask_pooling,
        )
        audit = audit_params(params, loaded)
        for kind, keys in audit.items():
            if keys:
                logger.info(f"[ckpt audit] {kind} ({len(keys)}): {keys[:10]}")
        logger.info(f"Loaded torch CORE checkpoint: {ckpt}")
        return loaded
    from cor_tpu.train.checkpoint import restore_checkpoint

    restored = restore_checkpoint(ckpt.parent, ckpt.name)
    if isinstance(restored, dict) and "params" in restored:
        restored = restored["params"]
    logger.info(f"Loaded Orbax checkpoint: {ckpt}")
    return restored
