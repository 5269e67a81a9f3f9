"""Export path: cor_tpu param trees -> reference torch CORE checkpoints.

Three layers of proof:
1. Pure round-trip: ``convert_core_checkpoint(export_core_state_dict(p)) == p``
   bitwise on a full tiny composite tree (every inverse layout transform).
2. Reference-side naming + layout: the exported state_dict STRICT-loads into
   the actual reference torch modules (lib/sam_model/*, lib/support_model/*)
   and the loaded reference encoder/decoder reproduce cor_tpu's forward —
   i.e. the export is consumable by the reference exactly as a checkpoint
   trained there would be (reference: my_test.py:117-185).
3. Disk format: ``save_core_checkpoint`` writes the reference trainer's
   checkpoint dict (utils/trainer_v3_g.py:133-142) and the existing import
   path (load_torch_state_dict + convert_core_checkpoint) reads it back.
"""

import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from lib.sam_model.image_encoder import ImageEncoderViT  # noqa: E402
from lib.sam_model.mask_decoder import MaskDecoder as RefMaskDecoder  # noqa: E402
from lib.sam_model.transformer import TwoWayTransformer as RefTwoWayTransformer  # noqa: E402
from lib.support_model.cir_feature_fuse import CirFuseModule  # noqa: E402
from lib.support_model.mask_adapter import MaskAdapterPooling as RefMaskAdapterPooling  # noqa: E402

from cor_tpu.models.core_model import init_core_model
from cor_tpu.models.sam_decoder import mask_decoder
from cor_tpu.models.sam_encoder import SamEncoderConfig, sam_encoder
from cor_tpu.utils.convert import convert_core_checkpoint, load_torch_state_dict
from cor_tpu.utils.export import (
    export_core_state_dict,
    export_mask_adapter,
    export_cir_fuse,
    export_sam_decoder,
    export_sam_encoder,
    save_core_checkpoint,
)
from tests.helpers import tiny_core_config


def _strip(sd, prefix):
    pl = len(prefix) + 1
    return {k[pl:]: torch.from_numpy(v) for k, v in sd.items() if k.startswith(prefix + ".")}


def _tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"tree structures differ:\n{ta}\nvs\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x, np.float32), np.asarray(y, np.float32))


def test_export_convert_roundtrip_bitwise():
    cfg = tiny_core_config()
    params = init_core_model(jax.random.PRNGKey(3), cfg)
    sd = export_core_state_dict(params)
    back = convert_core_checkpoint(
        sd,
        encoder_depth=cfg.encoder.depth,
        siglip_vision_depth=cfg.support.siglip.vision.depth,
        siglip_text_depth=cfg.support.siglip.text.depth,
    )
    _tree_equal(params, back)


def test_exported_encoder_strict_loads_and_matches_forward():
    """Exported SAM-encoder keys strict-load into the reference
    ImageEncoderViT and the loaded torch module reproduces cor_tpu's
    forward — layout inverses proven behaviorally, not just by shape."""
    enc_cfg = SamEncoderConfig(
        img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        out_chans=16, window_size=2, global_attn_indexes=(1,),
    )
    params = init_core_model(jax.random.PRNGKey(5), tiny_core_config())["image_encoder"]
    sd = export_sam_encoder(params)

    ref = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        out_chans=16, use_rel_pos=True, window_size=2, global_attn_indexes=(1,),
    ).eval()
    missing, unexpected = ref.load_state_dict(_strip(sd, "image_encoder"), strict=True)
    assert not missing and not unexpected

    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(sam_encoder(params, jnp.asarray(x), enc_cfg))  # NHWC
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_exported_decoder_strict_loads_and_matches_forward():
    cfg = tiny_core_config()
    full = init_core_model(jax.random.PRNGKey(6), cfg)
    params = full["mask_decoder"]
    sd = export_sam_decoder(params)

    ref = RefMaskDecoder(
        transformer_dim=16,
        transformer=RefTwoWayTransformer(depth=2, embedding_dim=16, num_heads=2, mlp_dim=32),
        num_multimask_outputs=3,
        iou_head_depth=3,
        iou_head_hidden_dim=16,
    ).eval()
    missing, unexpected = ref.load_state_dict(_strip(sd, "mask_decoder"), strict=True)
    assert not missing and not unexpected

    # the reference decoder hardcodes the 64x64 SAM grid (mask_decoder.py:132)
    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 64, 64, 16)).astype(np.float32)
    pe = rng.standard_normal((1, 64, 64, 16)).astype(np.float32)
    sparse = rng.standard_normal((2, 1, 16)).astype(np.float32)
    dense = rng.standard_normal((2, 64, 64, 16)).astype(np.float32)
    ours_masks, ours_iou, _ = mask_decoder(
        params, jnp.asarray(img), jnp.asarray(pe), jnp.asarray(sparse),
        jnp.asarray(dense), cfg.decoder, multimask_output=False,
    )
    with torch.no_grad():
        # the reference decoder returns (masks, iou_pred, src) — mask_decoder.py:105
        theirs_masks, theirs_iou, _src = ref(
            image_embeddings=torch.from_numpy(img.transpose(0, 3, 1, 2)),
            image_pe=torch.from_numpy(pe.transpose(0, 3, 1, 2)),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense.transpose(0, 3, 1, 2)),
            multimask_output=False,
        )
    np.testing.assert_allclose(np.asarray(ours_masks), theirs_masks.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_iou), theirs_iou.numpy(), atol=1e-4)


def test_exported_support_branch_modules_strict_load():
    """Mask adapter + fusion gate exports strict-load into the actual
    reference modules (naming incl. the capitalized atten_Image/atten_Text
    Sequential indices and get_mask_map tree)."""
    cfg = tiny_core_config()
    sb = init_core_model(jax.random.PRNGKey(7), cfg)["support_branch"]

    adapter_sd = export_mask_adapter(sb["mask_pooling"], "mp")
    ref_adapter = RefMaskAdapterPooling(
        x_in_channel=32, mask_adatpet_network_in_channel=16,
        mask_downscaling_mid_channel=8, mask_adatpet_network_mid_channel=16,
        num_output_maps=4,
    )
    missing, unexpected = ref_adapter.load_state_dict(_strip(adapter_sd, "mp"), strict=True)
    assert not missing and not unexpected

    fuse_sd = export_cir_fuse(sb["cir_fuse"], "cf")
    ref_fuse = CirFuseModule(image_embed_dim=32, text_embed_dim=32)
    missing, unexpected = ref_fuse.load_state_dict(_strip(fuse_sd, "cf"), strict=True)
    assert not missing and not unexpected


def test_export_cli_orbax_to_torch_roundtrip(tmp_path):
    """cor_tpu.cli.export: an Orbax checkpoint (as the trainer writes them)
    exports to the reference .pth format without needing a config, and the
    import path reads the result back bitwise."""
    from cor_tpu.cli.export import main as export_main
    from cor_tpu.train.checkpoint import save_checkpoint

    cfg = tiny_core_config()
    params = init_core_model(jax.random.PRNGKey(9), cfg)
    save_checkpoint(
        tmp_path, "checkpoint_epoch_2",
        {"params": params, "epoch": np.int32(2), "loss": np.float32(0.5)},
    )

    out = tmp_path / "exported.pth"
    export_main(["--checkpoint", str(tmp_path / "checkpoint_epoch_2"), "--out", str(out)])

    raw = torch.load(str(out), map_location="cpu", weights_only=True)
    assert raw["epoch"] == 2 and abs(raw["loss"] - 0.5) < 1e-6
    back = convert_core_checkpoint(
        load_torch_state_dict(str(out)),
        encoder_depth=cfg.encoder.depth,
        siglip_vision_depth=cfg.support.siglip.vision.depth,
        siglip_text_depth=cfg.support.siglip.text.depth,
    )
    _tree_equal(params, back)


def test_save_core_checkpoint_reference_dict_format(tmp_path):
    cfg = tiny_core_config()
    params = init_core_model(jax.random.PRNGKey(8), cfg)
    path = str(tmp_path / "checkpoint_epoch_3.pth")
    save_core_checkpoint(path, params, epoch=3, loss=0.125)

    raw = torch.load(path, map_location="cpu", weights_only=True)
    assert set(raw) == {"epoch", "model_state_dict", "optimizer_state_dict", "loss"}
    assert raw["epoch"] == 3 and raw["loss"] == 0.125

    back = convert_core_checkpoint(
        load_torch_state_dict(path),
        encoder_depth=cfg.encoder.depth,
        siglip_vision_depth=cfg.support.siglip.vision.depth,
        siglip_text_depth=cfg.support.siglip.text.depth,
    )
    _tree_equal(params, back)
