"""Attention primitives: window partitioning, decomposed relative-position
bias, and multi-head attention for the SAM-style ViT.

Behavioral parity targets (reference: lib/sam_model/image_encoder.py):
- window_partition/unpartition (:244-290) — pad to a window multiple, tile.
- get_rel_pos (:293-323) — per-axis relative-position table lookup with
  linear interpolation when the stored table length mismatches.
- add_decomposed_rel_pos (:326-362) — MViTv2 decomposed bias
  attn += einsum(q, Rh) + einsum(q, Rw).

TPU-first design notes: tensors stay NHWC; all matmuls accumulate in fp32 on
the MXU; the decomposed bias is added on 5-D views so XLA fuses the two
broadcast adds into the attention logits without materializing extra copies.
A Pallas flash-window-attention kernel (cor_tpu.ops.pallas.window_attn) can
replace `attention_2d` for the hot path; this module is the reference-XLA
implementation and the numerics oracle for that kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cor_tpu.ops.common import Params, dense, init_dense


# ---------------------------------------------------------------------------
# window partitioning
# ---------------------------------------------------------------------------


def window_partition(x: jax.Array, window: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """[B, H, W, C] -> [B*nW, window, window, C] with zero padding."""
    B, H, W, C = x.shape
    pad_h = (window - H % window) % window
    pad_w = (window - W % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return x, (Hp, Wp)


def window_unpartition(
    windows: jax.Array, window: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jax.Array:
    """Inverse of window_partition; crops the padding."""
    Hp, Wp = pad_hw
    H, W = hw
    C = windows.shape[-1]
    B = windows.shape[0] // ((Hp // window) * (Wp // window))
    x = windows.reshape(B, Hp // window, Wp // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    if Hp > H or Wp > W:
        x = x[:, :H, :W, :]
    return x


# ---------------------------------------------------------------------------
# decomposed relative position bias
# ---------------------------------------------------------------------------


def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Slice/interp the (L, head_dim) table to the (q_size, k_size) grid."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        # linear interpolation along the table axis (torch F.interpolate parity)
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32),
            (max_rel_dist, rel_pos.shape[1]),
            method="linear",
            antialias=False,
        ).astype(rel_pos.dtype)
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[relative.astype(jnp.int32)]  # [q, k, head_dim]


def decomposed_rel_pos_bias(
    q: jax.Array,
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    q_size: Tuple[int, int],
    k_size: Tuple[int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Return (rel_h [B, qh, qw, kh], rel_w [B, qh, qw, kw]) bias factors.

    q: [B, qh*qw, head_dim]. Caller adds rel_h[..., :, None] + rel_w[..., None, :]
    to the attention logits viewed as [B, qh, qw, kh, kw].
    """
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = get_rel_pos(q_h, k_h, rel_pos_h).astype(q.dtype)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w).astype(q.dtype)
    B = q.shape[0]
    r_q = q.reshape(B, q_h, q_w, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh, preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw, preferred_element_type=jnp.float32)
    return rel_h, rel_w


# ---------------------------------------------------------------------------
# SAM-ViT multi-head attention over a 2-D token grid
# ---------------------------------------------------------------------------


def init_attention_2d(
    key: jax.Array,
    dim: int,
    num_heads: int,
    use_rel_pos: bool,
    input_size: Optional[Tuple[int, int]] = None,
    qkv_bias: bool = True,
) -> Params:
    k1, k2 = jax.random.split(key)
    p: Params = {
        "qkv": init_dense(k1, dim, dim * 3, bias=qkv_bias),
        "proj": init_dense(k2, dim, dim),
    }
    if use_rel_pos:
        assert input_size is not None
        head_dim = dim // num_heads
        p["rel_pos_h"] = jnp.zeros((2 * input_size[0] - 1, head_dim), jnp.float32)
        p["rel_pos_w"] = jnp.zeros((2 * input_size[1] - 1, head_dim), jnp.float32)
    return p


def _attention_2d_fused_impl(
    p: Params, x: jax.Array, num_heads: int, window: int = 0
) -> jax.Array:
    """attention_2d via the Pallas VMEM-resident rel-pos kernel
    (cor_tpu.ops.pallas.vit_attention): logits + decomposed bias + softmax
    never leave VMEM. Numerics oracle: attention_2d (tested).

    With ``window > 0``, x stays on the UNPARTITIONED [B, H, W, C] grid and
    the window partition is fused into the kernel's block index maps — the
    reference's partition/unpartition transposes (image_encoder.py:244-290;
    measured ~14 ms of pure data movement per B=8 encoder forward) never
    materialize. Only the zero-pad to a window multiple (required semantics:
    pad tokens act as keys through the qkv bias) and the final crop remain.
    """
    from cor_tpu.ops.pallas.vit_attention import (
        vit_attention_relpos_pallas,
        vit_attention_relpos_windows_pallas,
    )

    B, H, W, C = x.shape
    N = H * W
    head_dim = C // num_heads
    # heads whose lane width doesn't tile 128 are lane-padded to 128 below
    # (sam_huge: head_dim 80 -> sixteen one-head "pairs"); the windows-fused
    # formulation has no pad shim, and head_dim > 128 would cross the 128-lane
    # block boundary the kernel addresses heads through
    pad_heads = 128 % head_dim != 0 and head_dim <= 128
    if (
        "rel_pos_h" not in p
        or head_dim > 128
        or (not pad_heads and C % 128 != 0)
        or (pad_heads and window > 0)
    ):
        if window > 0:
            xw, pad_hw = window_partition(x, window)
            xw = attention_2d(p, xw, num_heads)
            return window_unpartition(xw, window, pad_hw, (H, W))
        return attention_2d(p, x, num_heads)

    if window > 0:
        pad_h = (window - H % window) % window
        pad_w = (window - W % window) % window
        Hp_, Wp_ = H + pad_h, W + pad_w
        nwi, nwj = Hp_ // window, Wp_ // window
        # Mosaic requires the last-two block dims 8/128-aligned, so each
        # window-column group is stored at stride wpad >= window (window 14
        # -> 16). Build [B, Hp, nwj, wpad, C] in ONE fused pass: concat of
        # column slices + zero fill + H pad — all aligned copies, replacing
        # the 6-D partition/unpartition transposes.
        wpad = -(-window // 8) * 8
        zcol = jnp.zeros((B, H, wpad - window, C), x.dtype)
        groups = []
        for wj in range(nwj):
            lo = wj * window
            real = min(window, W - lo)
            g = x[:, :, lo : lo + real, :]
            if real < window:
                g = jnp.concatenate(
                    [g, jnp.zeros((B, H, window - real, C), x.dtype)], axis=2
                )
            if wpad > window:
                g = jnp.concatenate([g, zcol], axis=2)
            groups.append(g)
        xw = jnp.stack(groups, axis=2)  # [B, H, nwj, wpad, C]
        if pad_h:
            xw = jnp.pad(xw, ((0, 0), (0, pad_h), (0, 0), (0, 0), (0, 0)))
        qkv = dense(p["qkv"], xw)  # [B, Hp, nwj, wpad, 3C]
        Kp = -(-window // 32) * 32
        Rh = jnp.pad(
            get_rel_pos(window, window, p["rel_pos_h"]),
            ((0, 0), (0, Kp - window), (0, 0)),
        ).astype(x.dtype)
        # q-side table padded to wpad rows (pad-column queries are cropped)
        Rw = jnp.pad(
            get_rel_pos(window, window, p["rel_pos_w"]),
            ((0, wpad - window), (0, Kp - window), (0, 0)),
        ).astype(x.dtype)
        r_q = qkv[..., :C].reshape(B, nwi, window, nwj, wpad, num_heads, head_dim)
        # bias factors on the window-aligned layout: output dims
        # (b h r i s j k) merge contiguously — no transpose
        rel_h = jnp.einsum(
            "brisjhd,ikd->bhrisjk", r_q, Rh, preferred_element_type=jnp.float32
        ).astype(x.dtype).reshape(B, num_heads, Hp_, nwj, wpad, Kp)
        rel_w = jnp.einsum(
            "brisjhd,jkd->bhrisjk", r_q, Rw, preferred_element_type=jnp.float32
        ).astype(x.dtype).reshape(B, num_heads, Hp_, nwj, wpad, Kp)
        rows = jax.lax.broadcasted_iota(jnp.int32, (window, wpad), 0).reshape(-1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (window, wpad), 1).reshape(-1)
        eh_t = (rows[:, None] == jnp.arange(Kp)[None, :]).astype(jnp.float32)
        ew_t = (cols[:, None] == jnp.arange(Kp)[None, :]).astype(jnp.float32)
        out = vit_attention_relpos_windows_pallas(
            qkv, rel_h, rel_w, eh_t, ew_t, num_heads, window
        )
        # crop: [B, Hp, nwj, wpad, C] -> [B, H, W, C]
        out = out[:, :H, :, :window, :].reshape(B, H, Wp_, C)[:, :, :W, :]
        return dense(p["proj"], out)

    qkv = dense(p["qkv"], x.reshape(B, N, C))  # [B, N, 3C]
    r_q = qkv[..., :C].reshape(B, H, W, num_heads, head_dim)
    # bias factors in the compute dtype (fp32 accumulate): the kernel folds
    # them into its single logits GEMM, matching the reference's bf16-
    # autocast einsum precision (trainer_v3_g.py:51) while running the whole
    # bias at the compute dtype's MXU rate. The k-index axes are zero-padded
    # to the kernel's 32-lane alignment BEFORE the einsum so the factors come
    # out pre-padded (no extra HBM pad pass on the [B, heads, N, K] arrays).
    Hp = -(-H // 32) * 32
    Wp = -(-W // 32) * 32
    Rh = jnp.pad(get_rel_pos(H, H, p["rel_pos_h"]), ((0, 0), (0, Hp - H), (0, 0))).astype(x.dtype)
    Rw = jnp.pad(get_rel_pos(W, W, p["rel_pos_w"]), ((0, 0), (0, Wp - W), (0, 0))).astype(x.dtype)
    rel_h = jnp.einsum(
        "bijhd,ikd->bhijk", r_q, Rh, preferred_element_type=jnp.float32
    ).astype(x.dtype).reshape(B, num_heads, N, Hp)
    rel_w = jnp.einsum(
        "bijhd,jkd->bhijk", r_q, Rw, preferred_element_type=jnp.float32
    ).astype(x.dtype).reshape(B, num_heads, N, Wp)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).reshape(-1)
    eh = (jnp.arange(Hp)[:, None] == rows[None, :]).astype(jnp.float32)
    ew = (jnp.arange(Wp)[:, None] == cols[None, :]).astype(jnp.float32)

    if pad_heads:
        # lane-pad each head to 128 so the kernel's 128-lane head addressing
        # engages (sam_huge: head_dim 80) — exactness + scale/backward story
        # in cor_tpu.ops.pallas.lane_pad; the kcat column-mean of a zero
        # column is 0, so the kernel's mean shift stays exact too
        from cor_tpu.ops.pallas.lane_pad import crop_heads, pad_qkv_heads

        qkv = pad_qkv_heads(qkv, num_heads, head_dim)
    out = vit_attention_relpos_pallas(
        qkv, rel_h, rel_w, eh, ew, num_heads, scale=head_dim**-0.5
    )
    if pad_heads:
        out = crop_heads(out, num_heads, head_dim)
    return dense(p["proj"], out.reshape(B, H, W, C))


@functools.lru_cache(maxsize=None)
def _attention_2d_fused_diff(num_heads: int, window: int):
    from cor_tpu.ops.diff import with_oracle_vjp

    def oracle(p, x):
        if window > 0:
            H, W = x.shape[1], x.shape[2]
            xw, pad_hw = window_partition(x, window)
            xw = attention_2d(p, xw, num_heads)
            return window_unpartition(xw, window, pad_hw, (H, W))
        return attention_2d(p, x, num_heads)

    return with_oracle_vjp(
        lambda p, x: _attention_2d_fused_impl(p, x, num_heads, window), oracle
    )


def attention_2d_fused(
    p: Params, x: jax.Array, num_heads: int, window: int = 0
) -> jax.Array:
    """Differentiable front door for the Pallas rel-pos attention.

    window == 0 (the production path — global blocks, and windowed blocks
    after the XLA partition): fully differentiable; the kernel carries a
    REAL flash-backward Pallas kernel (vit_attention._kernel_bwd), so an
    unfrozen fine-tune's encoder backward never materializes the
    [B*heads, N, N] fp32 logits the XLA oracle would.

    window > 0 (the opt-in fused_window_indexing formulation): the windows
    kernel is forward-only; gradients route through the XLA oracle's VJP
    (cor_tpu.ops.diff.with_oracle_vjp, checkpoint-style recompute)."""
    if window > 0:
        return _attention_2d_fused_diff(num_heads, window)(p, x)
    return _attention_2d_fused_impl(p, x, num_heads, 0)


def attention_2d(p: Params, x: jax.Array, num_heads: int) -> jax.Array:
    """Multi-head self-attention over an NHWC token grid with optional
    decomposed rel-pos bias (reference: lib/sam_model/image_encoder.py:225-241).
    """
    B, H, W, C = x.shape
    N = H * W
    head_dim = C // num_heads
    scale = head_dim**-0.5

    qkv = dense(p["qkv"], x.reshape(B, N, C))  # [B, N, 3C]
    qkv = qkv.reshape(B, N, 3, num_heads, head_dim)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * num_heads, N, head_dim)
    q, k, v = qkv[0], qkv[1], qkv[2]

    attn = jnp.einsum(
        "bqd,bkd->bqk", q * scale, k, preferred_element_type=jnp.float32
    )  # [B*heads, N, N] fp32

    if "rel_pos_h" in p:
        rel_h, rel_w = decomposed_rel_pos_bias(
            q, p["rel_pos_h"], p["rel_pos_w"], (H, W), (H, W)
        )
        attn = attn.reshape(B * num_heads, H, W, H, W)
        attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
        attn = attn.reshape(B * num_heads, N, N)

    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkd->bqd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    out = out.reshape(B, num_heads, H, W, head_dim)
    out = out.transpose(0, 2, 3, 1, 4).reshape(B, H, W, C)
    return dense(p["proj"], out)


# ---------------------------------------------------------------------------
# generic projection-downsampled MHA (SAM two-way transformer style)
# ---------------------------------------------------------------------------


def init_attention_qkv(
    key: jax.Array, embed_dim: int, num_heads: int, downsample_rate: int = 1
) -> Params:
    internal = embed_dim // downsample_rate
    assert internal % num_heads == 0
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q_proj": init_dense(kq, embed_dim, internal),
        "k_proj": init_dense(kk, embed_dim, internal),
        "v_proj": init_dense(kv, embed_dim, internal),
        "out_proj": init_dense(ko, internal, embed_dim),
    }


def attention_heads(
    q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int
) -> jax.Array:
    """Scaled-dot-product attention on already-projected [B, N, C] operands.

    Head split/merge is expressed inside the einsums (BNHD layout, no explicit
    transposes) so XLA folds layout changes into the matmuls.
    """
    B, Nq, C = q.shape
    Nk = k.shape[1]
    head_dim = C // num_heads
    qh = q.reshape(B, Nq, num_heads, head_dim)
    kh = k.reshape(B, Nk, num_heads, head_dim)
    vh = v.reshape(B, Nk, num_heads, head_dim)
    attn = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) / (head_dim**0.5)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(B, Nq, C)


def attention_qkv(
    p: Params, q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int
) -> jax.Array:
    """Separate-projection MHA (reference: lib/sam_model/transformer.py:185-240).

    Head split/merge is expressed inside the einsums (BNHD layout, no explicit
    transposes) so XLA folds the layout changes into the matmuls — measured
    materially faster than transpose-then-matmul on TPU for the decoder's
    [B, 4096, C] image-side operands.
    """
    out = attention_heads(
        dense(p["q_proj"], q), dense(p["k_proj"], k), dense(p["v_proj"], v), num_heads
    )
    return dense(p["out_proj"], out)


# ---------------------------------------------------------------------------
# fused-QKV sequence MHA (SigLIP towers, timm/open_clip style)
# ---------------------------------------------------------------------------


def init_attention_seq(key: jax.Array, dim: int, qkv_bias: bool = True) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "qkv": init_dense(k1, dim, 3 * dim, bias=qkv_bias),
        "proj": init_dense(k2, dim, dim),
    }


def attention_seq_qkv_xla(qkv: jax.Array, num_heads: int) -> jax.Array:
    """XLA numerics oracle for attention_seq_qkv_pallas: softmax(qk^T)v on a
    fused-QKV operand [B, N, 3C] (q | k | v thirds, heads contiguous)."""
    C = qkv.shape[-1] // 3
    q, k, v = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]
    return attention_heads(q, k, v, num_heads)


@functools.lru_cache(maxsize=None)
def _attention_seq_core_diff(num_heads: int):
    from cor_tpu.ops.diff import with_oracle_vjp
    from cor_tpu.ops.pallas.seq_attention import attention_seq_qkv_pallas

    return with_oracle_vjp(
        lambda qkv: attention_seq_qkv_pallas(qkv, num_heads),
        lambda qkv: attention_seq_qkv_xla(qkv, num_heads),
    )


def attention_seq(p: Params, x: jax.Array, num_heads: int) -> jax.Array:
    """Standard fused-QKV self-attention over [B, N, C] (no mask).

    The softmax(qk^T)v core runs as a Pallas whole-sequence-in-VMEM kernel —
    XLA would round-trip the fp32 [B, H, N, N] logits through HBM, which
    dominates the SigLIP towers' runtime. The core is differentiable via the
    XLA-oracle VJP (cor_tpu.ops.diff), so unfrozen fine-tunes keep the fused
    path; under the reference's frozen towers the backward is never built.
    """
    qkv = dense(p["qkv"], x)  # [B, N, 3C], heads contiguous per third
    out = _attention_seq_core_diff(num_heads)(qkv)
    return dense(p["proj"], out)
