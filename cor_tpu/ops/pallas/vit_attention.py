"""Pallas TPU kernel: SAM-ViT attention with decomposed relative-position
bias, k/v resident in VMEM.

The reference's ViT attention (lib/sam_model/image_encoder.py:225-241)
materializes fp32 [B*heads, N, N] logits plus the MViTv2 decomposed bias
(image_encoder.py:326-362) through HBM — for the 64x64-token global blocks
that is ~0.8 GB per block, and the 14x14-window blocks churn similar totals
across 25+ windows. Here each grid step holds one head-pair's full k/v in
VMEM (N <= 4096 -> <= 1 MB each), streams q row-tiles, and computes logits
PLUS bias in a single compute-dtype GEMM via feature concatenation:

    logits = [q*scale | rel_h | rel_w] @ [k | Eh^T | Ew^T]^T
        Eh[n, ki] = [n // W == ki],  Ew[n, kj] = [n % W == kj]

where rel_h/rel_w are the reference's einsum bias factors (computed in XLA —
tiny). The indicator columns expand the per-axis factors to the full [Tq, N]
bias inside the same MXU pass, so the logits and softmax never leave VMEM
and — unlike adding the bias with separate fp32 indicator GEMMs, the
previous form of this kernel — every FLOP runs at the compute dtype's MXU
rate (measured: the 4096-token global blocks drop 10.8 -> ~4 ms at B=8,
bf16). The factor widths are zero-padded so the concatenated contraction is
lane-aligned (14x14 windows: 64+32+32 = 128 exactly).

Heads are addressed as 128-lane pairs off the fused-QKV GEMM and split
in-register. vit_attention_relpos_pallas is DIFFERENTIABLE: its custom_vjp
backward is the flash-backward Pallas kernel at the bottom of this file
(dq/dk/dv/drel in VMEM, no [B*heads, N, N] HBM materialization) — the
reference freezes the encoder so CORE training never builds it, but an
unfrozen fine-tune (CoreConfig.freeze_towers=False) runs it on every step.
Falls back to interpreter mode off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cor_tpu.ops.pallas.upscale import _interpret


def _kernel(
    q_ref, k_ref, v_ref, rh_ref, rw_ref, eht_ref, ewt_ref, o_ref, kcat_ref,
    *, scale, head_dim,
):
    q2 = q_ref[0]  # [Tq, 128] head pair
    v2 = v_ref[0]  # [N, 128]

    # the concatenated key matrix [k_h | Eh^T | Ew^T] is invariant across the
    # q-tile grid axis — build it once per (batch, head-pair) in scratch
    # instead of paying the VPU concat on every tile step
    @pl.when(pl.program_id(2) == 0)
    def _build_kcat():
        k2 = k_ref[0]  # [N, 128]
        eht = eht_ref[:]  # [N, Khp] indicator columns (compute dtype)
        ewt = ewt_ref[:]  # [N, Kwp]
        for h in range(128 // head_dim):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            kcat = jnp.concatenate([k2[:, sl], eht, ewt], axis=1)
            # subtract the column mean: shifts every logit row by its own
            # mean (softmax-invariant), so the exp needs NO max pass. Same
            # stability argument as the two-way kernel's mean shift: exp
            # overflows only if a row's (max - mean) exceeds ~88; worst case
            # (a one-hot row, mean ~= min) that is the full logit RANGE, so
            # the honest bound is range ~88 — attention logits on LN'd
            # activations are O(10), and a range of 80 is already a hard
            # one-hot. Caveat for UNFROZEN fine-tunes (this kernel is on the
            # training path): a divergent run whose qkv/rel-pos weights blow
            # a head's logit range past ~88 NaNs here where a max-pass
            # softmax would saturate; at that point training is already
            # lost (per-element grad clip 0.5 makes the regime pathological).
            kcat_ref[h] = kcat - jnp.mean(kcat, axis=0, keepdims=True)

    outs = []
    for h in range(128 // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        # one fused logits+bias GEMM: contraction dim head_dim + Khp + Kwp
        qcat = jnp.concatenate([q2[:, sl] * scale, rh_ref[0, h], rw_ref[0, h]], axis=1)
        l = jax.lax.dot_general(
            qcat, kcat_ref[h], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Tq, N], rows pre-shifted to ~zero mean by the kcat shift
        # NOTE (round-4 floor measurement): the VPU softmax tail is FREE
        # here — replacing exp with a cast, or folding the row-sum into the
        # AV GEMM via a ones column in v, both measured NEUTRAL at B=8
        # (95.1 / 95.3 vs 95.0 ms encoder fwd): Mosaic fully overlaps the
        # [Tq, N] exp/sum/cast with the MXU passes. The kernel is bound by
        # the concat formulation's structural MXU cost (contraction 192 on
        # global logits + the AV GEMM's head_dim/128 lane duty) — floor
        # analysis in BASELINE.md. Kept in the original fp32-exp form so the
        # forward weights match the flash backward's fp32 recompute exactly.
        e = jnp.exp(l)
        s = jnp.sum(e, axis=-1, keepdims=True)
        # normalize AFTER the AV GEMM: one [Tq, head_dim] multiply instead
        # of an [Tq, N] divide
        av = jnp.dot(e.astype(q2.dtype), v2[:, sl], preferred_element_type=jnp.float32)
        outs.append(av / s)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _kernel_window(
    q_ref, k_ref, v_ref, rh_ref, rw_ref, eht_ref, ewt_ref, o_ref,
    *, scale, head_dim, window, wpad,
):
    """One grid step = one (batch, head-pair, window). The window's tokens are
    read straight out of the [B, Hp, nW, wpad, .] lane-aligned grid layout by
    the BlockSpec index maps — the XLA window_partition/unpartition transposes
    (a pure data-movement tax in the reference formulation,
    image_encoder.py:244-290) never materialize. The wpad-window columns
    beyond `window` are alignment padding only: masked out of the softmax
    below (unlike the TRUE grid pads, which the reference semantics admit as
    keys through the qkv bias)."""
    n = window * wpad
    q2 = q_ref[0].reshape(n, 128)  # [window, 1, wpad, 128] -> token-major
    k2 = k_ref[0].reshape(n, 128)
    v2 = v_ref[0].reshape(n, 128)
    eht = eht_ref[:]  # [n, Kp] indicator columns (compute dtype)
    ewt = ewt_ref[:]
    # keys at intra-window col >= window are layout padding: zero their
    # exp-weights (the mean-shifted logits never overflow, so a plain
    # multiplicative mask is exact)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % wpad
    kmask = (col < window).astype(jnp.float32)
    outs = []
    for h in range(128 // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        # every grid step is a fresh window, so kcat is built per step (the
        # q-tile reuse that justifies the global kernel's scratch is absent:
        # a window is a single q-tile). Column-mean shift as in _kernel.
        kcat = jnp.concatenate([k2[:, sl], eht, ewt], axis=1)
        kcat = kcat - jnp.mean(kcat, axis=0, keepdims=True)
        qcat = jnp.concatenate(
            [
                q2[:, sl] * scale,
                rh_ref[0, h].reshape(n, -1),
                rw_ref[0, h].reshape(n, -1),
            ],
            axis=1,
        )
        l = jax.lax.dot_general(
            qcat, kcat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n, n]
        e = jnp.exp(l) * kmask
        s = jnp.sum(e, axis=-1, keepdims=True)
        av = jnp.dot(e.astype(q2.dtype), v2[:, sl], preferred_element_type=jnp.float32)
        outs.append(av / s)
    o_ref[0] = (
        jnp.concatenate(outs, axis=-1).astype(o_ref.dtype).reshape(window, 1, wpad, 128)
    )


@functools.partial(jax.jit, static_argnames=("num_heads", "window"))
def vit_attention_relpos_windows_pallas(
    qkv: jax.Array,  # [B, Hp, nW, wpad, 3C] fused-QKV output, window-aligned
    rel_h: jax.Array,  # [B, HEADS, Hp, nW, wpad, Kp] bias factors
    rel_w: jax.Array,  # [B, HEADS, Hp, nW, wpad, Kp]
    eh_t: jax.Array,  # [n, Kp] intra-window row indicators (n = window*wpad)
    ew_t: jax.Array,  # [n, Kp] intra-window col indicators
    num_heads: int,
    window: int,
) -> jax.Array:  # [B, Hp, nW, wpad, C]
    """Windowed rel-pos attention with the window partition FUSED into the
    kernel's block indexing: block (1, window, 1, wpad, 128) at block index
    (b, wi, wj, head-pair) IS the window. wpad = window rounded up to the
    8-sublane alignment Mosaic requires of the last-two block dims; the
    caller pads each window-column group to wpad and crops after."""
    B, Hp, nwj, wpad, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    P = C // 128
    hpp = 128 // D
    nwi = Hp // window
    Kp = rel_h.shape[-1]
    dt = qkv.dtype

    return pl.pallas_call(
        functools.partial(
            _kernel_window, scale=1.0 / (D**0.5), head_dim=D, window=window, wpad=wpad
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, nwj, wpad, C), dt),
        grid=(B, P, nwi, nwj),
        in_specs=[
            pl.BlockSpec(
                (1, window, 1, wpad, 128),
                lambda b, j, wi, wj: (b, wi, wj, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, window, 1, wpad, 128),
                lambda b, j, wi, wj: (b, wi, wj, 0, P + j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, window, 1, wpad, 128),
                lambda b, j, wi, wj: (b, wi, wj, 0, 2 * P + j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hpp, window, 1, wpad, Kp),
                lambda b, j, wi, wj: (b, j, wi, wj, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hpp, window, 1, wpad, Kp),
                lambda b, j, wi, wj: (b, j, wi, wj, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (window * wpad, Kp), lambda b, j, wi, wj: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (window * wpad, Kp), lambda b, j, wi, wj: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, window, 1, wpad, 128),
            lambda b, j, wi, wj: (b, wi, wj, 0, j),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_interpret(),
    )(qkv, qkv, qkv, rel_h, rel_w, eh_t.astype(dt), ew_t.astype(dt))


def _tq_cap() -> int:
    """q-tile cap, default 512 — measured neutral across {256, 512, 1024} at
    B=8 (BASELINE.md round-4 floor analysis); COR_TPU_VIT_TQ re-measures on
    future Mosaic. Clamped to [8, 2048] and falls back on garbage values
    (2048 exceeds the 48 MB scoped-VMEM limit at N=4096; 0/1 would divide
    by zero in the halving loop)."""
    import os

    try:
        cap = int(os.environ.get("COR_TPU_VIT_TQ", "512"))
    except ValueError:
        return 512
    return max(8, min(cap, 2048))


def _pad_cols(x: jax.Array, to: int) -> jax.Array:
    pad = to - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


@functools.partial(jax.jit, static_argnames=("num_heads", "scale"))
def _vit_attention_relpos_pallas_impl(
    qkv: jax.Array,  # [B, N, 3C] fused-QKV GEMM output
    rel_h: jax.Array,  # [B, HEADS, N, Kh] bias factors (einsum(q, Rh)), compute dtype
    rel_w: jax.Array,  # [B, HEADS, N, Kw]
    eh: jax.Array,  # [Kh, N] row-indicator
    ew: jax.Array,  # [Kw, N] col-indicator
    num_heads: int,
    scale: float | None = None,  # None -> 1/sqrt(lane head_dim); callers that
    # lane-pad heads (head_dim 80 -> 128, sam_huge) pass the TRUE scale
) -> jax.Array:  # [B, N, C]
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    Kh = rel_h.shape[-1]
    Kw = rel_w.shape[-1]
    P = C // 128
    heads_per_pair = 128 // D

    # zero-pad the factor widths to 32-lane multiples so the concatenated
    # contraction (D + Khp + Kwp) is MXU-aligned (window 14: 64+32+32 = 128)
    Khp = -(-Kh // 32) * 32
    Kwp = -(-Kw // 32) * 32
    dt = qkv.dtype
    rel_h = _pad_cols(rel_h.astype(dt), Khp)
    rel_w = _pad_cols(rel_w.astype(dt), Kwp)
    eh_t = _pad_cols(eh.T.astype(dt), Khp)  # [N, Khp]
    ew_t = _pad_cols(ew.T.astype(dt), Kwp)  # [N, Kwp]

    tq = N
    while tq > _tq_cap() and N % (tq // 2) == 0 and tq % 2 == 0:
        tq //= 2

    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=(scale if scale is not None else 1.0 / (D**0.5)),
            head_dim=D,
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B, P, N // tq),
        scratch_shapes=[pltpu.VMEM((heads_per_pair, N, D + Khp + Kwp), dt)],
        in_specs=[
            pl.BlockSpec((1, tq, 128), lambda i, j, t: (i, t, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 128), lambda i, j, t: (i, 0, P + j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 128), lambda i, j, t: (i, 0, 2 * P + j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, heads_per_pair, tq, Khp),
                lambda i, j, t: (i, j, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, heads_per_pair, tq, Kwp),
                lambda i, j, t: (i, j, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((N, Khp), lambda i, j, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Kwp), lambda i, j, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, 128), lambda i, j, t: (i, t, j), memory_space=pltpu.VMEM
        ),
        # the kcat scratch (heads_per_pair x N x ~192 bf16, ~3 MB at N=4096)
        # pushes past the 16 MB compiler default; the chip takes far more
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_interpret(),
    )(qkv, qkv, qkv, rel_h, rel_w, eh_t, ew_t)
    return out


# ---------------------------------------------------------------------------
# flash backward: real gradients for unfrozen fine-tunes
# ---------------------------------------------------------------------------
#
# The forward computes, per head, o = softmax(qcat @ kcat^T) v with
# qcat = [q*scale | rel_h | rel_w] and kcat = [k | Eh^T | Ew^T] - colmean.
# The backward is the standard attention VJP on the CONCATENATED operands:
#
#   a   = softmax(l)                       (recomputed per q-tile; the whole
#                                           [Tq, N] row fits VMEM, so no
#                                           flash statistics are needed)
#   da  = do @ v^T
#   dl  = a * (da - rowsum(a*da))
#   dqcat = dl @ kcat   ->  dq = dqcat[:, :D] * scale,
#                           drel_h/drel_w = the factor column blocks
#   dk  = dl^T @ (q*scale),   dv = a^T @ do     (accumulated over q-tiles)
#
# Two identities make the mean-shifted kcat gradient-transparent:
# rowsum(dl) = 0 exactly, so dl @ kcat equals dl @ kcat_raw and
# colmean(dl^T @ qcat) = 0 — no shift-correction terms anywhere. The
# indicator columns Eh/Ew are integer-derived constants (zero cotangent).


def _kernel_bwd(
    q_ref, k_ref, v_ref, rh_ref, rw_ref, eht_ref, ewt_ref, do_ref,
    dq_ref, drh_ref, drw_ref, dk_ref, dv_ref, kcat_ref,
    *, scale, head_dim, khp, kwp,
):
    t = pl.program_id(2)
    q2 = q_ref[0]  # [Tq, 128] head pair
    v2 = v_ref[0]  # [N, 128]
    do2 = do_ref[0]  # [Tq, 128]

    @pl.when(t == 0)
    def _build_kcat():
        k2 = k_ref[0]
        eht = eht_ref[:]
        ewt = ewt_ref[:]
        for h in range(128 // head_dim):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            kcat = jnp.concatenate([k2[:, sl], eht, ewt], axis=1)
            kcat_ref[h] = kcat - jnp.mean(kcat, axis=0, keepdims=True)

    dqs, drhs, drws, dks, dvs = [], [], [], [], []
    for h in range(128 // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qs = q2[:, sl] * scale  # [Tq, D]
        qcat = jnp.concatenate([qs, rh_ref[0, h], rw_ref[0, h]], axis=1)
        kcat = kcat_ref[h]
        l = jax.lax.dot_general(
            qcat, kcat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Tq, N] fp32, rows ~zero-mean via the kcat shift
        e = jnp.exp(l)
        a = e / jnp.sum(e, axis=-1, keepdims=True)  # [Tq, N] fp32
        da = jax.lax.dot_general(
            do2[:, sl], v2[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Tq, N]
        dl = a * (da - jnp.sum(a * da, axis=-1, keepdims=True))
        dlc = dl.astype(q2.dtype)
        ac = a.astype(q2.dtype)
        dqcat = jnp.dot(dlc, kcat, preferred_element_type=jnp.float32)  # [Tq, Dext]
        dqs.append((dqcat[:, :head_dim] * scale).astype(q2.dtype))
        drhs.append(dqcat[:, head_dim : head_dim + khp])
        drws.append(dqcat[:, head_dim + khp : head_dim + khp + kwp])
        # contractions over the q-tile axis (no explicit transposes)
        dks.append(
            jax.lax.dot_general(
                dlc, qs, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # [N, D]
        dvs.append(
            jax.lax.dot_general(
                ac, do2[:, sl], dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # [N, D]

    dq_ref[0] = jnp.concatenate(dqs, axis=-1)
    drh_ref[0] = jnp.stack(drhs, axis=0).astype(drh_ref.dtype)
    drw_ref[0] = jnp.stack(drws, axis=0).astype(drw_ref.dtype)
    dk_full = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_full = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)

    @pl.when(t == 0)
    def _init_acc():
        dk_ref[0] = dk_full
        dv_ref[0] = dv_full

    @pl.when(t > 0)
    def _acc():
        dk_ref[0] += dk_full
        dv_ref[0] += dv_full


@functools.partial(jax.jit, static_argnames=("num_heads", "scale"))
def _vit_attention_relpos_bwd(
    qkv: jax.Array,
    rel_h: jax.Array,
    rel_w: jax.Array,
    eh: jax.Array,
    ew: jax.Array,
    do: jax.Array,  # [B, N, C] cotangent of the kernel output
    num_heads: int,
    scale: float | None = None,
):
    """Returns (dqkv [B, N, 3C], drel_h, drel_w) for vit_attention_relpos_pallas."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    Kh = rel_h.shape[-1]
    Kw = rel_w.shape[-1]
    P = C // 128
    hpp = 128 // D
    Khp = -(-Kh // 32) * 32
    Kwp = -(-Kw // 32) * 32
    dt = qkv.dtype
    rel_h_p = _pad_cols(rel_h.astype(dt), Khp)
    rel_w_p = _pad_cols(rel_w.astype(dt), Kwp)
    eh_t = _pad_cols(eh.T.astype(dt), Khp)
    ew_t = _pad_cols(ew.T.astype(dt), Kwp)

    # same cap as the forward so a COR_TPU_VIT_TQ re-measurement covers both
    tq = N
    while tq > _tq_cap() and N % (tq // 2) == 0 and tq % 2 == 0:
        tq //= 2

    qspec = pl.BlockSpec((1, tq, 128), lambda i, j, t: (i, t, j), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, N, 128), lambda i, j, t: (i, 0, P + j), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, N, 128), lambda i, j, t: (i, 0, 2 * P + j), memory_space=pltpu.VMEM)
    rhspec = pl.BlockSpec(
        (1, hpp, tq, Khp), lambda i, j, t: (i, j, t, 0), memory_space=pltpu.VMEM
    )
    rwspec = pl.BlockSpec(
        (1, hpp, tq, Kwp), lambda i, j, t: (i, j, t, 0), memory_space=pltpu.VMEM
    )

    dq, drh, drw, dk, dv = pl.pallas_call(
        functools.partial(
            _kernel_bwd, scale=(scale if scale is not None else 1.0 / (D**0.5)),
            head_dim=D, khp=Khp, kwp=Kwp,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), dt),  # dq
            jax.ShapeDtypeStruct((B, num_heads, N, Khp), jnp.float32),  # drel_h
            jax.ShapeDtypeStruct((B, num_heads, N, Kwp), jnp.float32),  # drel_w
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),  # dk (fp32 accum)
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),  # dv (fp32 accum)
        ),
        grid=(B, P, N // tq),
        scratch_shapes=[pltpu.VMEM((hpp, N, D + Khp + Kwp), dt)],
        in_specs=[qspec, kspec, vspec, rhspec, rwspec,
                  pl.BlockSpec((N, Khp), lambda i, j, t: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((N, Kwp), lambda i, j, t: (0, 0), memory_space=pltpu.VMEM),
                  qspec],
        out_specs=(
            qspec,
            rhspec,
            rwspec,
            pl.BlockSpec((1, N, 128), lambda i, j, t: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 128), lambda i, j, t: (i, 0, j), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qkv, qkv, qkv, rel_h_p, rel_w_p, eh_t, ew_t, do)

    dqkv = jnp.concatenate([dq.astype(dt), dk.astype(dt), dv.astype(dt)], axis=-1)
    return dqkv, drh[..., :Kh].astype(rel_h.dtype), drw[..., :Kw].astype(rel_w.dtype)


@functools.lru_cache(maxsize=None)
def _vit_attention_diff(num_heads: int, scale: float | None = None):
    @jax.custom_vjp
    def f(qkv, rel_h, rel_w, eh, ew):
        return _vit_attention_relpos_pallas_impl(
            qkv, rel_h, rel_w, eh, ew, num_heads, scale
        )

    def fwd(qkv, rel_h, rel_w, eh, ew):
        return f(qkv, rel_h, rel_w, eh, ew), (qkv, rel_h, rel_w, eh, ew)

    def bwd(res, do):
        qkv, rel_h, rel_w, eh, ew = res
        dqkv, drh, drw = _vit_attention_relpos_bwd(
            qkv, rel_h, rel_w, eh, ew, do.astype(qkv.dtype), num_heads, scale
        )
        # the indicator matrices are integer-derived constants
        return dqkv, drh, drw, jnp.zeros_like(eh), jnp.zeros_like(ew)

    f.defvjp(fwd, bwd)
    return f


def vit_attention_relpos_pallas(
    qkv, rel_h, rel_w, eh, ew, num_heads: int, scale: float | None = None
):
    """Differentiable entry: Pallas forward + the flash backward kernel above
    (NOT an XLA-oracle recompute — the oracle backward materializes
    [B*heads, N, N] fp32 logits through HBM twice). ``scale`` overrides the
    1/sqrt(lane head_dim) default — required when the caller lane-pads heads
    (head_dim 80 -> 128) so the pad width never enters the math."""
    return _vit_attention_diff(num_heads, scale)(qkv, rel_h, rel_w, eh, ew)
