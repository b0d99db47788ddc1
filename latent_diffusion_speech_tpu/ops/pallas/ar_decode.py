"""Whole-sequence autoregressive decode as ONE Pallas TPU kernel.

The serve path's bottleneck is the AR decode loop: the RoFormer semantic
decoder is tiny (1 post-LN layer, hidden 256) so each `lax.scan` step is pure
dispatch overhead — ~30 fused XLA kernels per token (~50 us/token measured on
v5e).  Everything the decode loop touches fits comfortably in VMEM (~5 MB at
the flagship geometry: tied embedding matrix 2.1 MB, layer weights <1 MB,
KV cache ~1 MB/stream), so this kernel runs the ENTIRE generation —
embedding lookup, rotary, KV-cache attention, cross-attention, FFN, LM head,
top-k/top-p sampling — as one `fori_loop` inside a single `pallas_call`:
weights are loaded from HBM once, per-step state never leaves the chip, and
per-token cost drops to the arithmetic itself.

Numerical conventions mirror the XLA scan path (`models/lm/roformer.py`,
`models/lm/sampling.py`): matmuls accumulate f32 and round to the model
dtype, LayerNorm/softmax/logit processing in f32, sampling processor order
repetition-penalty -> ban -> end-gate -> temperature -> fused top-k/top-p.
Stochastic sampling uses the TPU core PRNG (`pltpu.prng_random_bits`) via
Gumbel argmax — the same distribution as `jax.random.categorical`, but a
different random stream than the XLA path's threefry keys (greedy decoding
is bit-identical; sampled trajectories are equal in distribution only).

Attention inside the kernel avoids per-head reshapes (lane-dim relayouts)
with a segment-matmul trick: per-head scores come from `(k * q) @ Seg` where
`Seg[c, h] = (c // head_dim == h)`, and the context from a broadcast-back
`(p @ Seg^T) * v` row-sum.  All matmuls keep C on the lane axis.

The reference drives this loop through HF `generate`'s Python loop with CUDA
kernels per op (`text2semantic/roformer/roformer.py:235-242`); this is the
TPU-native extreme point of the same design space.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["roformer_decode_pallas", "decode_vmem_bytes", "DECODE_VMEM_BUDGET_BYTES"]

NEG = -1e30

# v5e scoped VMEM is ~16 MiB/core; reserve 1 MiB for Mosaic temporaries
# (vector spills, the iota/selector constants the kernel materializes).
DECODE_VMEM_BUDGET_BYTES = 15 * 2**20


def decode_vmem_bytes(cfg, batch: int, max_new_tokens: int, enc_len: int, dtype=jnp.float32) -> dict:
    """Exact VMEM byte accounting for the whole-decode kernel.

    Mirrors the operand construction in `roformer_decode_pallas` (and the
    scratch/output shapes of its `pallas_call`) term by term, so the capacity
    decision is arithmetic over the same shapes the kernel allocates — not an
    empirical score.  Returns a breakdown dict with a ``total`` key (bytes).

    Measured anchor (v5e, flagship C=256/H=8/nl=1, bf16): B=8 x 430 tokens x
    L=48 totals ~14.5 MB and compiles; B=16 totals ~22 MB and is rejected by
    Mosaic ("scoped allocation exceeds").  The 15 MiB budget sits between.
    """
    dcfg = cfg.decoder
    C = dcfg.hidden_size
    H = dcfg.num_attention_heads
    I = dcfg.intermediate_size
    V = cfg.semantic_vocab_size
    nl = dcfg.num_hidden_layers
    B, L, N = batch, enc_len, max_new_tokens
    Vp = _round_up(V, 128)
    Vr = _round_up(V, _align_of(dtype))
    Nr = _round_up(N, 8)
    w = jnp.dtype(dtype).itemsize  # model-dtype width
    f = 4                          # f32 width

    sizes = {
        "emb_eff": Vr * C * w,
        "embT": C * Vp * w,
        "head_bias": Vp * f,
        "rotary_tables": 2 * Nr * C * f,            # sin_full + cos_full
        "rot_matrix": C * C * w,                    # R
        "segment_matmuls": 2 * C * H * w,           # seg + segT
        "emb_ln": 2 * C * f,
        "head_transform": (C * C + C) * w,          # htw + htb
        "head_ln": 2 * C * f,
        # per-layer stacks: qkv+out + cross q/out = 6 square kernels, 6 biases
        "layer_attn": nl * (6 * C * C + 6 * C) * w,
        "layer_ffn": nl * (C * I + I + I * C + C) * w,
        "layer_lns": nl * 3 * 2 * C * f,            # self/cross/ff LN
        "cross_kv": 2 * nl * B * L * C * w,         # ck + cv
        "outputs": (Nr * B + B) * 4,                # tokens + lengths (int32)
        "kv_cache_scratch": 2 * nl * B * Nr * C * f,
        "repetition_scratch": B * Vp * f,
    }
    sizes["total"] = sum(sizes.values())
    return sizes


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _ln(x32, g, b, eps):
    """LayerNorm over the last axis; x32/g/b f32 arrays, g/b (1, C)."""
    m = jnp.mean(x32, axis=-1, keepdims=True)
    d = x32 - m
    v = jnp.mean(d * d, axis=-1, keepdims=True)
    return d * jax.lax.rsqrt(v + eps) * g + b


def _gelu_exact(x32):
    """0.5 * x * (1 + erf(x / sqrt(2))).

    Mosaic has no erf/erfc lowering, so erf uses the Abramowitz & Stegun
    7.1.26 rational polynomial (|abs err| <= 1.5e-7 — far below bf16
    resolution, so this matches `jax.nn.gelu(approximate=False)` after the
    model-dtype round)."""
    z = x32 * (2.0 ** -0.5)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.sign(z) * erf_abs
    return 0.5 * x32 * (1.0 + erf)


def _align_of(dtype) -> int:
    """Sublane alignment for dynamic row access (Mosaic can only prove
    block-aligned dynamic indices: bf16 packs 16 sublanes/tile, f32 8)."""
    return 16 if dtype == jnp.bfloat16 else 8


def _load_row(ref, idx, align):
    """ref[idx] (1, C) via an aligned block load + in-register row select
    (Mosaic rejects `ref[pl.ds(idx, 1)]` at unprovably-aligned idx).
    Rows must be padded so base+align stays in bounds.  Returns f32."""
    base = pl.multiple_of((idx // align) * align, align)
    block = ref[pl.ds(base, align), :].astype(jnp.float32)
    sel = jax.lax.broadcasted_iota(jnp.int32, (align, 1), 0) == (idx - base)
    return jnp.sum(jnp.where(sel, block, 0.0), axis=0, keepdims=True)


def _dense(x, w, b, dtype):
    """x (B, Cin) @ w (Cin, Cout) + b (1, Cout); f32 accumulate -> dtype."""
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(dtype)


def _decode_kernel(
    # SMEM scalars
    seed_ref, first_ref, clen_ref,
    # shared VMEM operands
    emb_ref, embT_ref, hb_ref, sin_ref, cos_ref, rot_ref, seg_ref, segT_ref,
    embln_ref, htw_ref, htb_ref, hln_ref,
    # per-layer stacked operands
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    sln_ref, cqw_ref, cqb_ref, cow_ref, cob_ref, cln_ref,
    ffiw_ref, ffib_ref, ffow_ref, ffob_ref, fln_ref,
    ck_ref, cv_ref,
    # outputs (logit_out only when debug_logits)
    *out_and_scratch,
    B: int, C: int, H: int, V: int, Vp: int, L: int, N: int, nl: int,
    eps: float, dtype,
    do_sample: bool, temperature: float, top_k: int, top_p: float,
    repetition_penalty: float, end_gate: Optional[float],
    eos: int, pad: int, ban_until: int, debug_logits: bool = False,
):
    if debug_logits:
        tok_out, len_out, logit_out, kc_ref, vc_ref, rep_ref = out_and_scratch
    else:
        tok_out, len_out, kc_ref, vc_ref, rep_ref = out_and_scratch
        logit_out = None
    D = C // H
    scale = D ** -0.5
    f32 = jnp.float32
    Np = _round_up(N, 8)          # cache rows (f32 sublane alignment)
    emb_align = _align_of(dtype)

    if do_sample:
        pltpu.prng_seed(seed_ref[0])

    iota_v = jax.lax.broadcasted_iota(jnp.int32, (1, Vp), 1)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (Np, H), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, H), 0)
    iota_8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    # scratch is uninitialized memory: zero the caches — masked attention
    # rows multiply by p=0, and 0 * garbage(NaN/Inf) would poison the context
    kc_ref[:] = jnp.zeros_like(kc_ref)
    vc_ref[:] = jnp.zeros_like(vc_ref)

    # repetition mask starts with the BOS token (scan path: one_hot(first))
    for b in range(B):
        rep_ref[b : b + 1, :] = (iota_v == first_ref[b]).astype(f32)

    seg = seg_ref[:]
    segT = segT_ref[:]

    def attend(q_b, kv_k, kv_v, valid):
        """One stream: q_b (1, C), kv (rows, C), valid (rows, H) bool."""
        s = jax.lax.dot_general(
            (kv_k * q_b).astype(dtype), seg,
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )  # (rows, H)
        s = jnp.where(valid, s * scale, NEG)
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=0, keepdims=True)
        p_exp = jax.lax.dot_general(
            p.astype(dtype), segT,
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ).astype(dtype)  # (rows, C)
        ctx = jnp.sum((p_exp * kv_v).astype(f32), axis=0, keepdims=True)
        return ctx.astype(dtype)

    def body(step, carry):
        tok, fin, cnt = carry  # tuples of per-stream scalars

        # aligned-block base + row selector for this step's dynamic stores
        base = pl.multiple_of((step // 8) * 8, 8)
        sel8 = iota_8 == (step - base)

        # ---- embedding + emb LN -------------------------------------------
        rows = [_load_row(emb_ref, tok[b], emb_align) for b in range(B)]
        x = jnp.concatenate(rows, axis=0) if B > 1 else rows[0]  # (B, C) f32
        x = _ln(x, embln_ref[0:1], embln_ref[1:2], eps).astype(dtype)

        sin = _load_row(sin_ref, step, 8).astype(dtype)  # (1, C)
        cos = _load_row(cos_ref, step, 8).astype(dtype)
        rot = rot_ref[:]

        for l in range(nl):
            # ---- self attention (rotary q/k, KV cache) --------------------
            q = _dense(x, wq_ref[l], bq_ref[l], dtype)
            k = _dense(x, wk_ref[l], bk_ref[l], dtype)
            v = _dense(x, wv_ref[l], bv_ref[l], dtype)
            q = q * cos + _dense(q, rot, None, dtype) * sin
            k = k * cos + _dense(k, rot, None, dtype) * sin
            valid = iota_n <= step
            outs = []
            for b in range(B):
                kblk = kc_ref[l * B + b, pl.ds(base, 8), :]
                kc_ref[l * B + b, pl.ds(base, 8), :] = jnp.where(
                    sel8, k[b : b + 1].astype(f32), kblk
                )
                vblk = vc_ref[l * B + b, pl.ds(base, 8), :]
                vc_ref[l * B + b, pl.ds(base, 8), :] = jnp.where(
                    sel8, v[b : b + 1].astype(f32), vblk
                )
                outs.append(attend(q[b : b + 1], kc_ref[l * B + b], vc_ref[l * B + b], valid))
            h = jnp.concatenate(outs, axis=0) if B > 1 else outs[0]
            h = _dense(h, wo_ref[l], bo_ref[l], dtype)
            x = _ln((x + h).astype(f32), sln_ref[l, 0:1], sln_ref[l, 1:2], eps).astype(dtype)

            # ---- cross attention (precomputed K/V) ------------------------
            cq = _dense(x, cqw_ref[l], cqb_ref[l], dtype)
            outs = []
            for b in range(B):
                cvalid = iota_l < clen_ref[b]
                outs.append(attend(cq[b : b + 1], ck_ref[l, b], cv_ref[l, b], cvalid))
            h = jnp.concatenate(outs, axis=0) if B > 1 else outs[0]
            h = _dense(h, cow_ref[l], cob_ref[l], dtype)
            x = _ln((x + h).astype(f32), cln_ref[l, 0:1], cln_ref[l, 1:2], eps).astype(dtype)

            # ---- FFN ------------------------------------------------------
            h = _dense(x, ffiw_ref[l], ffib_ref[l], dtype)
            h = _gelu_exact(h.astype(f32)).astype(dtype)
            h = _dense(h, ffow_ref[l], ffob_ref[l], dtype)
            x = _ln((x + h).astype(f32), fln_ref[l, 0:1], fln_ref[l, 1:2], eps).astype(dtype)

        # ---- LM head ------------------------------------------------------
        h = _dense(x, htw_ref[:], htb_ref[:], dtype)
        h = _gelu_exact(h.astype(f32)).astype(dtype)
        h = _ln(h.astype(f32), hln_ref[0:1], hln_ref[1:2], eps).astype(dtype)
        logits = jax.lax.dot_general(
            h, embT_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32
        ) + hb_ref[:].astype(f32)  # (B, Vp); pad columns carry -1e9 bias

        if logit_out is not None:  # debug: raw logits (stream 0) per step
            lblk = logit_out[pl.ds(base, 8), :]
            logit_out[pl.ds(base, 8), :] = jnp.where(sel8, logits[0:1], lblk)

        # ---- logit processors (sampling.process_logits order) -------------
        if repetition_penalty != 1.0:
            seen = rep_ref[:] > 0.5
            pen = jnp.where(
                logits > 0, logits / repetition_penalty, logits * repetition_penalty
            )
            logits = jnp.where(seen, pen, logits)
        if ban_until > 0:
            logits = jnp.where(iota_v < ban_until, NEG, logits)
        if end_gate is not None:
            mx = jnp.max(logits, axis=-1, keepdims=True)
            pr = jnp.exp(logits - mx)
            p_eos = jnp.sum(
                jnp.where(iota_v == eos, pr, 0.0), axis=-1, keepdims=True
            ) / jnp.sum(pr, axis=-1, keepdims=True)
            forced = jnp.where(iota_v == eos, 0.0, NEG)
            logits = jnp.where(p_eos > end_gate, forced, logits)
        if do_sample and temperature != 1.0:
            logits = logits / temperature

        if do_sample and top_k > 0:
            # k rounds of (max, mask) -> descending top-k values per stream
            vals = []
            x_l = logits
            for _ in range(top_k):
                m = jnp.max(x_l, axis=-1, keepdims=True)  # (B, 1)
                vals.append(m)
                x_l = jnp.where(x_l >= m, NEG, x_l)
            kth = vals[-1]
            if top_p < 1.0:
                # fused nucleus cutoff over the k ordered values
                exps = [jnp.exp(v - vals[0]) for v in vals]
                total = sum(exps)
                thresh = jnp.full_like(kth, jnp.inf)
                cum = jnp.zeros_like(kth)
                for i in range(top_k):
                    cutoff = (cum / total) > top_p  # cumulative BEFORE value i
                    thresh = jnp.where(cutoff, thresh, jnp.minimum(thresh, vals[i]))
                    cum = cum + exps[i]
                kth = jnp.maximum(thresh, kth)
            logits = jnp.where(logits < kth, NEG, logits)

        if do_sample:
            bits = pltpu.bitcast(pltpu.prng_random_bits((B, Vp)), jnp.uint32)
            # >>8 leaves 24 bits, so the int32 reinterpretation is exact
            # (Mosaic has no uint32->f32 cast)
            u = pltpu.bitcast(
                jax.lax.shift_right_logical(bits, jnp.asarray(8, jnp.uint32)),
                jnp.int32,
            ).astype(f32) * (1.0 / 16777216.0)
            gumbel = -jnp.log(-jnp.log(u + 1e-9))
            y = logits + gumbel
        else:
            y = logits

        # argmax with lowest-index tie-break
        m = jnp.max(y, axis=-1, keepdims=True)
        idx = jnp.min(jnp.where(y >= m, iota_v, Vp), axis=-1)  # (B,)

        new_tok, new_fin, new_cnt = [], [], []
        for b in range(B):
            nt = jnp.where(fin[b], pad, idx[b]).astype(jnp.int32)
            tblk = tok_out[pl.ds(base, 8), b : b + 1]
            tok_out[pl.ds(base, 8), b : b + 1] = jnp.where(sel8, nt, tblk)
            rep_ref[b : b + 1, :] = jnp.maximum(
                rep_ref[b : b + 1, :], (iota_v == nt).astype(f32)
            )
            new_cnt.append(cnt[b] + 1 - fin[b].astype(jnp.int32))
            new_fin.append(fin[b] | (nt == eos))
            new_tok.append(nt)
        return tuple(new_tok), tuple(new_fin), tuple(new_cnt)

    init = (
        tuple(first_ref[b] for b in range(B)),
        tuple(jnp.asarray(False) for _ in range(B)),
        tuple(jnp.asarray(0, jnp.int32) for _ in range(B)),
    )
    _, _, cnt = jax.lax.fori_loop(0, N, body, init)
    for b in range(B):
        len_out[0, b : b + 1] = cnt[b][None]


def roformer_decode_pallas(
    params,
    cfg,
    sampling,
    cross_kvs,
    cross_len,
    rng_seed,
    *,
    dtype=jnp.float32,
    interpret: bool = False,
    debug_logits: bool = False,
):
    """Run the full AR decode as one Pallas kernel.

    params: Roformer flax params dict; cfg: RoformerConfig; sampling:
    SamplingConfig; cross_kvs: per decoder layer [(k, v)] of (B, L, H, D) as
    `Roformer.compute_cross_kv` returns; cross_len: (B,) valid encoder
    lengths; rng_seed: int32 scalar seeding the TPU core PRNG.
    Returns (tokens (B, N), lengths (B,)) with the scan path's semantics
    (PAD after EOS; lengths include the EOS token).
    """
    dcfg = cfg.decoder
    C = dcfg.hidden_size
    H = dcfg.num_attention_heads
    D = C // H
    V = cfg.semantic_vocab_size
    Vp = _round_up(V, 128)
    nl = dcfg.num_hidden_layers
    N = sampling.max_new_tokens
    eps = dcfg.layer_norm_eps

    ck = jnp.stack(
        [kv[0].reshape(kv[0].shape[0], kv[0].shape[1], C).astype(dtype) for kv in cross_kvs]
    )  # (nl, B, L, C)
    cv = jnp.stack(
        [kv[1].reshape(kv[1].shape[0], kv[1].shape[1], C).astype(dtype) for kv in cross_kvs]
    )
    _, B, L, _ = ck.shape

    emb = params["semantic_embed"]["embedding"]
    type0 = params["dec_type_embed"]["embedding"][0]
    # rows padded to the dynamic-row-access alignment (block loads in-kernel)
    Vr = _round_up(V, 16)
    emb_eff = jnp.zeros((Vr, C), dtype).at[:V].set((emb + type0[None, :]).astype(dtype))
    embT = jnp.zeros((C, Vp), dtype).at[:, :V].set(emb.T.astype(dtype))  # tied head
    head_bias = jnp.full((1, Vp), -1e9, jnp.float32).at[0, :V].set(
        params["head_bias"].astype(jnp.float32)
    )

    # rotary tables expanded to (Nr, C): per-head-tiled pairwise sin/cos
    from latent_diffusion_speech_tpu.models.lm.roformer import rotary_sin_cos

    Nr = _round_up(N, 8)
    sin_t, cos_t = rotary_sin_cos(jnp.arange(Nr), D)  # (Nr, D) pairwise-repeated
    sin_full = jnp.tile(sin_t, (1, H)).astype(jnp.float32)
    cos_full = jnp.tile(cos_t, (1, H)).astype(jnp.float32)

    # pair rotation as a constant matmul: (x @ R)[2i] = -x[2i+1], [2i+1] = x[2i]
    R = np.zeros((C, C), np.float32)
    for j in range(C // 2):
        R[2 * j + 1, 2 * j] = -1.0
        R[2 * j, 2 * j + 1] = 1.0
    R = jnp.asarray(R, dtype)

    seg_np = np.zeros((C, H), np.float32)
    for c in range(C):
        seg_np[c, c // D] = 1.0
    seg = jnp.asarray(seg_np, dtype)
    segT = jnp.asarray(seg_np.T, dtype)

    def w(l, *path):
        node = params[f"dec_{l}"]
        for p in path:
            node = node[p]
        return node

    def stack_w(*path):
        return jnp.stack([w(l, *path).astype(dtype) for l in range(nl)])

    def stack_b(*path):
        return jnp.stack([w(l, *path).astype(dtype)[None, :] for l in range(nl)])

    def stack_ln(name):
        # (nl, 2, C) f32: row 0 scale, row 1 bias
        return jnp.stack(
            [
                jnp.stack(
                    [
                        w(l, name, "scale").astype(jnp.float32),
                        w(l, name, "bias").astype(jnp.float32),
                    ]
                )
                for l in range(nl)
            ]
        )

    operands = dict(
        wq=stack_w("self_attn", "query", "kernel"), bq=stack_b("self_attn", "query", "bias"),
        wk=stack_w("self_attn", "key", "kernel"), bk=stack_b("self_attn", "key", "bias"),
        wv=stack_w("self_attn", "value", "kernel"), bv=stack_b("self_attn", "value", "bias"),
        wo=stack_w("self_attn", "out", "kernel"), bo=stack_b("self_attn", "out", "bias"),
        sln=stack_ln("self_ln"),
        cqw=stack_w("cross_attn", "query", "kernel"), cqb=stack_b("cross_attn", "query", "bias"),
        cow=stack_w("cross_attn", "out", "kernel"), cob=stack_b("cross_attn", "out", "bias"),
        cln=stack_ln("cross_ln"),
        ffiw=stack_w("ff_in", "kernel"), ffib=stack_b("ff_in", "bias"),
        ffow=stack_w("ff_out", "kernel"), ffob=stack_b("ff_out", "bias"),
        fln=stack_ln("ff_ln"),
    )
    embln = jnp.stack(
        [
            params["dec_emb_ln"]["scale"].astype(jnp.float32),
            params["dec_emb_ln"]["bias"].astype(jnp.float32),
        ]
    )  # (2, C)
    htw = params["head_transform"]["kernel"].astype(dtype)
    htb = params["head_transform"]["bias"].astype(dtype)[None, :]
    hln = jnp.stack(
        [
            params["head_ln"]["scale"].astype(jnp.float32),
            params["head_ln"]["bias"].astype(jnp.float32),
        ]
    )

    first = jnp.full((B,), sampling.bos_token_id, jnp.int32)
    seed = jnp.asarray(rng_seed, jnp.int32).reshape((1,))
    clen = jnp.asarray(cross_len, jnp.int32).reshape((B,))

    kernel = partial(
        _decode_kernel,
        B=B, C=C, H=H, V=V, Vp=Vp, L=L, N=N, nl=nl, eps=eps, dtype=dtype,
        do_sample=sampling.do_sample, temperature=sampling.temperature,
        top_k=sampling.top_k, top_p=sampling.top_p,
        repetition_penalty=sampling.repetition_penalty,
        end_gate=sampling.end_gate_threshold,
        eos=sampling.eos_token_id, pad=sampling.pad_token_id,
        ban_until=sampling.ban_until, debug_logits=debug_logits,
    )

    vmem_operands = [
        emb_eff, embT, head_bias, sin_full, cos_full, R, seg, segT,
        embln, htw, htb, hln,
        operands["wq"], operands["bq"], operands["wk"], operands["bk"],
        operands["wv"], operands["bv"], operands["wo"], operands["bo"],
        operands["sln"], operands["cqw"], operands["cqb"], operands["cow"],
        operands["cob"], operands["cln"],
        operands["ffiw"], operands["ffib"], operands["ffow"], operands["ffob"],
        operands["fln"],
        ck, cv,
    ]

    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((Nr, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
    ]
    if debug_logits:
        out_shape.append(jax.ShapeDtypeStruct((Nr, Vp), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        in_specs=[smem_spec] * 3 + [vmem_spec] * len(vmem_operands),
        out_specs=[vmem_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nl * B, Nr, C), jnp.float32),  # k cache
            pltpu.VMEM((nl * B, Nr, C), jnp.float32),  # v cache
            pltpu.VMEM((B, Vp), jnp.float32),          # repetition mask
        ],
        interpret=interpret,
    )(seed, first, clen, *vmem_operands)
    tokens, lengths = outs[0], outs[1]
    if debug_logits:
        return tokens.T[:, :N], lengths[0], outs[2][:N, :V]
    return tokens.T[:, :N], lengths[0]
