"""Fused Pallas UNet-1D forward for the serve path.

The XLA UNet step (models/diffusion/unet1d.py) is latency-bound at serve
shapes: ~100 small ops at (B=1, T~432) run at ~2% MFU, ~830 us/step, within
~1.4x of the op-level floor — the per-op dispatch/HBM-roundtrip overhead, not
compute, is the cost.  This module re-expresses one denoiser forward as a
handful of Pallas segment kernels: each segment stages its weights into VMEM
once and runs a whole stretch of the network (several ResBlock/Transformer
blocks) with every activation VMEM-resident.

MEASURED VERDICT (v5e-1, T=448): this v1 segmented form is parity-correct but
does NOT beat XLA in the sampler scan — 1.38 ms vs ~0.9 ms per step.  The
VMEM weight budget forces 24 segments/step, and a bare `pallas_call` costs
~67 us on this chip (measured with a no-op kernel), so invocation overhead
alone (~1.4 ms) eats the fusion win.  The in-kernel compute itself IS ~4x
cheaper than XLA's op stream (8 chained 448x512x512 matmuls: 45 us in-kernel
vs 174 us as XLA ops), and the weights-DMA floor is ~222 us/step (178 MB at
HBM roofline) — so a SINGLE-call whole-step kernel with weights streamed via
manually double-buffered DMA from HBM has a measured-grounded ~2-3x ceiling.
That is the v2 design; until it lands, serve keeps the XLA path (see
`Unit2MelSystem.unet_impl`).

Mosaic-proof construction (each of these avoids a known TPU lowering trap):
* GroupNorm uses one-hot group matmuls for the (T, C/G) statistics — no
  lane-dim splitting reshapes.
* stride-2 / nearest-x2 resampling are iota-generated selection matmuls.
* per-head attention goes through a lane-aligned padded head layout
  (C -> 8x128) built by an in-kernel permutation matmul, so head slices are
  128-aligned while the streamed weights stay compact.
* exact GELU (the reference's `gelu(approximate=False)`) uses an erf
  polynomial (Abramowitz-Stegun 7.1.26, |err| < 1.5e-7) — Mosaic has no erf.

Weight layout parity: `pack_unet_params` flattens the flax `UNet1D` params
(reference architecture: diffusers `unet_1d_condition.py:949-1035` reduced to
the instantiated config) into per-segment VMEM-shaped buffers; the per-res
`time_emb_proj` matmuls are fused into ONE (1024, sum 2C) projection computed
in XLA per step and sliced statically inside the kernels.

B=1 (single-stream serve) only; batched serve stays on the XLA path where it
is compute-bound anyway.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_unet_plan", "pack_unet_params", "unet_fwd_pallas"]

_BF = jnp.bfloat16
_F32 = jnp.float32

# VMEM budget per segment kernel: streamed weights + an activation/temporary
# headroom estimate must stay under this (v5e VMEM ~16 MB/core).
_SEG_WEIGHT_BUDGET = 13 * 2**20


# ---------------------------------------------------------------------------
# plan: static op list + segmentation
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _Res:
    cin: int
    cout: int
    groups: int
    ss_row: int          # row of this block's scale/shift in the (n_res, 512) tables
    name: str


@dataclass(frozen=True)
class _Attn:
    c: int
    heads: int
    groups: int
    name: str


@dataclass(frozen=True)
class _Conv:
    cin: int
    cout: int
    mode: str            # "plain" | "down" | "up"
    name: str


@dataclass(frozen=True)
class _Final:
    c: int
    cout: int
    groups: int


@dataclass(frozen=True)
class _Push:
    idx: int             # global skip index
    ch: int
    tdiv: int


@dataclass(frozen=True)
class _Pop:
    idx: int
    ch: int
    tdiv: int


@dataclass
class _Segment:
    ops: list            # plan entries
    w_lo: int            # slice into the flat packed-weights list
    w_hi: int
    skip_in: list        # global skip indices read from HBM
    skip_out: list       # global skip indices written for later segments
    t_in: int            # tdiv at entry
    c_in: int
    t_out: int
    c_out: int
    w_bytes: int
    name: str


def _res_weight_shapes(op: _Res):
    shapes = [((3, op.cin, op.cout), _BF), ((3, op.cout, op.cout), _BF)]
    if op.cin != op.cout:
        shapes.append(((op.cin, op.cout), _BF))
    shapes += [((2, op.cin), _F32), ((5, op.cout), _F32)]
    return shapes


def _attn_weight_shapes(op: _Attn):
    c = op.c
    return [
        ((8, c, c), _BF),       # q1 k1 v1 o1 q2 k2 v2 o2
        ((2, c, c), _BF),       # proj_in, proj_out
        ((c, 8 * c), _BF),      # GEGLU ff_proj
        ((4 * c, c), _BF),      # ff_out
        ((13, c), _F32),        # gn g/b, ln1 g/b, ln2 g/b, ln3 g/b, b_pi, b_o1, b_o2, b_po, b_ffo
        ((1, 8 * c), _F32),     # ff_proj bias
    ]


def _conv_weight_shapes(op: _Conv):
    return [((3, op.cin, op.cout), _BF), ((1, op.cout), _F32)]


def _final_weight_shapes(op: _Final):
    return [((2, op.c), _F32), ((3, op.c, op.cout), _BF), ((1, op.cout), _F32)]


def _op_weight_shapes(op):
    if isinstance(op, _Res):
        return _res_weight_shapes(op)
    if isinstance(op, _Attn):
        return _attn_weight_shapes(op)
    if isinstance(op, _Conv):
        return _conv_weight_shapes(op)
    if isinstance(op, _Final):
        return _final_weight_shapes(op)
    return []


def _op_weight_bytes(op) -> int:
    return sum(
        int(np.dtype(dt).itemsize) * int(functools.reduce(lambda a, b: a * b, sh, 1))
        for sh, dt in _op_weight_shapes(op)
    )


def _op_temp_bytes(op, T: int) -> int:
    """Rough live-temporary footprint of one op at frame count T (headroom
    estimate for segment packing, not an exact allocator model)."""
    if isinstance(op, _Attn):
        # padded q/k/v/o (T, 1024) bf16 + f32 scores (T, T) + gate (T, 8C)
        return T * 1024 * 2 * 4 + T * T * 4 + T * 8 * op.c * 2
    if isinstance(op, _Res):
        return T * max(op.cin, op.cout) * 2 * 4
    if isinstance(op, (_Conv, _Final)):
        c = op.cin if isinstance(op, _Conv) else op.c
        return T * c * 2 * 4
    return 0


def build_unet_plan(cfg) -> Tuple[list, int]:
    """Static op list mirroring UNet1D.__call__ exactly, plus the number of
    res blocks (rows of the scale/shift tables, in op order)."""
    boc = cfg.block_out_channels
    n = len(boc)
    lpb = cfg.layers_per_block
    g = cfg.norm_num_groups

    ops: list = []
    n_res = 0
    skip_idx = 0
    stack: List[Tuple[int, int, int]] = []   # (idx, ch, tdiv)
    tdiv = 1

    def res(cin, cout, name):
        nonlocal n_res
        ops.append(_Res(cin, cout, g, n_res, name))
        n_res += 1

    def push(ch):
        nonlocal skip_idx
        ops.append(_Push(skip_idx, ch, tdiv))
        stack.append((skip_idx, ch, tdiv))
        skip_idx += 1

    ops.append(_Conv(cfg.in_channels, boc[0], "plain", "conv_in"))
    ch = boc[0]
    push(ch)

    for i in range(n):
        for j in range(lpb):
            res(ch, boc[i], f"down_{i}_res_{j}")
            ch = boc[i]
            if cfg.cross_attn[i]:
                ops.append(_Attn(boc[i], cfg.n_heads, g, f"down_{i}_attn_{j}"))
            push(ch)
        if i < n - 1:
            ops.append(_Conv(boc[i], boc[i], "down", f"down_{i}_downsample"))
            tdiv *= 2
            push(ch)

    res(ch, boc[-1], "mid_res_0")
    ops.append(_Attn(boc[-1], cfg.n_heads, g, "mid_attn"))
    res(boc[-1], boc[-1], "mid_res_1")
    ch = boc[-1]

    rev = list(reversed(boc))
    rev_attn = list(reversed(cfg.cross_attn))
    for i in range(n):
        for j in range(lpb + 1):
            sidx, sch, stdiv = stack.pop()
            assert stdiv == tdiv, "skip/resolution mismatch in plan"
            ops.append(_Pop(sidx, sch, stdiv))
            res(ch + sch, rev[i], f"up_{i}_res_{j}")
            ch = rev[i]
            if rev_attn[i]:
                ops.append(_Attn(rev[i], cfg.n_heads, g, f"up_{i}_attn_{j}"))
        if i < n - 1:
            ops.append(_Conv(rev[i], rev[i], "up", f"up_{i}_upsample"))
            tdiv //= 2

    ops.append(_Final(ch, cfg.out_channels, g))
    return ops, n_res


def _segment_plan(ops, T: int) -> List[_Segment]:
    """Greedy segmentation under the VMEM weight budget.  Also computes which
    skips cross segment boundaries (those become kernel outputs/inputs)."""
    # first pass: assign ops to segments
    segments: List[_Segment] = []
    cur: list = []
    cur_bytes = 0
    cur_temp = 0
    w_ptr = 0
    w_lo = 0
    tdiv = 1

    # track tdiv/ch through the op stream for shapes
    ch = None
    seg_t_in = 1
    seg_c_in = None

    def flush(t_out, c_out):
        nonlocal cur, cur_bytes, cur_temp, w_lo, seg_t_in, seg_c_in
        if not cur:
            return
        segments.append(
            _Segment(
                ops=cur, w_lo=w_lo, w_hi=w_ptr, skip_in=[], skip_out=[],
                t_in=seg_t_in, c_in=seg_c_in, t_out=t_out, c_out=c_out,
                w_bytes=cur_bytes, name=f"seg{len(segments)}",
            )
        )
        cur, cur_bytes, cur_temp = [], 0, 0
        w_lo = w_ptr
        seg_t_in, seg_c_in = t_out, c_out

    for op in ops:
        wb = _op_weight_bytes(op)
        tb = _op_temp_bytes(op, T // tdiv)
        if cur and (cur_bytes + wb + max(cur_temp, tb) > _SEG_WEIGHT_BUDGET):
            flush(tdiv, ch)
        cur.append(op)
        cur_bytes += wb
        cur_temp = max(cur_temp, tb)
        w_ptr += len(_op_weight_shapes(op))
        if isinstance(op, _Conv):
            ch = op.cout
            if op.mode == "down":
                tdiv *= 2
            elif op.mode == "up":
                tdiv //= 2
        elif isinstance(op, _Res):
            ch = op.cout
        elif isinstance(op, _Final):
            ch = op.cout
        elif isinstance(op, _Pop):
            ch = (ch or 0) + op.ch
    flush(tdiv, ch)

    # second pass: skip routing. A push consumed in a later segment becomes a
    # kernel output of its own segment and an input of the consumer.
    pushed_in = {}
    for si, seg in enumerate(segments):
        for op in seg.ops:
            if isinstance(op, _Push):
                pushed_in[op.idx] = si
    for si, seg in enumerate(segments):
        for op in seg.ops:
            if isinstance(op, _Pop) and pushed_in[op.idx] != si:
                seg.skip_in.append(op.idx)
                src = segments[pushed_in[op.idx]]
                if op.idx not in src.skip_out:
                    src.skip_out.append(op.idx)
    return segments


# ---------------------------------------------------------------------------
# weight packing (flax params -> flat per-op buffers)
# ---------------------------------------------------------------------------

def pack_unet_params(params, cfg):
    """Flatten flax UNet1D params into the kernel layout.

    Returns {"weights": [jnp arrays in plan order], "time": {...}} — pure
    layout ops (transpose/stack/cast), safe to run inside jit (it executes
    once per serve program invocation, before the sampler scan).
    """
    ops, n_res = build_unet_plan(cfg)
    p = params
    ss_pad = max(op.cout for op in ops if isinstance(op, _Res))

    def norm_rows(name):
        return jnp.stack(
            [jnp.asarray(p[name]["scale"], _F32), jnp.asarray(p[name]["bias"], _F32)]
        )                                                    # (2, C)

    weights: list = []
    for op in ops:
        if isinstance(op, _Res):
            rp = p[op.name]
            weights.append(jnp.asarray(rp["conv1"]["kernel"], _BF))
            weights.append(jnp.asarray(rp["conv2"]["kernel"], _BF))
            if op.cin != op.cout:
                weights.append(jnp.asarray(rp["conv_shortcut"]["kernel"], _BF)[0])
            n1 = jnp.stack(
                [jnp.asarray(rp["norm1"]["scale"], _F32), jnp.asarray(rp["norm1"]["bias"], _F32)]
            )
            sc_b = (
                jnp.asarray(rp["conv_shortcut"]["bias"], _F32)
                if op.cin != op.cout
                else jnp.zeros((op.cout,), _F32)
            )
            n2b = jnp.stack(
                [
                    jnp.asarray(rp["norm2"]["scale"], _F32),
                    jnp.asarray(rp["norm2"]["bias"], _F32),
                    jnp.asarray(rp["conv1"]["bias"], _F32),
                    jnp.asarray(rp["conv2"]["bias"], _F32),
                    sc_b,
                ]
            )
            weights += [n1, n2b]
        elif isinstance(op, _Attn):
            ap = p[op.name]
            c = op.c
            w8 = jnp.stack(
                [
                    jnp.asarray(ap["attn1"]["to_q"]["kernel"], _BF),
                    jnp.asarray(ap["attn1"]["to_k"]["kernel"], _BF),
                    jnp.asarray(ap["attn1"]["to_v"]["kernel"], _BF),
                    jnp.asarray(ap["attn1"]["to_out"]["kernel"], _BF),
                    jnp.asarray(ap["attn2"]["to_q"]["kernel"], _BF),
                    jnp.asarray(ap["attn2"]["to_k"]["kernel"], _BF),
                    jnp.asarray(ap["attn2"]["to_v"]["kernel"], _BF),
                    jnp.asarray(ap["attn2"]["to_out"]["kernel"], _BF),
                ]
            )
            proj = jnp.stack(
                [jnp.asarray(ap["proj_in"]["kernel"], _BF), jnp.asarray(ap["proj_out"]["kernel"], _BF)]
            )
            nb = jnp.stack(
                [
                    jnp.asarray(ap["norm"]["scale"], _F32),
                    jnp.asarray(ap["norm"]["bias"], _F32),
                    jnp.asarray(ap["norm1"]["scale"], _F32),
                    jnp.asarray(ap["norm1"]["bias"], _F32),
                    jnp.asarray(ap["norm2"]["scale"], _F32),
                    jnp.asarray(ap["norm2"]["bias"], _F32),
                    jnp.asarray(ap["norm3"]["scale"], _F32),
                    jnp.asarray(ap["norm3"]["bias"], _F32),
                    jnp.asarray(ap["proj_in"]["bias"], _F32),
                    jnp.asarray(ap["attn1"]["to_out"]["bias"], _F32),
                    jnp.asarray(ap["attn2"]["to_out"]["bias"], _F32),
                    jnp.asarray(ap["proj_out"]["bias"], _F32),
                    jnp.asarray(ap["ff_out"]["bias"], _F32),
                ]
            )
            weights += [
                w8,
                proj,
                jnp.asarray(ap["ff_proj"]["kernel"], _BF),
                jnp.asarray(ap["ff_out"]["kernel"], _BF),
                nb,
                jnp.asarray(ap["ff_proj"]["bias"], _F32)[None, :],
            ]
        elif isinstance(op, _Conv):
            node = p[op.name] if op.name == "conv_in" else p[op.name]["conv"]
            weights += [
                jnp.asarray(node["kernel"], _BF),
                jnp.asarray(node["bias"], _F32)[None, :],
            ]
        elif isinstance(op, _Final):
            weights += [
                norm_rows("conv_norm_out"),
                jnp.asarray(p["conv_out"]["kernel"], _BF),
                jnp.asarray(p["conv_out"]["bias"], _F32)[None, :],
            ]

    # Fused time projection, columns permuted so the per-step XLA matmul emits
    # [scale rows | shift rows] directly reshapeable to two (n_res, ss_pad)
    # tables (zero-padded to ss_pad) — inside the kernel a res block then
    # reads offset-0 row slices (Mosaic can't broadcast lane-offset vectors).
    sc_w, sh_w, sc_b, sh_b = [], [], [], []
    for op in ops:
        if not isinstance(op, _Res):
            continue
        w = jnp.asarray(p[op.name]["time_emb_proj"]["kernel"], _BF)   # (E, 2C)
        b = jnp.asarray(p[op.name]["time_emb_proj"]["bias"], _BF)     # (2C,)
        c, pad = op.cout, ss_pad - op.cout
        sc_w.append(jnp.pad(w[:, :c], ((0, 0), (0, pad))))
        sh_w.append(jnp.pad(w[:, c:], ((0, 0), (0, pad))))
        sc_b.append(jnp.pad(b[:c], (0, pad)))
        sh_b.append(jnp.pad(b[c:], (0, pad)))
    time = {
        "mlp1_w": jnp.asarray(p["time_mlp1"]["kernel"], _BF),
        "mlp1_b": jnp.asarray(p["time_mlp1"]["bias"], _BF),
        "mlp2_w": jnp.asarray(p["time_mlp2"]["kernel"], _BF),
        "mlp2_b": jnp.asarray(p["time_mlp2"]["bias"], _BF),
        "proj_w": jnp.concatenate(sc_w + sh_w, axis=1),   # (E, 2*n_res*ss_pad)
        "proj_b": jnp.concatenate(sc_b + sh_b)[None, :],
    }
    return {"weights": weights, "time": time}


# ---------------------------------------------------------------------------
# in-kernel building blocks (operate on traced VMEM values)
# ---------------------------------------------------------------------------

def _row(ref, i):
    return ref[i : i + 1, :]            # (1, C), static row


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=_F32
    )


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf approximation (f32)."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x):
    xf = x.astype(_F32)
    return (0.5 * xf * (1.0 + _erf(xf * (2.0**-0.5)))).astype(x.dtype)


def _silu(x):
    xf = x.astype(_F32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _group_matrices(C: int, groups: int):
    gsize = C // groups
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    G = (ci // gsize == gi).astype(_F32)                 # (C, groups)
    gi2 = jax.lax.broadcasted_iota(jnp.int32, (groups, C), 0)
    ci2 = jax.lax.broadcasted_iota(jnp.int32, (groups, C), 1)
    GT = (ci2 // gsize == gi2).astype(_F32)              # (groups, C)
    return G, GT


def _groupnorm(x, gamma, beta, groups: int, eps: float):
    """x (T, C) -> f32 normalized * gamma + beta (flax GroupNorm semantics:
    statistics over (T, C/groups) per group)."""
    T, C = x.shape
    xf = x.astype(_F32)
    G, GT = _group_matrices(C, groups)
    s = jnp.sum(xf, axis=0, keepdims=True)               # (1, C)
    sq = jnp.sum(xf * xf, axis=0, keepdims=True)
    gs = _dot(s, G)                                      # (1, groups)
    gsq = _dot(sq, G)
    n = float(T * (C // groups))
    mean = gs / n
    var = gsq / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = _dot(mean, GT)
    rstd_c = _dot(rstd, GT)
    return (xf - mean_c) * rstd_c * gamma + beta         # f32


def _layernorm(x, gamma, beta, eps: float = 1e-6):
    xf = x.astype(_F32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * gamma + beta                              # f32


def _conv3(x, w_ref, bias=None, w_idx0: int = 0):
    """k=3 same-pad conv as three shifted matmuls. x (T, Cin) bf16,
    w_ref (3, Cin, Cout) bf16 -> (T, Cout) bf16."""
    T, Cin = x.shape
    zrow = jnp.zeros((1, Cin), x.dtype)
    xm = jnp.concatenate([zrow, x[: T - 1]], axis=0)     # x[t-1]
    xp = jnp.concatenate([x[1:], zrow], axis=0)          # x[t+1]
    y = _dot(xm, w_ref[0]) + _dot(x, w_ref[1]) + _dot(xp, w_ref[2])
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def _downsample_rows(y):
    """(T, C) -> (T//2, C): even rows via a selection matmul."""
    T, C = y.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (T // 2, T), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (T // 2, T), 1)
    S = (ci == 2 * ri).astype(y.dtype)
    return _dot(S, y).astype(y.dtype)


def _upsample_rows(x):
    """(T, C) -> (2T, C): nearest-neighbor repeat via a selection matmul."""
    T, C = x.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (2 * T, T), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (2 * T, T), 1)
    U = (ci == ri // 2).astype(x.dtype)
    return _dot(U, x).astype(x.dtype)


def _head_pad_matrix(C: int, d: int, dtype):
    """(C, heads*128) one-hot: channel c -> lane 128*(c//d) + c%d."""
    lanes = (C // d) * 128
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, lanes), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (C, lanes), 1)
    return (li == 128 * (ci // d) + ci % d).astype(dtype)


def _head_unpad_matrix(C: int, d: int, dtype):
    """(heads*128, C) one-hot: lane 128*h + i -> channel h*d + i (i < d)."""
    lanes = (C // d) * 128
    li = jax.lax.broadcasted_iota(jnp.int32, (lanes, C), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (lanes, C), 1)
    return (li == 128 * (ci // d) + ci % d).astype(dtype)


def _self_attention(h, wq, wk, wv, wo, out_bias, heads: int):
    """h (T, C) bf16 already layer-normed; per-head attention with f32 softmax
    (parity with ops.attention.dot_product_attention)."""
    T, C = h.shape
    d = C // heads
    scale = d**-0.5
    P = _head_pad_matrix(C, d, _BF)                      # (C, 1024)
    q = _dot(h, wq).astype(_BF)
    k = _dot(h, wk).astype(_BF)
    v = _dot(h, wv).astype(_BF)
    qp = _dot(q, P).astype(_BF)                          # (T, 1024), lane-aligned heads
    kp = _dot(k, P).astype(_BF)
    vp = _dot(v, P).astype(_BF)
    outs = []
    for hd in range(heads):
        sl = slice(128 * hd, 128 * (hd + 1))
        qh, kh, vh = qp[:, sl], kp[:, sl], vp[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=_F32
        ) * scale                                        # (T, T) f32; zero-padding adds 0
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(_BF)
        outs.append(_dot(p, vh).astype(_BF))             # (T, 128)
    op_all = jnp.concatenate(outs, axis=-1)              # (T, 1024)
    PT = _head_unpad_matrix(C, d, _BF)                   # (1024, C)
    o = _dot(op_all, PT).astype(_BF)                     # back to compact (T, C)
    return (_dot(o, wo) + out_bias).astype(_BF)


def _res_block(h, scale, shift, op: _Res, wrefs, eps: float = 1e-5):
    """ResBlock1D with precomputed scale/shift rows (1, cout) bf16."""
    it = iter(wrefs)
    conv1 = next(it)
    conv2 = next(it)
    sc = next(it) if op.cin != op.cout else None
    n1 = next(it)
    n2b = next(it)

    x = h
    y = _groupnorm(h, _row(n1, 0), _row(n1, 1), op.groups, eps).astype(_BF)
    y = _silu(y)
    y = _conv3(y, conv1, bias=_row(n2b, 2))
    y2 = _groupnorm(y, _row(n2b, 0), _row(n2b, 1), op.groups, eps).astype(_BF)
    y2 = y2 * (1 + scale) + shift
    y2 = _silu(y2)
    y2 = _conv3(y2, conv2, bias=_row(n2b, 3))

    if sc is not None:
        x = (_dot(x, sc[:]) + _row(n2b, 4)).astype(_BF)
    return (x + y2).astype(_BF)


def _attn_block(h, op: _Attn, wrefs):
    """TransformerBlock1D: GN(1e-6) -> proj_in -> [LN-attn, LN-attn, LN-GEGLU]
    -> proj_out + residual."""
    w8, proj, ffp, ffo, nb, ffpb = wrefs
    residual = h
    y = _groupnorm(h, _row(nb, 0), _row(nb, 1), op.groups, 1e-6).astype(_BF)
    y = (_dot(y, proj[0]) + _row(nb, 8)).astype(_BF)

    ln = _layernorm(y, _row(nb, 2), _row(nb, 3)).astype(_BF)
    y = y + _self_attention(ln, w8[0], w8[1], w8[2], w8[3], _row(nb, 9), op.heads)
    ln = _layernorm(y, _row(nb, 4), _row(nb, 5)).astype(_BF)
    y = y + _self_attention(ln, w8[4], w8[5], w8[6], w8[7], _row(nb, 10), op.heads)

    ln = _layernorm(y, _row(nb, 6), _row(nb, 7)).astype(_BF)
    gate = (_dot(ln, ffp[:]) + ffpb[:]).astype(_BF)      # (T, 8C)
    a = gate[:, : 4 * op.c]
    g = gate[:, 4 * op.c :]
    y = y + (_dot(a * _gelu_exact(g), ffo[:]) + _row(nb, 12)).astype(_BF)

    y = (_dot(y, proj[1]) + _row(nb, 11)).astype(_BF)
    return (y + residual).astype(_BF)


# ---------------------------------------------------------------------------
# segment kernels + driver
# ---------------------------------------------------------------------------

def _make_segment_kernel(seg: _Segment):
    n_weights = seg.w_hi - seg.w_lo

    def kernel(*refs):
        pos = 0
        h_ref = refs[pos]; pos += 1
        sc_ref = refs[pos]; pos += 1
        sh_ref = refs[pos]; pos += 1
        skip_refs = {}
        for gi in seg.skip_in:
            skip_refs[gi] = refs[pos]; pos += 1
        wrefs = list(refs[pos : pos + n_weights]); pos += n_weights
        out_ref = refs[pos]; pos += 1
        skip_out_refs = {}
        for gi in seg.skip_out:
            skip_out_refs[gi] = refs[pos]; pos += 1

        h = h_ref[:].astype(_BF)
        local_skips = {}
        wp = 0
        for op in seg.ops:
            if isinstance(op, _Res):
                k = len(_res_weight_shapes(op))
                scale = sc_ref[op.ss_row : op.ss_row + 1, : op.cout]
                shift = sh_ref[op.ss_row : op.ss_row + 1, : op.cout]
                h = _res_block(h, scale, shift, op, wrefs[wp : wp + k])
                wp += k
            elif isinstance(op, _Attn):
                h = _attn_block(h, op, wrefs[wp : wp + 6])
                wp += 6
            elif isinstance(op, _Conv):
                w, b = wrefs[wp], wrefs[wp + 1]
                wp += 2
                if op.mode == "up":
                    h = _upsample_rows(h)
                y = _conv3(h, w, bias=b[:])
                h = _downsample_rows(y) if op.mode == "down" else y
            elif isinstance(op, _Final):
                gn, w, b = wrefs[wp], wrefs[wp + 1], wrefs[wp + 2]
                wp += 3
                h = _groupnorm(h, _row(gn, 0), _row(gn, 1), op.groups, 1e-5).astype(_BF)
                h = _silu(h)
                h = _conv3(h, w, bias=b[:])
            elif isinstance(op, _Push):
                local_skips[op.idx] = h
                if op.idx in skip_out_refs:
                    skip_out_refs[op.idx][:] = h
            elif isinstance(op, _Pop):
                s = local_skips.pop(op.idx, None)
                if s is None:
                    s = skip_refs[op.idx][:].astype(_BF)
                h = jnp.concatenate([h, s], axis=-1)
        out_ref[:] = h

    return kernel


def unet_fwd_pallas(packed, x, t, cfg, *, interpret: bool = False):
    """One denoiser forward: x (1, T, in_channels), t (1,) -> eps (1, T, out).

    T must be divisible by the UNet downsample factor (GaussianDiffusion pads
    to that grid).  `packed` is the result of `pack_unet_params`.
    """
    B, T, Cin = x.shape
    assert B == 1, "fused pallas UNet serves B=1; batched serve uses XLA"
    assert T % cfg.downsample_factor == 0
    ops, n_res = build_unet_plan(cfg)
    segments = _segment_plan(ops, T)
    ss_pad = max(op.cout for op in ops if isinstance(op, _Res))

    # fused time embedding -> scale/shift tables, one matmul (XLA, per step)
    from latent_diffusion_speech_tpu.models.diffusion.unet1d import timestep_embedding

    tm = packed["time"]
    temb = timestep_embedding(t, cfg.block_out_channels[0]).astype(_BF)
    temb = jnp.dot(temb, tm["mlp1_w"]) + tm["mlp1_b"]
    temb = jnp.dot(jax.nn.silu(temb), tm["mlp2_w"]) + tm["mlp2_b"]
    ss = jnp.dot(jax.nn.silu(temb), tm["proj_w"]) + tm["proj_b"]   # (1, 2*n_res*ss_pad)
    ss = ss.astype(_BF)
    sc = ss[0, : n_res * ss_pad].reshape(n_res, ss_pad)
    sh = ss[0, n_res * ss_pad :].reshape(n_res, ss_pad)

    weights = packed["weights"]

    h = x[0].astype(_BF)                                  # (T, Cin)
    skip_vals = {}
    skip_shape = {}
    for op in ops:
        if isinstance(op, _Push):
            skip_shape[op.idx] = (T // op.tdiv, op.ch)

    for seg in segments:
        kern = _make_segment_kernel(seg)
        ins = [h, sc, sh]
        ins += [skip_vals[gi] for gi in seg.skip_in]
        ins += weights[seg.w_lo : seg.w_hi]
        out_sds = [jax.ShapeDtypeStruct((T // seg.t_out, seg.c_out), _BF)]
        out_sds += [jax.ShapeDtypeStruct(skip_shape[gi], _BF) for gi in seg.skip_out]
        outs = pl.pallas_call(
            kern,
            out_shape=out_sds,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_sds),
            interpret=interpret,
        )(*ins)
        h = outs[0]
        for gi, val in zip(seg.skip_out, outs[1:]):
            skip_vals[gi] = val

    return h[None].astype(x.dtype)
