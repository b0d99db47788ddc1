"""Whole-step streamed-weights Pallas UNet-1D (v2 of unet1d_fused).

Why v2: the v1 segmented kernel (unet1d_fused.py) is parity-correct but
loses to XLA on fixed `pallas_call` invocation overhead — ~67 us/call
measured on v5e, and the VMEM weight budget forces 24 calls/step.  This
module runs ONE denoiser forward as ONE `pallas_call`:

* Every matmul weight is packed into one flat HBM buffer per lane class
  (cout rounded up to a multiple of 128), as row blocks at static offsets.
  Blocks are capped at 512 rows; larger matmuls are split into row chunks
  consumed against 128-aligned column slices of the activation.
* The kernel streams blocks HBM->VMEM with per-class double-buffered manual
  DMA (`pltpu.make_async_copy` + 2-slot scratch + DMA semaphores), so weight
  traffic overlaps compute.  The whole network is unrolled; every activation
  and all skip connections stay VMEM-resident.
* Small f32 vectors (norm scales/biases, conv biases) ride in one packed
  (rows, <=512) VMEM input; vectors wider than the lane width span several
  rows and are re-concatenated in-kernel.  The per-res time scale/shift
  tables are computed by one XLA matmul per step exactly as in v1.

MEASURED VERDICT (v5e-1, T=448): parity-correct (corr 0.99987 vs the flax
step, bf16 level) but 1.23 ms/step vs ~0.9 ms for XLA — and the bottleneck
is NOT fixable from inside a kernel.  DMA microbenchmarks on this chip:

* one sequential DMA queue sustains ~177 GB/s, independent of chunk size
  (0.12-4 MB), pipeline depth (2-8 slots), dtype, and of who issues it
  (manual `make_async_copy` and Mosaic's automatic grid pipelining measure
  identically);
* queues over the SAME source buffer do not parallelize (~180 GB/s for
  4/8/16 interleaved queues); separate source buffers do, but aggregate
  saturates at ~240-350 GB/s (8-16 sources, run-to-run variance);
* XLA reaches ~660 GB/s on a plain f32 reduction, and the XLA UNet step's
  ~0.9 ms implies ~220 GB/s effective weight streaming — already at the
  practical multi-queue rate.

With ~187 MB of bf16 weights re-streamed every step (VMEM is 16 MB — no
residency is possible), the B=1 denoiser step is weight-bandwidth-bound:
the best a fused kernel could reach is ~1.3x, not the 2-5x the op-dispatch
hypothesis promised.  The real lever is batching, which amortizes the weight
stream B-fold and is already the serve default (tts_batch / serve B=8).
This module stays as tested infrastructure: the streamed-weights whole-
network kernel pattern (flat per-lane-class HBM buffers, double-buffered
per-class DMA queues, in-kernel re-concat of wide vectors) is the right
starting point if a future chip/toolchain lifts the per-queue DMA rate.

Numerics, layout parity, and the op plan are shared with v1 (imported); the
reference architecture is diffusers `unet_1d_condition.py:949-1035` reduced
to the instantiated config.  B=1 (single-stream serve) only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from latent_diffusion_speech_tpu.ops.pallas.unet1d_fused import (
    _Attn,
    _Conv,
    _Final,
    _Pop,
    _Push,
    _Res,
    _dot,
    _downsample_rows,
    _gelu_exact,
    _groupnorm,
    _head_pad_matrix,
    _head_unpad_matrix,
    _layernorm,
    _silu,
    _upsample_rows,
    build_unet_plan,
)

__all__ = ["pack_unet_params_stream", "unet_fwd_pallas_stream", "build_stream_schedule"]

_BF = jnp.bfloat16
_F32 = jnp.float32


def _ceil(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _cls_of(cout: int) -> int:
    return _ceil(max(cout, 128), 128)


# Streamed blocks are capped at this many rows; a (rows, cols) matmul weight
# with rows > the cap is split into row chunks consumed against column slices
# of the activation (chunk boundaries are 128-aligned).  Caps the per-class
# double-buffer scratch at (2, 512, cls).
_MAX_BLOCK_ROWS = 512

# Lane width of the packed smalls buffer; wider vectors span several rows.
_SMALL_LANES = 512


def _row_chunks(rows: int):
    out = []
    r0 = 0
    while r0 < rows:
        out.append((r0, min(_MAX_BLOCK_ROWS, rows - r0)))
        r0 += out[-1][1]
    return out


@dataclass(frozen=True)
class _WBlock:
    """One streamed weight chunk: rows x cols living in flat[cls] at row
    offset `off` (rows16 = rows padded to the bf16 sublane tile)."""
    cls: int
    rows: int
    cols: int
    off: int

    @property
    def rows16(self) -> int:
        return _ceil(self.rows, 16)


def _op_mm_dims(op) -> List[tuple]:
    """Logical (rows, cols) per matmul weight, in the exact in-kernel
    consumption order.  Must stay in lockstep with the kernel body and the
    packer (row-chunk splitting is applied identically on both sides)."""
    if isinstance(op, _Res):
        dims = [(op.cin, op.cout)] * 3 + [(op.cout, op.cout)] * 3
        if op.cin != op.cout:
            dims.append((op.cin, op.cout))
        return dims
    if isinstance(op, _Attn):
        c = op.c
        dims = [(c, c)]                      # proj_in
        dims += [(c, c)] * 8                 # q1 k1 v1 o1 q2 k2 v2 o2
        dims += [(c, c)] * 12                # GEGLU: (Wa_i, Wg_i, V_i) x 4
        dims += [(c, c)]                     # proj_out
        return dims
    if isinstance(op, _Conv):
        return [(op.cin, op.cout)] * 3
    if isinstance(op, _Final):
        return [(op.c, op.cout)] * 3
    return []


def _op_small_vecs(op) -> List[int]:
    """Lane count of each small f32 vector, in consumption order."""
    if isinstance(op, _Res):
        # n1 scale, n1 bias, n2 scale, n2 bias, b_conv1, b_conv2, b_shortcut
        return [op.cin, op.cin, op.cout, op.cout, op.cout, op.cout, op.cout]
    if isinstance(op, _Attn):
        # gn s/b, ln1 s/b, ln2 s/b, ln3 s/b, b_pi, b_o1, b_o2, b_po, b_ffo,
        # then GEGLU biases a0..a3, g0..g3
        return [op.c] * 21
    if isinstance(op, _Conv):
        return [op.cout]
    if isinstance(op, _Final):
        return [op.c, op.c, op.cout]
    return []


def _vec_rows(lanes: int) -> int:
    return -(-lanes // _SMALL_LANES)


def build_stream_schedule(cfg):
    """Static streaming plan.  Returns (ops, n_res, chunks_per_op,
    srow_off_per_op, flat_rows {cls: total}, smalls_rows)."""
    ops, n_res = build_unet_plan(cfg)
    heads: Dict[int, int] = {}
    chunks_per_op: List[List[_WBlock]] = []
    srow_off_per_op: List[int] = []
    s_off = 0
    for op in ops:
        chunks = []
        for rows, cols in _op_mm_dims(op):
            cls = _cls_of(cols)
            for _, crows in _row_chunks(rows):
                off = heads.setdefault(cls, 0)
                b = _WBlock(cls, crows, cols, off)
                heads[cls] = off + b.rows16
                chunks.append(b)
        chunks_per_op.append(chunks)
        srow_off_per_op.append(s_off)
        s_off += sum(_vec_rows(l) for l in _op_small_vecs(op))
    return ops, n_res, chunks_per_op, srow_off_per_op, dict(heads), s_off


def pack_unet_params_stream(params, cfg):
    """Flax UNet1D params -> streamed-kernel layout.  Pure layout ops (pad /
    slice / concat / cast); safe inside jit (runs once per serve program).

    Returns {"flat": {cls: (rows, cls) bf16}, "smalls": (R, 512) f32,
    "time": the same fused time projection as v1}."""
    ops, n_res, chunks_per_op, srow_off, flat_rows, s_rows = build_stream_schedule(cfg)
    p = params
    flat_parts: Dict[int, list] = {c: [] for c in flat_rows}
    smalls: list = []

    def put_w(w):
        """Append one logical matmul weight (rows, cols), chunked."""
        w = jnp.asarray(w, _BF)
        rows, cols = w.shape
        cls = _cls_of(cols)
        for r0, crows in _row_chunks(rows):
            chunk = w[r0 : r0 + crows]
            flat_parts[cls].append(
                jnp.pad(chunk, ((0, _ceil(crows, 16) - crows), (0, cls - cols)))
            )

    def put_v(v):
        """Append one small f32 vector as 1+ lane-width rows."""
        v = jnp.asarray(v, _F32).reshape(-1)
        for r0 in range(0, v.shape[0], _SMALL_LANES):
            seg = v[r0 : r0 + _SMALL_LANES]
            smalls.append(jnp.pad(seg, (0, _SMALL_LANES - seg.shape[0])))

    for op in ops:
        if isinstance(op, _Res):
            rp = p[op.name]
            for k in range(3):
                put_w(rp["conv1"]["kernel"][k])
            for k in range(3):
                put_w(rp["conv2"]["kernel"][k])
            if op.cin != op.cout:
                put_w(rp["conv_shortcut"]["kernel"][0])
                sc_b = rp["conv_shortcut"]["bias"]
            else:
                sc_b = jnp.zeros((op.cout,), _F32)
            for v in [rp["norm1"]["scale"], rp["norm1"]["bias"],
                      rp["norm2"]["scale"], rp["norm2"]["bias"],
                      rp["conv1"]["bias"], rp["conv2"]["bias"], sc_b]:
                put_v(v)
        elif isinstance(op, _Attn):
            ap = p[op.name]
            c = op.c
            put_w(ap["proj_in"]["kernel"])
            for attn in ("attn1", "attn2"):
                for leaf in ("to_q", "to_k", "to_v", "to_out"):
                    put_w(ap[attn][leaf]["kernel"])
            ffp = jnp.asarray(ap["ff_proj"]["kernel"], _BF)    # (C, 8C)
            ffo = jnp.asarray(ap["ff_out"]["kernel"], _BF)     # (4C, C)
            for i in range(4):
                put_w(ffp[:, i * c:(i + 1) * c])               # Wa_i
                put_w(ffp[:, (4 + i) * c:(5 + i) * c])         # Wg_i
                put_w(ffo[i * c:(i + 1) * c, :])               # V_i
            put_w(ap["proj_out"]["kernel"])
            fb = jnp.asarray(ap["ff_proj"]["bias"], _F32)      # (8C,)
            for v in [ap["norm"]["scale"], ap["norm"]["bias"],
                      ap["norm1"]["scale"], ap["norm1"]["bias"],
                      ap["norm2"]["scale"], ap["norm2"]["bias"],
                      ap["norm3"]["scale"], ap["norm3"]["bias"],
                      ap["proj_in"]["bias"],
                      ap["attn1"]["to_out"]["bias"], ap["attn2"]["to_out"]["bias"],
                      ap["proj_out"]["bias"], ap["ff_out"]["bias"]]:
                put_v(v)
            for i in range(4):
                put_v(fb[i * c:(i + 1) * c])                   # a biases
            for i in range(4):
                put_v(fb[(4 + i) * c:(5 + i) * c])             # g biases
        elif isinstance(op, _Conv):
            node = p[op.name] if op.name == "conv_in" else p[op.name]["conv"]
            for k in range(3):
                put_w(node["kernel"][k])
            put_v(node["bias"])
        elif isinstance(op, _Final):
            for k in range(3):
                put_w(p["conv_out"]["kernel"][k])
            for v in [p["conv_norm_out"]["scale"], p["conv_norm_out"]["bias"],
                      p["conv_out"]["bias"]]:
                put_v(v)

    flat = {c: jnp.concatenate(parts, axis=0) for c, parts in flat_parts.items()}
    for c, arr in flat.items():
        assert arr.shape == (flat_rows[c], c), (c, arr.shape, flat_rows[c])
    assert len(smalls) == s_rows

    return {
        "flat": flat,
        "smalls": jnp.stack(smalls),
        "time": _pack_time_only(params, cfg),
    }


def _pack_time_only(params, cfg):
    """v1's fused time projection (scale/shift column permutation) without
    packing the full v1 weight list."""
    ops, n_res = build_unet_plan(cfg)
    p = params
    ss_pad = max(op.cout for op in ops if isinstance(op, _Res))
    sc_w, sh_w, sc_b, sh_b = [], [], [], []
    for op in ops:
        if not isinstance(op, _Res):
            continue
        w = jnp.asarray(p[op.name]["time_emb_proj"]["kernel"], _BF)
        b = jnp.asarray(p[op.name]["time_emb_proj"]["bias"], _BF)
        c, pad = op.cout, ss_pad - op.cout
        sc_w.append(jnp.pad(w[:, :c], ((0, 0), (0, pad))))
        sh_w.append(jnp.pad(w[:, c:], ((0, 0), (0, pad))))
        sc_b.append(jnp.pad(b[:c], (0, pad)))
        sh_b.append(jnp.pad(b[c:], (0, pad)))
    return {
        "mlp1_w": jnp.asarray(p["time_mlp1"]["kernel"], _BF),
        "mlp1_b": jnp.asarray(p["time_mlp1"]["bias"], _BF),
        "mlp2_w": jnp.asarray(p["time_mlp2"]["kernel"], _BF),
        "mlp2_b": jnp.asarray(p["time_mlp2"]["bias"], _BF),
        "proj_w": jnp.concatenate(sc_w + sh_w, axis=1),
        "proj_b": jnp.concatenate(sc_b + sh_b)[None, :],
    }


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

class _Streamer:
    """Per-class double-buffered DMA queues over the flat weight buffers.

    The schedule (which chunk is consumed when) is fully static; `consume`
    waits for the in-flight DMA of the class's next chunk, reads the live
    slice, and immediately refills the freed slot with the chunk-after-next
    (the load precedes the refill DMA in program order)."""

    def __init__(self, sched: Dict[int, List[_WBlock]], flat_refs, scratch, sems):
        self.sched = sched
        self.flat = flat_refs
        self.scratch = scratch
        self.sems = sems
        self.issued = {c: 0 for c in sched}
        self.ptr = {c: 0 for c in sched}

    def _dma(self, c: int, j: int):
        b = self.sched[c][j]
        return pltpu.make_async_copy(
            self.flat[c].at[pl.ds(b.off, b.rows16)],
            self.scratch[c].at[j % 2, 0:b.rows16],
            self.sems[c].at[j % 2],
        )

    def start_next(self, c: int):
        j = self.issued[c]
        if j < len(self.sched[c]):
            self._dma(c, j).start()
            self.issued[c] = j + 1

    def prefetch(self):
        for c in self.sched:
            self.start_next(c)
            self.start_next(c)

    def consume(self, rows: int, cols: int):
        c = _cls_of(cols)
        j = self.ptr[c]
        b = self.sched[c][j]
        assert (b.rows, b.cols) == (rows, cols), (b, rows, cols)
        self._dma(c, j).wait()
        val = self.scratch[c][j % 2, 0:rows, 0:cols]
        self.ptr[c] = j + 1
        self.start_next(c)
        return val


def _mm_stream(x, st: _Streamer, rows: int, cols: int):
    """y = x[:, :rows] @ W(rows, cols) with W streamed in row chunks against
    128-aligned column slices of x.  Returns f32 (T, cols)."""
    y = None
    for r0, crows in _row_chunks(rows):
        part = _dot(x[:, r0 : r0 + crows], st.consume(crows, cols))
        y = part if y is None else y + part
    return y


def _conv3_stream(x, st: _Streamer, cout: int, bias):
    """k=3 same-pad conv, taps (and row chunks) streamed one by one."""
    T, Cin = x.shape
    zrow = jnp.zeros((1, Cin), x.dtype)
    xm = jnp.concatenate([zrow, x[: T - 1]], axis=0)
    xp = jnp.concatenate([x[1:], zrow], axis=0)
    y = _mm_stream(xm, st, Cin, cout)
    y = y + _mm_stream(x, st, Cin, cout)
    y = y + _mm_stream(xp, st, Cin, cout)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def _self_attention_stream(h, st: _Streamer, out_bias, heads: int):
    T, C = h.shape
    d = C // heads
    scale = d**-0.5
    P = _head_pad_matrix(C, d, _BF)
    q = _mm_stream(h, st, C, C).astype(_BF)
    k = _mm_stream(h, st, C, C).astype(_BF)
    v = _mm_stream(h, st, C, C).astype(_BF)
    qp = _dot(q, P).astype(_BF)
    kp = _dot(k, P).astype(_BF)
    vp = _dot(v, P).astype(_BF)
    outs = []
    for hd in range(heads):
        sl = slice(128 * hd, 128 * (hd + 1))
        qh, kh, vh = qp[:, sl], kp[:, sl], vp[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=_F32
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        pr = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(_BF)
        outs.append(_dot(pr, vh).astype(_BF))
    op_all = jnp.concatenate(outs, axis=-1)
    PT = _head_unpad_matrix(C, d, _BF)
    o = _dot(op_all, PT).astype(_BF)
    return (_mm_stream(o, st, C, C) + out_bias).astype(_BF)


def _make_stream_kernel(cfg, T: int):
    ops, n_res, chunks_per_op, srow_off, flat_rows, s_rows = build_stream_schedule(cfg)
    classes = sorted(flat_rows)
    sched: Dict[int, List[_WBlock]] = {c: [] for c in classes}
    for chunks in chunks_per_op:
        for b in chunks:
            sched[b.cls].append(b)

    def kernel(*refs):
        pos = 0
        h_ref = refs[pos]; pos += 1
        sc_ref = refs[pos]; pos += 1
        sh_ref = refs[pos]; pos += 1
        sm_ref = refs[pos]; pos += 1
        flat_refs = {}
        for c in classes:
            flat_refs[c] = refs[pos]; pos += 1
        out_ref = refs[pos]; pos += 1
        scratch = {}
        for c in classes:
            scratch[c] = refs[pos]; pos += 1
        sems = {}
        for c in classes:
            sems[c] = refs[pos]; pos += 1

        st = _Streamer(sched, flat_refs, scratch, sems)
        st.prefetch()

        h = h_ref[:].astype(_BF)
        skips = {}
        for op, s_base in zip(ops, srow_off):
            vec_lanes = _op_small_vecs(op)
            vec_row = []
            r = s_base
            for l in vec_lanes:
                vec_row.append(r)
                r += _vec_rows(l)

            def vec(i):
                l = vec_lanes[i]
                r0 = vec_row[i]
                parts = []
                while l > 0:
                    w = min(_SMALL_LANES, l)
                    parts.append(sm_ref[r0 : r0 + 1, 0:w])
                    l -= w
                    r0 += 1
                return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)

            if isinstance(op, _Res):
                x = h
                y = _groupnorm(h, vec(0), vec(1), op.groups, 1e-5).astype(_BF)
                y = _silu(y)
                y = _conv3_stream(y, st, op.cout, vec(4))
                y2 = _groupnorm(y, vec(2), vec(3), op.groups, 1e-5).astype(_BF)
                scale = sc_ref[op.ss_row : op.ss_row + 1, : op.cout]
                shift = sh_ref[op.ss_row : op.ss_row + 1, : op.cout]
                y2 = y2 * (1 + scale) + shift
                y2 = _silu(y2)
                y2 = _conv3_stream(y2, st, op.cout, vec(5))
                if op.cin != op.cout:
                    x = (_mm_stream(x, st, op.cin, op.cout) + vec(6)).astype(_BF)
                h = (x + y2).astype(_BF)
            elif isinstance(op, _Attn):
                c = op.c
                residual = h
                y = _groupnorm(h, vec(0), vec(1), op.groups, 1e-6).astype(_BF)
                y = (_mm_stream(y, st, c, c) + vec(8)).astype(_BF)
                ln = _layernorm(y, vec(2), vec(3)).astype(_BF)
                y = y + _self_attention_stream(ln, st, vec(9), op.heads)
                ln = _layernorm(y, vec(4), vec(5)).astype(_BF)
                y = y + _self_attention_stream(ln, st, vec(10), op.heads)
                ln = _layernorm(y, vec(6), vec(7)).astype(_BF)
                acc = None
                for i in range(4):
                    a = (_mm_stream(ln, st, c, c) + vec(13 + i)).astype(_BF)
                    g = (_mm_stream(ln, st, c, c) + vec(17 + i)).astype(_BF)
                    part = _mm_stream((a * _gelu_exact(g)).astype(_BF), st, c, c)
                    acc = part if acc is None else acc + part
                y = y + (acc + vec(12)).astype(_BF)
                y = (_mm_stream(y, st, c, c) + vec(11)).astype(_BF)
                h = (y + residual).astype(_BF)
            elif isinstance(op, _Conv):
                if op.mode == "up":
                    h = _upsample_rows(h)
                y = _conv3_stream(h, st, op.cout, vec(0))
                h = _downsample_rows(y) if op.mode == "down" else y
            elif isinstance(op, _Final):
                h = _groupnorm(h, vec(0), vec(1), op.groups, 1e-5).astype(_BF)
                h = _silu(h)
                h = _conv3_stream(h, st, op.cout, vec(2))
            elif isinstance(op, _Push):
                skips[op.idx] = h
            elif isinstance(op, _Pop):
                h = jnp.concatenate([h, skips.pop(op.idx)], axis=-1)
        out_ref[:] = h

    return kernel, classes, sched


def unet_fwd_pallas_stream(packed, x, t, cfg, *, interpret: bool = False):
    """One denoiser forward: x (1, T, in_channels), t (1,) -> eps (1, T, out).

    `packed` is `pack_unet_params_stream`'s output.  T must be divisible by
    the UNet downsample factor (GaussianDiffusion pads to that grid)."""
    B, T, Cin = x.shape
    assert B == 1, "streamed pallas UNet serves B=1; batched serve uses XLA"
    assert T % cfg.downsample_factor == 0

    from latent_diffusion_speech_tpu.models.diffusion.unet1d import timestep_embedding

    ops, n_res = build_unet_plan(cfg)
    ss_pad = max(op.cout for op in ops if isinstance(op, _Res))
    tm = packed["time"]
    temb = timestep_embedding(t, cfg.block_out_channels[0]).astype(_BF)
    temb = jnp.dot(temb, tm["mlp1_w"]) + tm["mlp1_b"]
    temb = jnp.dot(jax.nn.silu(temb), tm["mlp2_w"]) + tm["mlp2_b"]
    ss = jnp.dot(jax.nn.silu(temb), tm["proj_w"]) + tm["proj_b"]
    ss = ss.astype(_BF)
    sc = ss[0, : n_res * ss_pad].reshape(n_res, ss_pad)
    sh = ss[0, n_res * ss_pad :].reshape(n_res, ss_pad)

    kernel, classes, sched = _make_stream_kernel(cfg, T)
    max_rows16 = {c: max(b.rows16 for b in sched[c]) for c in classes}

    ins = [x[0].astype(_BF), sc, sh, packed["smalls"]]
    ins += [packed["flat"][c] for c in classes]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    in_specs += [pl.BlockSpec(memory_space=pltpu.ANY)] * len(classes)
    scratch_shapes = [pltpu.VMEM((2, max_rows16[c], c), _BF) for c in classes]
    scratch_shapes += [pltpu.SemaphoreType.DMA((2,)) for _ in classes]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, cfg.out_channels), _BF),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*ins)
    return out[None].astype(x.dtype)
