"""Parity tests for the whole-decode Pallas kernel (ops/pallas/ar_decode.py).

Runs in interpreter mode on the CPU test mesh; greedy decoding must match the
XLA scan path exactly in f32 (same logits, same argmax, same EOS/PAD/length
semantics).  On-TPU numeric behavior is exercised by the serve bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_speech_tpu.models.lm.roformer import RoformerConfig, RoformerSystem
from latent_diffusion_speech_tpu.models.lm.sampling import SamplingConfig
from latent_diffusion_speech_tpu.ops.pallas.ar_decode import roformer_decode_pallas


@pytest.fixture(scope="module")
def lm():
    cfg = RoformerConfig(
        encoder=RoformerConfig().encoder.__class__(
            hidden_size=64, num_attention_heads=4, num_hidden_layers=2,
            intermediate_size=128,
        ),
        decoder=RoformerConfig().encoder.__class__(
            hidden_size=64, num_attention_heads=4, num_hidden_layers=1,
            intermediate_size=128,
        ),
        semantic_kmeans_num=300,
        n_spk=4,
    )
    return RoformerSystem(cfg, dtype=jnp.float32, seed=0)


def _pallas_decode(lm, phones, tones, spk, sampling, cross_len=None, seed=0):
    enc = lm.module.apply(
        {"params": lm.params}, phones, tones, spk, None, method=lm.module.encode
    )
    cross_kvs = lm.module.apply(
        {"params": lm.params}, enc, method=lm.module.compute_cross_kv
    )
    if cross_len is None:
        cross_len = np.full((phones.shape[0],), phones.shape[1], np.int32)
    return roformer_decode_pallas(
        lm.params, lm.cfg, sampling, cross_kvs, cross_len, seed,
        dtype=jnp.float32, interpret=True,
    )


def test_greedy_matches_scan_path(lm, rng):
    B, L, N = 2, 11, 20
    phones = jnp.asarray(rng.integers(1, 60, (B, L)).astype(np.int32))
    tones = jnp.asarray(rng.integers(0, 5, (B, L)).astype(np.int32))
    spk = jnp.ones_like(phones)

    toks_ref, lens_ref = lm.generate(
        phones, tones, spk_id=spk, max_length=N, do_sample=False,
        rng=jax.random.PRNGKey(0),
    )
    sampling = SamplingConfig(
        max_new_tokens=N, do_sample=False,
        eos_token_id=lm.cfg.semantic_eos, pad_token_id=lm.cfg.semantic_pad,
        bos_token_id=lm.cfg.semantic_bos,
    )
    toks_p, lens_p = _pallas_decode(lm, phones, tones, spk, sampling)
    np.testing.assert_array_equal(np.asarray(toks_p), np.asarray(toks_ref))
    np.testing.assert_array_equal(np.asarray(lens_p), np.asarray(lens_ref))


def test_greedy_respects_cross_length_mask(lm, rng):
    """Tokens must depend on the valid encoder prefix only: decoding with a
    padded encoder + cross_len L must differ from attending the full pad."""
    B, L, N = 1, 8, 12
    phones = jnp.asarray(rng.integers(1, 60, (B, L)).astype(np.int32))
    tones = jnp.asarray(rng.integers(0, 5, (B, L)).astype(np.int32))
    spk = jnp.ones_like(phones)
    sampling = SamplingConfig(
        max_new_tokens=N, do_sample=False,
        eos_token_id=lm.cfg.semantic_eos, pad_token_id=lm.cfg.semantic_pad,
        bos_token_id=lm.cfg.semantic_bos,
    )
    full, _ = _pallas_decode(lm, phones, tones, spk, sampling)
    half, _ = _pallas_decode(
        lm, phones, tones, spk, sampling, cross_len=np.asarray([L // 2], np.int32)
    )
    assert not np.array_equal(np.asarray(full), np.asarray(half))


def test_generate_impl_pallas_entry(lm, rng):
    """The generate(impl=...) plumbing compiles and matches the direct call."""
    B, L, N = 1, 7, 10
    phones = jnp.asarray(rng.integers(1, 60, (B, L)).astype(np.int32))
    tones = jnp.asarray(rng.integers(0, 5, (B, L)).astype(np.int32))
    spk = jnp.ones_like(phones)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        toks_a, lens_a = lm.generate(
            phones, tones, spk_id=spk, max_length=N, do_sample=False,
            rng=jax.random.PRNGKey(0), impl="pallas",
        )
    toks_b, lens_b = lm.generate(
        phones, tones, spk_id=spk, max_length=N, do_sample=False,
        rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_b))
    np.testing.assert_array_equal(np.asarray(lens_a), np.asarray(lens_b))


def test_greedy_end_gate_matches_scan_path(lm, rng):
    """The end-gate processor (force EOS when p(EOS) > threshold,
    reference roformer.py:49-57) must behave identically in-kernel."""
    B, L, N = 1, 9, 16
    phones = jnp.asarray(rng.integers(1, 60, (B, L)).astype(np.int32))
    tones = jnp.asarray(rng.integers(0, 5, (B, L)).astype(np.int32))
    spk = jnp.ones_like(phones)

    # a tiny threshold fires the gate immediately -> EOS at step 0, len 1
    toks_ref, lens_ref = lm.generate(
        phones, tones, spk_id=spk, max_length=N, do_sample=False,
        end_gate_threshold=1e-9, rng=jax.random.PRNGKey(0),
    )
    sampling = SamplingConfig(
        max_new_tokens=N, do_sample=False, end_gate_threshold=1e-9,
        eos_token_id=lm.cfg.semantic_eos, pad_token_id=lm.cfg.semantic_pad,
        bos_token_id=lm.cfg.semantic_bos,
    )
    toks_p, lens_p = _pallas_decode(lm, phones, tones, spk, sampling)
    np.testing.assert_array_equal(np.asarray(toks_p), np.asarray(toks_ref))
    np.testing.assert_array_equal(np.asarray(lens_p), np.asarray(lens_ref))
    assert int(lens_p[0]) == 1 and int(toks_p[0, 0]) == lm.cfg.semantic_eos
    assert (np.asarray(toks_p)[0, 1:] == lm.cfg.semantic_pad).all()


# ---------------------------------------------------------------------------
# VMEM capacity gate: computed byte accounting, tested at the boundary
# ---------------------------------------------------------------------------

from latent_diffusion_speech_tpu.ops.pallas.ar_decode import (  # noqa: E402
    DECODE_VMEM_BUDGET_BYTES,
    decode_vmem_bytes,
)


def _flagship_cfg():
    enc = RoformerConfig().encoder.__class__()
    dec = RoformerConfig().encoder.__class__(num_hidden_layers=1)
    return RoformerConfig(encoder=enc, decoder=dec)


def test_vmem_accounting_anchors_to_measured_boundary():
    """Round-2 measurement on v5e: flagship bf16 B=8 x 430 tok x L=48
    compiles; B=16 is rejected by Mosaic (scoped allocation > 16 MiB).
    The byte accounting must reproduce both sides."""
    cfg = _flagship_cfg()
    fits = decode_vmem_bytes(cfg, 8, 430, 48, dtype=jnp.bfloat16)["total"]
    over = decode_vmem_bytes(cfg, 16, 430, 48, dtype=jnp.bfloat16)["total"]
    assert fits <= DECODE_VMEM_BUDGET_BYTES < over
    # the measured failure wanted >16 MiB; the accounting must agree
    assert over > 16 * 2**20


def test_vmem_gate_boundary_selection():
    """A just-over-budget request must select the scan fallback; just-under
    must keep the kernel.  Scans batch at the flagship serve geometry."""
    cfg = _flagship_cfg()
    lm = RoformerSystem.__new__(RoformerSystem)  # selection logic only
    lm.cfg = cfg
    from latent_diffusion_speech_tpu.models.lm.roformer import Roformer

    lm.module = Roformer(cfg, dtype=jnp.bfloat16)

    fits = [b for b in range(1, 33) if lm._decode_fits_vmem(b, 430, 48)]
    assert fits, "flagship B=1 must fit"
    bmax = max(fits)
    assert fits == list(range(1, bmax + 1)), "gate must be monotone in batch"
    assert 8 <= bmax < 16, "anchor: B=8 fits, B=16 does not"
    assert not lm._decode_fits_vmem(bmax + 1, 430, 48)
    # a wider decoder (the VERDICT's 'config change could OOM VMEM' case)
    wide = RoformerConfig(
        encoder=cfg.encoder,
        decoder=cfg.decoder.__class__(
            hidden_size=1024, num_attention_heads=16, num_hidden_layers=4,
            intermediate_size=4096,
        ),
    )
    lm.cfg = wide
    lm.module = Roformer(wide, dtype=jnp.bfloat16)
    assert not lm._decode_fits_vmem(8, 430, 48)


def test_vmem_accounting_exact_for_tiny_geometry():
    """Hand-computed total for a tiny f32 geometry (every term verifiable
    by eye) — guards the accounting against silent drift from the kernel's
    operand construction."""
    enc = RoformerConfig().encoder.__class__(
        hidden_size=64, num_attention_heads=4, num_hidden_layers=2,
        intermediate_size=128,
    )
    dec = RoformerConfig().encoder.__class__(
        hidden_size=64, num_attention_heads=4, num_hidden_layers=1,
        intermediate_size=128,
    )
    cfg = RoformerConfig(encoder=enc, decoder=dec, semantic_kmeans_num=300)
    V = cfg.semantic_vocab_size  # 303
    assert V == 303
    s = decode_vmem_bytes(cfg, 2, 20, 11, dtype=jnp.float32)
    C, H, I, Vp, Vr, Nr, B, L = 64, 4, 128, 384, 304, 24, 2, 11
    assert s["emb_eff"] == Vr * C * 4
    assert s["embT"] == C * Vp * 4
    assert s["rotary_tables"] == 2 * Nr * C * 4
    assert s["cross_kv"] == 2 * 1 * B * L * C * 4
    assert s["kv_cache_scratch"] == 2 * 1 * B * Nr * C * 4
    assert s["repetition_scratch"] == B * Vp * 4
    assert s["layer_ffn"] == (C * I + I + I * C + C) * 4
    assert s["total"] == sum(v for k, v in s.items() if k != "total")
