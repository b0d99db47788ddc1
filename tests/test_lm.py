"""LM tests: RoFormer/Llama parity vs HF implementations (same weights),
scan-generation behavior, loss masking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.lm import (
    Llama,
    LlamaConfig,
    LlamaSystem,
    Roformer,
    RoformerConfig,
    RoformerSystem,
    SamplingConfig,
)
from latent_diffusion_speech_tpu.models.lm.import_hf import (
    llama_params_from_torch,
    roformer_params_from_torch,
)
from latent_diffusion_speech_tpu.models.lm.roformer import StackConfig
from latent_diffusion_speech_tpu.models.lm.sampling import process_logits
from latent_diffusion_speech_tpu.text.symbols import symbols

torch = pytest.importorskip("torch")

TINY = RoformerConfig(
    encoder=StackConfig(hidden_size=32, num_attention_heads=4, num_hidden_layers=2, intermediate_size=64),
    decoder=StackConfig(hidden_size=32, num_attention_heads=4, num_hidden_layers=1, intermediate_size=64),
    semantic_kmeans_num=64,
    n_spk=4,
)


def _build_hf_roformer(cfg):
    """Assemble the reference Roformer module from HF parts (roformer.py:59-133),
    phone mode, no flash-attn, no external downloads."""
    from transformers import RoFormerConfig as HFConfig
    from transformers import RoFormerForCausalLM, RoFormerModel
    import torch.nn as tnn

    def hfc(stack, is_decoder):
        return HFConfig(
            hidden_size=stack.hidden_size,
            num_attention_heads=stack.num_attention_heads,
            num_hidden_layers=stack.num_hidden_layers,
            intermediate_size=stack.intermediate_size,
            hidden_act="gelu",
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            max_position_embeddings=stack.max_position_embeddings,
            is_decoder=is_decoder,
        )

    enc_cfg = hfc(cfg.encoder, False)
    enc_cfg.vocab_size = cfg.phone_vocab_size
    enc_cfg.type_vocab_size = cfg.num_token_types
    dec_cfg = hfc(cfg.decoder, True)
    dec_cfg.vocab_size = cfg.semantic_vocab_size
    dec_cfg.type_vocab_size = 1
    dec_cfg.add_cross_attention = True

    class Ref(tnn.Module):
        def __init__(self):
            super().__init__()
            self.text_encoder = RoFormerModel(enc_cfg)
            self.semantic_decoder = RoFormerForCausalLM(dec_cfg)
            self.spk_emb = tnn.Embedding(cfg.n_spk + 1, enc_cfg.hidden_size)

        def forward(self, phone, tone, semantic, spk_id=None):
            spk = self.spk_emb(spk_id) if spk_id is not None else 0
            emb = self.text_encoder.embeddings(phone, tone) + spk
            enc = self.text_encoder(inputs_embeds=emb).last_hidden_state
            return self.semantic_decoder(semantic, encoder_hidden_states=enc).logits

    return Ref().eval()


class TestRoformerParity:
    def test_teacher_forced_logits_match_hf(self, rng):
        ref = _build_hf_roformer(TINY)
        params = roformer_params_from_torch(ref.state_dict(), TINY)

        B, L, S = 2, 7, 5
        phone = rng.integers(0, len(symbols), (B, L))
        tone = rng.integers(0, 6, (B, L))
        semantic = rng.integers(0, 64, (B, S))
        spk = rng.integers(0, 4, (B, L))

        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(phone), torch.from_numpy(tone),
                torch.from_numpy(semantic), torch.from_numpy(spk),
            ).numpy()

        module = Roformer(TINY)
        mine = module.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(phone), jnp.asarray(tone), jnp.asarray(semantic), jnp.asarray(spk),
        )
        assert mine.shape == ref_logits.shape
        np.testing.assert_allclose(np.asarray(mine), ref_logits, atol=2e-4, rtol=1e-3)

    def test_incremental_decode_matches_teacher_forced(self, rng):
        """KV-cache step decoding must reproduce full-sequence causal logits."""
        sys_ = RoformerSystem(TINY)
        B, L, S = 1, 6, 4
        phone = jnp.asarray(rng.integers(0, 50, (B, L)))
        tone = jnp.asarray(rng.integers(0, 6, (B, L)))
        semantic = jnp.asarray(rng.integers(0, 64, (B, S)))

        full = sys_.module.apply({"params": sys_.params}, phone, tone, semantic)

        enc = sys_.module.apply({"params": sys_.params}, phone, tone, method=sys_.module.encode)
        caches = sys_.module.apply({"params": sys_.params}, B, S, method=sys_.module.init_cache)
        step_logits = []
        for pos in range(S):
            logits, caches = sys_.module.apply(
                {"params": sys_.params}, semantic[:, pos], pos, caches, enc,
                method=sys_.module.decode_step,
            )
            step_logits.append(np.asarray(logits))
        np.testing.assert_allclose(
            np.stack(step_logits, axis=1), np.asarray(full), atol=2e-5
        )


class TestRoformerGenerate:
    def test_generate_shapes_and_pad_after_eos(self, rng):
        sys_ = RoformerSystem(TINY)
        phone = jnp.asarray(rng.integers(0, 50, (2, 6)))
        tone = jnp.asarray(rng.integers(0, 6, (2, 6)))
        tokens, lengths = sys_.generate(phone, tone, max_length=12, rng=jax.random.PRNGKey(0))
        assert tokens.shape == (2, 12)
        for b in range(2):
            n = int(lengths[b])
            if n < 12:
                # after EOS only PAD
                assert int(tokens[b, n - 1]) == TINY.semantic_eos
                assert np.all(np.asarray(tokens[b, n:]) == TINY.semantic_pad)

    def test_end_gate_forces_eos(self):
        cfg = SamplingConfig(eos_token_id=2, end_gate_threshold=0.1, do_sample=False,
                             repetition_penalty=1.0, top_k=0, top_p=1.0)
        logits = jnp.asarray([[0.0, 0.0, 5.0, 0.0]])  # p(EOS) >> 0.1
        mask = jnp.zeros((1, 4), bool)
        out = process_logits(logits, mask, cfg)
        assert int(jnp.argmax(out)) == 2
        assert not bool(jnp.isfinite(out[0, 0]))

    def test_repetition_penalty_applies_to_generated(self):
        cfg = SamplingConfig(repetition_penalty=2.0, do_sample=False, top_k=0, top_p=1.0,
                             eos_token_id=0)
        logits = jnp.asarray([[2.0, 2.0]])
        mask = jnp.asarray([[True, False]])
        out = process_logits(logits, mask, cfg)
        assert float(out[0, 0]) == 1.0 and float(out[0, 1]) == 2.0

    def test_top_k_vals_matches_lax_top_k(self, rng):
        """The sort-free (max, mask) extraction == lax.top_k values
        (lax.top_k lowers to a full-vocab sort on TPU; see sampling.py)."""
        from latent_diffusion_speech_tpu.models.lm.sampling import _top_k_vals

        logits = jnp.asarray(rng.standard_normal((4, 4099)).astype(np.float32))
        for k in (1, 5, 16):
            ref = jax.lax.top_k(logits, k)[0]
            np.testing.assert_array_equal(np.asarray(_top_k_vals(logits, k)),
                                          np.asarray(ref))
        # -inf-heavy rows (post-repetition-penalty shape) still work
        masked = logits.at[:, 10:].set(-jnp.inf)
        np.testing.assert_array_equal(
            np.asarray(_top_k_vals(masked, 5)), np.asarray(jax.lax.top_k(masked, 5)[0])
        )


class TestLlamaParity:
    def test_logits_match_hf(self, rng):
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM

        cfg = LlamaConfig(hidden_size=32, num_attention_heads=4, num_hidden_layers=2,
                          intermediate_size=48, semantic_kmeans_num=32)
        hf_cfg = HFLlamaConfig(
            hidden_size=32, num_attention_heads=4, num_hidden_layers=2,
            intermediate_size=48, vocab_size=cfg.vocab_size, num_key_value_heads=4,
        )
        ref = LlamaForCausalLM(hf_cfg).eval()
        params = llama_params_from_torch(ref.state_dict(), cfg)

        ids = rng.integers(0, cfg.vocab_size, (2, 9))
        with torch.no_grad():
            ref_logits = ref(torch.from_numpy(ids)).logits.numpy()
        mine = Llama(cfg).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(ids)
        )
        np.testing.assert_allclose(np.asarray(mine), ref_logits, atol=3e-4, rtol=1e-3)

    def test_generate_bans_text_tokens_and_unshifts(self, rng):
        cfg = LlamaConfig(hidden_size=16, num_attention_heads=2, num_hidden_layers=1,
                          intermediate_size=24, semantic_kmeans_num=16)
        sys_ = LlamaSystem(cfg)
        phone = jnp.asarray(rng.integers(0, 20, (1, 5)))
        tokens, lengths = sys_.generate(phone, max_length=8, rng=jax.random.PRNGKey(0))
        assert tokens.shape == (1, 8)
        # un-shifted tokens are in semantic space (>= 0 given text ban)
        n = int(lengths[0])
        gen = np.asarray(tokens[0, : max(n, 1)])
        assert np.all(gen >= 0)

    def test_build_input_ids_layout(self):
        cfg = LlamaConfig(hidden_size=16, num_attention_heads=2, num_hidden_layers=1,
                          intermediate_size=24, semantic_kmeans_num=16)
        sys_ = LlamaSystem(cfg)
        phone = jnp.asarray([[3, 4]])
        semantic = jnp.asarray([[7]])
        ids = np.asarray(sys_.build_input_ids(phone, semantic))[0]
        V = len(symbols)
        assert list(ids) == [V, 3, 4, V + 1, cfg.bos_token_id, V + 7, cfg.eos_token_id]


class TestLoss:
    def test_ignore_index(self, rng):
        sys_ = RoformerSystem(TINY)
        phone = jnp.asarray(rng.integers(0, 50, (1, 4)))
        tone = jnp.asarray(rng.integers(0, 6, (1, 4)))
        semantic = jnp.asarray(rng.integers(0, 64, (1, 5)))
        labels_full = semantic
        labels_masked = jnp.where(jnp.arange(5) >= 3, -100, semantic)
        l1 = sys_.loss(sys_.params, phone, tone, semantic, labels_full)
        l2 = sys_.loss(sys_.params, phone, tone, semantic, labels_masked)
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))
        assert abs(float(l1) - float(l2)) > 1e-6  # masking changes the loss
