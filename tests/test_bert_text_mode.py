"""'text'-mode LM path: native WordPiece tokenizer, flax BERT features,
RoFormer text-vocab mode, and the stage-16 text-mode preprocessor.

Reference surface: text/chinese_bert.py (get_bert_token/get_bert_feature),
16_preprocess_train_tts.py:37-39, roformer.py:74-88 (VERDICT round-1
"What's missing" item 1)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] "
    "你 好 今 天 气 真 世 界 的 我 们 一 起 去 公 园 "
    "hello world un ##aff ##able play ##ing , . ! ?"
).split()


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("bert") / "vocab.txt"
    p.write_text("\n".join(VOCAB), encoding="utf-8")
    return p


class TestWordPiece:
    def test_matches_hf_bert_tokenizer(self, vocab_file):
        from transformers import BertTokenizer

        from latent_diffusion_speech_tpu.text.wordpiece import WordPieceTokenizer

        hf = BertTokenizer(str(vocab_file), do_lower_case=True)
        mine = WordPieceTokenizer(vocab_file)
        for text in [
            "你好世界",
            "hello world!",
            "unaffable playing, 今天天气真好.",
            "UNAFFABLE Hello 你好",
            "xyzzy 你好",  # oov word -> [UNK]
        ]:
            ref = hf(text)["input_ids"]
            ids, tokens = mine.encode(text)
            assert list(ids) == list(ref), (text, tokens, hf.convert_ids_to_tokens(ref))

    def test_special_ids(self, vocab_file):
        from latent_diffusion_speech_tpu.text.wordpiece import WordPieceTokenizer

        t = WordPieceTokenizer(vocab_file)
        assert (t.cls_token_id, t.sep_token_id, t.pad_token_id) == (2, 3, 0)
        assert t.vocab_size == len(VOCAB)


def small_hf_bert(model_type="bert", seed=0):
    torch.manual_seed(seed)
    if model_type == "bert":
        from transformers import BertConfig as HFConfig
        from transformers import BertModel as HFModel
    else:
        from transformers import MegatronBertConfig as HFConfig
        from transformers import MegatronBertModel as HFModel
    cfg = HFConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=32, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = HFModel(cfg, add_pooling_layer=False).eval()
    return model, cfg


class TestBertEncoderParity:
    @pytest.mark.parametrize("model_type", ["bert", "megatron"])
    def test_hidden_states_match_hf(self, model_type, rng):
        from latent_diffusion_speech_tpu.models.bert import (
            BertConfig,
            BertEncoderModel,
            bert_params_from_torch,
        )

        hf, hf_cfg = small_hf_bert(model_type)
        cfg = BertConfig.from_hf(hf_cfg)
        assert cfg.pre_ln == (model_type == "megatron")
        params = bert_params_from_torch(hf.state_dict(), cfg)
        model = BertEncoderModel(cfg)

        ids = rng.integers(0, 64, (2, 11))
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(ids), output_hidden_states=True).hidden_states
        got = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                          jnp.asarray(ids))
        assert len(got) == len(ref)
        for j in (-3, -1, 0):
            np.testing.assert_allclose(
                np.asarray(got[j]), ref[j].numpy(), rtol=2e-4, atol=2e-5,
                err_msg=f"{model_type} hidden_states[{j}]",
            )


class TestGetBertFeature:
    def test_phone_level_repeat_matches_reference_formula(self, vocab_file, rng):
        """get_bert_feature == hidden_states[-3] rows repeated per word2ph,
        transposed — computed against the HF torch oracle."""
        from transformers import BertTokenizer

        from latent_diffusion_speech_tpu.text.bert import NativeBertFeatures, get_bert_feature
        from latent_diffusion_speech_tpu.text.wordpiece import WordPieceTokenizer

        hf, _ = small_hf_bert("bert", seed=1)
        text = "你好世界"
        tok = WordPieceTokenizer(vocab_file)
        ids, _ = tok.encode(text)
        word2ph = [1] + [2] * len(text) + [1]  # CLS + chars + SEP (ref contract)

        feats = get_bert_feature(
            text, word2ph, tokenizer=tok, extractor=NativeBertFeatures(hf_model=hf)
        )
        hf_tok = BertTokenizer(str(vocab_file))
        with torch.no_grad():
            res = hf(
                input_ids=torch.tensor([hf_tok(text)["input_ids"]]),
                output_hidden_states=True,
            ).hidden_states[-3][0]
        want = torch.cat(
            [res[i].repeat(n, 1) for i, n in enumerate(word2ph)], dim=0
        ).T.numpy()
        assert feats.shape == want.shape
        np.testing.assert_allclose(feats, want, rtol=2e-4, atol=2e-5)

    def test_mock_fallback_without_weights(self):
        from latent_diffusion_speech_tpu.text.bert import get_bert_feature

        out = get_bert_feature("你好", [1, 2, 2, 1], cache_dir="/nonexistent")
        assert out.shape == (1024, 6) and not out.any()


class TestRoformerTextMode:
    def test_text_mode_loss_and_generate(self, vocab_file, rng):
        from latent_diffusion_speech_tpu.models.lm.roformer import (
            RoformerConfig,
            RoformerSystem,
            StackConfig,
        )
        from latent_diffusion_speech_tpu.text.bert import get_bert_token

        small = StackConfig(hidden_size=16, num_attention_heads=2, num_hidden_layers=1,
                            intermediate_size=16, hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0)
        cfg = RoformerConfig(encoder=small, decoder=small, mode="text",
                             text_vocab_size=len(VOCAB), semantic_kmeans_num=16, n_spk=2)
        assert cfg.phone_vocab_size == len(VOCAB)
        assert cfg.num_token_types == 1
        lm = RoformerSystem(cfg)

        ids, _ = get_bert_token("你好世界", vocab_file=vocab_file)
        phone = jnp.asarray(ids[None], jnp.int32)
        tone = jnp.zeros_like(phone)
        sem = jnp.asarray(rng.integers(0, 16, (1, 7)), jnp.int32)
        labels = jnp.concatenate([sem, jnp.full((1, 1), -100)], axis=1)
        sem_in = jnp.concatenate([jnp.full((1, 1), cfg.semantic_bos), sem], axis=1)
        loss = lm.loss(lm.params, phone, tone, sem_in, labels)
        assert np.isfinite(float(loss))

        toks, lengths = lm.generate(phone, tone, max_length=12, rng=jax.random.PRNGKey(0))
        assert toks.shape == (1, 12) and int(lengths[0]) <= 12

    def test_preprocess_tts_text_mode(self, vocab_file, tmp_path, monkeypatch):
        """Stage 16 in 'text' mode writes (ids, [], [], []) npy tuples
        (ref 16_preprocess_train_tts.py:37-41)."""
        monkeypatch.setenv("LDS_BERT_VOCAB", str(vocab_file))
        from latent_diffusion_speech_tpu.cli.preprocess_tts import process_tts

        spk = tmp_path / "audio" / "1"
        spk.mkdir(parents=True)
        (spk / "0.wav").write_bytes(b"")
        (spk / "utt_text.txt").write_text("0|你好世界", encoding="utf-8")
        results = list(process_tts(tmp_path, mode="text"))
        assert len(results) == 1
        arr = np.load(tmp_path / "utt" / "1" / "0.wav.npy", allow_pickle=True)
        ids, tones, langs, word2ph = arr
        assert ids[0] == 2 and ids[-1] == 3  # CLS ... SEP
        assert len(tones) == len(langs) == len(word2ph) == 0
