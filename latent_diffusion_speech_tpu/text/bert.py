"""BERT-derived text features / tokens (the reference's 'text' LM mode inputs).

Parity surface:
* `get_bert_feature(norm_text, word2ph)` — phone-level features: per-token
  hidden_states[-3] rows repeated word2ph[i] times, transposed to
  (dim, sum(word2ph)) (reference `text/chinese_bert.py:6-23`,
  `multi_language_bert.py:6-23`).
* `get_bert_token(text)` — tokenizer (ids, tokens) for 'text'-mode LM
  training (`text/chinese_bert.py:24-26`).

Both run natively: tokenization through the vendored WordPiece implementation
(`text/wordpiece.py`, needs only a local vocab.txt) and features through the
flax BERT/MegatronBert encoder (`models/bert.py`, torch only at weight-import
time).  Without local weights, features fall back to the EN-style zero mock
(`text/english_bert_mock.py:4-5`); without a vocab file, `get_bert_token`
raises with guidance.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["get_bert_feature", "get_bert_token", "mock_bert_feature", "NativeBertFeatures"]


def mock_bert_feature(word2ph: List[int], dim: int = 1024) -> np.ndarray:
    """Zero features shaped (dim, sum(word2ph)) (ref english_bert_mock.py:4-5)."""
    return np.zeros((dim, int(np.sum(word2ph))), np.float32)


def _find_torch_checkpoint(cache_dir: Optional[str]) -> Optional[Path]:
    if not cache_dir or not Path(cache_dir).exists():
        return None
    for pattern in ("*.safetensors", "pytorch_model*.bin"):
        hits = sorted(Path(cache_dir).rglob(pattern))
        if hits:
            return hits[0]
    return None


class NativeBertFeatures:
    """Flax BERT feature extractor bound to local weights (or an injected HF
    torch model, for tests)."""

    def __init__(self, hf_model=None, cache_dir: Optional[str] = "pretrain", dtype=None):
        import jax
        import jax.numpy as jnp

        from latent_diffusion_speech_tpu.models.bert import (
            BertConfig,
            BertEncoderModel,
            bert_params_from_torch,
        )

        if hf_model is None:
            ckpt = _find_torch_checkpoint(cache_dir)
            if ckpt is None:
                raise FileNotFoundError(f"no local BERT checkpoint under {cache_dir!r}")
            from transformers import AutoModel

            hf_model = AutoModel.from_pretrained(ckpt.parent, local_files_only=True)
        self.cfg = BertConfig.from_hf(hf_model.config)
        self.model = BertEncoderModel(self.cfg, dtype=dtype or jnp.float32)
        params = bert_params_from_torch(hf_model.state_dict(), self.cfg)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._apply = jax.jit(
            lambda p, ids: self.model.apply({"params": p}, ids)[-3]
        )

    def features(self, token_ids: np.ndarray) -> np.ndarray:
        """(T,) ids -> hidden_states[-3][0] as (T, hidden)."""
        import jax.numpy as jnp

        return np.asarray(self._apply(self.params, jnp.asarray(token_ids)[None])[0])


def get_bert_token(
    text: str, vocab_file=None, cache_dir: Optional[str] = "pretrain", tokenizer=None
) -> Tuple[np.ndarray, List[str]]:
    """Tokenizer (ids, tokens) for 'text'-mode LM inputs (ref chinese_bert.py:24-26).
    Native WordPiece over a local vocab.txt — no HF tokenizer needed."""
    from latent_diffusion_speech_tpu.text.wordpiece import WordPieceTokenizer, find_vocab_file

    if tokenizer is None:
        vocab = Path(vocab_file) if vocab_file else find_vocab_file(cache_dir)
        if vocab is None:
            raise FileNotFoundError(
                "text-mode tokenization needs a BERT vocab.txt: set LDS_BERT_VOCAB, "
                f"pass vocab_file=, or place one under {cache_dir!r}"
            )
        tokenizer = WordPieceTokenizer(vocab)
    ids, tokens = tokenizer.encode(text)
    return np.asarray(ids, np.int64), tokens


def get_bert_feature(
    norm_text: str,
    word2ph: List[int],
    vocab_file=None,
    cache_dir: Optional[str] = "pretrain",
    extractor: Optional[NativeBertFeatures] = None,
    tokenizer=None,
) -> np.ndarray:
    """Phone-level BERT hidden states (ref chinese_bert.py:6-23): tokenize the
    normalized text, take hidden_states[-3], repeat row i word2ph[i] times,
    return (dim, sum(word2ph)).  Falls back to the zero mock when no local
    weights exist (offline environments)."""
    try:
        ids, _ = get_bert_token(norm_text, vocab_file=vocab_file, cache_dir=cache_dir,
                                tokenizer=tokenizer)
        ex = extractor if extractor is not None else NativeBertFeatures(cache_dir=cache_dir)
        feats = ex.features(ids)
    except Exception:
        return mock_bert_feature(word2ph)

    assert len(word2ph) == feats.shape[0], (len(word2ph), feats.shape)
    phone_level = np.concatenate(
        [np.tile(feats[i][None], (n, 1)) for i, n in enumerate(word2ph)], axis=0
    )
    return phone_level.T
