"""BERT-derived text features / tokens (the reference's 'text' LM mode inputs).

Parity surface:
* `get_bert_feature(norm_text, word2ph)` — phone-level features repeated per
  word2ph (reference `text/chinese_bert.py:6-23`, `multi_language_bert.py`).
  The real path needs a pretrained BERT (Erlangshen-MegatronBert-1.3B /
  bert-base-multilingual-cased); in environments without those weights the
  EN-style zero-feature mock (`text/english_bert_mock.py:4-5`) is used.
* `get_bert_token(text)` — tokenizer ids for 'text'-mode LM training
  (`text/chinese_bert.py:24-26`); requires the HF tokenizer.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

__all__ = ["get_bert_feature", "get_bert_token", "mock_bert_feature"]

_DEFAULT_MODEL = "bert-base-multilingual-cased"


def mock_bert_feature(word2ph: List[int], dim: int = 1024) -> np.ndarray:
    """Zero features shaped (dim, sum(word2ph)) (ref english_bert_mock.py:4-5)."""
    return np.zeros((dim, int(np.sum(word2ph))), np.float32)


def get_bert_feature(
    norm_text: str, word2ph: List[int], model_name: str = _DEFAULT_MODEL,
    cache_dir: Optional[str] = "pretrain",
) -> np.ndarray:
    """Phone-level BERT hidden states: per-token features repeated word2ph[i]
    times (ref chinese_bert.py:6-23). Falls back to the zero mock when the
    pretrained model is unavailable (offline environments)."""
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_name, cache_dir=cache_dir, local_files_only=True)
        model = AutoModel.from_pretrained(model_name, cache_dir=cache_dir, local_files_only=True)
        with torch.no_grad():
            inputs = tokenizer(norm_text, return_tensors="pt")
            hidden = model(**inputs, output_hidden_states=True).hidden_states
            feats = torch.cat(hidden[-3:-2], -1)[0].cpu().numpy()
    except Exception:
        return mock_bert_feature(word2ph)

    assert len(word2ph) == feats.shape[0], (len(word2ph), feats.shape)
    phone_level = np.concatenate(
        [np.tile(feats[i][None], (n, 1)) for i, n in enumerate(word2ph)], axis=0
    )
    return phone_level.T


def get_bert_token(
    text: str, model_name: str = _DEFAULT_MODEL, cache_dir: Optional[str] = "pretrain"
) -> Tuple[np.ndarray, str]:
    """Tokenizer ids for 'text'-mode LM inputs (ref chinese_bert.py:24-26)."""
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_name, cache_dir=cache_dir, local_files_only=True)
    ids = tokenizer(text)["input_ids"]
    return np.asarray(ids, np.int64), text
