"""Sentence segmentation (text/segment.py) + long-text TTS stitching."""

import numpy as np

from latent_diffusion_speech_tpu.infer.tts import TTSPipeline
from latent_diffusion_speech_tpu.text.segment import split_sentences


class TestSplitSentences:
    def test_splits_at_final_punctuation(self):
        out = split_sentences("今天天气真好。我们去公园。然后听音乐!", max_chars=8)
        assert out == ["今天天气真好。", "我们去公园。", "然后听音乐!"]

    def test_merges_short_sentences_within_budget(self):
        out = split_sentences("你好。再见。好的。", max_chars=60)
        assert out == ["你好。再见。好的。"]

    def test_hard_split_prefers_clause_boundary(self):
        text = "一二三,四五六七八九十一二三四五"  # no final punctuation, 16 chars
        out = split_sentences(text, max_chars=10)
        assert out[0] == "一二三,"
        assert "".join(out) == text

    def test_raw_cut_without_any_punctuation(self):
        text = "a" * 25
        out = split_sentences(text, max_chars=10)
        assert all(len(p) <= 10 for p in out)
        assert "".join(out) == text

    def test_budget_invariant_and_lossless(self):
        text = "其一。其二,内容较长一些的句子;其三!其四?ABC DEF, and more."
        for budget in (6, 12, 30, 200):
            out = split_sentences(text, max_chars=budget)
            # mergers never exceed the budget (hard-split pieces are bounded too)
            assert all(len(p) <= max(budget, 1) for p in out)
            assert "".join(out).replace("\n", "") == text

    def test_empty_and_whitespace(self):
        assert split_sentences("") == []
        assert split_sentences("\n\n") == []


class _StubPipeline:
    """Only what tts_long_text touches: vocoder sample rate + tts_batch."""

    class _V:
        vocoder_sample_rate = 8000

    vocoder = _V()
    tts = None

    def __init__(self):
        self.calls = []

    def tts_batch(self, pieces, language="ZH", spk_ids=None, **kw):
        self.calls.append((list(pieces), list(spk_ids), kw))
        # each piece -> 100 samples of its index value
        return [(np.full(100, float(i)), 8000) for i in range(len(pieces))]


class TestLongTextTTS:
    def test_batched_stitch_with_pauses(self):
        stub = _StubPipeline()
        wav, sr = TTSPipeline.tts_long_text(
            stub, "第一句。第二句。第三句。", max_chars=4, pause_ms=100,
            spk_id=3, method="ddim",
        )
        assert sr == 8000
        (pieces, spk_ids, kw) = stub.calls[0]
        assert pieces == ["第一句。", "第二句。", "第三句。"]
        assert spk_ids == [3, 3, 3]
        assert kw["method"] == "ddim"
        gap = int(8000 * 0.1)
        assert len(wav) == 3 * 100 + 2 * gap
        # piece order preserved; silence between
        assert wav[0] == 0.0 and wav[100 + gap] == 1.0 and wav[-1] == 2.0
        assert (wav[100 : 100 + gap] == 0.0).all()

    def test_empty_text(self):
        stub = _StubPipeline()
        wav, sr = TTSPipeline.tts_long_text(stub, "")
        assert wav.size == 0 and sr == 8000 and not stub.calls
