"""End-to-end Llama LM training path: collate -> trainer -> generate.

The reference ships `text2semantic/llama/dataloader.py` but its dispatcher
raises for type != roformer (`text2semantic/utils.py:4-9`); this framework
wires the llama type fully: `collate_llama_batch`, LMTrainer dispatch on
`cfg.text2semantic.model.type`, and TTSPipeline-compatible generate.
"""

import dataclasses

import jax
import numpy as np
import pytest

from latent_diffusion_speech_tpu.config import Config
from latent_diffusion_speech_tpu.data.lm_dataset import collate_llama_batch
from latent_diffusion_speech_tpu.models.lm import LlamaConfig, LlamaSystem
from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer, llama_config_from


def _tiny_cfg(tmp_path=None, **train_over):
    cfg = Config()
    m = dataclasses.replace(
        cfg.text2semantic.model,
        type="llama",
        semantic_kmeans_num=32,
        decoder=dataclasses.replace(
            cfg.text2semantic.model.decoder,
            hidden_size=32, num_attention_heads=4, num_hidden_layers=2,
            intermediate_size=64,
        ),
    )
    train = dataclasses.replace(
        cfg.text2semantic.train,
        batch_size=2, gradient_accumulation_steps=1, warm_up_steps=2,
        **({"expdir": str(tmp_path)} if tmp_path else {}),
        **train_over,
    )
    t2s = dataclasses.replace(cfg.text2semantic, model=m, train=train)
    return dataclasses.replace(cfg, text2semantic=t2s)


def _items(rng, lm_cfg, n=4):
    K = lm_cfg.semantic_kmeans_num
    out = []
    for i in range(n):
        phones = rng.integers(1, 40, size=rng.integers(3, 8)).astype(np.int32)
        sem = rng.integers(0, K, size=rng.integers(4, 10)).astype(np.int32)
        wrapped = np.concatenate([[K], sem, [K + 1]]).astype(np.int32)
        out.append({"phone": phones, "tone": np.zeros_like(phones), "semantic": wrapped,
                    "spk_id": np.ones_like(phones)})
    return out


def _collate(items, lm_cfg):
    return collate_llama_batch(
        items, token_shift=lm_cfg.token_shift, phone_bos=lm_cfg.phone_bos,
        phone_eos=lm_cfg.phone_eos, pad_id=lm_cfg.pad_token_id, pad_multiple=8,
    )


def test_collate_layout(rng):
    lm_cfg = LlamaConfig(semantic_kmeans_num=32)
    items = _items(rng, lm_cfg, n=3)
    batch = _collate(items, lm_cfg)
    assert set(batch) == {"input_ids", "labels", "attention_mask"}
    for i, it in enumerate(items):
        n_ph, n_sem = len(it["phone"]), len(it["semantic"])
        row = batch["input_ids"][i]
        L = 1 + n_ph + 1 + n_sem
        assert row[0] == lm_cfg.phone_bos
        np.testing.assert_array_equal(row[1 : 1 + n_ph], it["phone"])
        assert row[1 + n_ph] == lm_cfg.phone_eos
        # wrapped semantic shifts onto llama's semantic BOS/EOS ids
        assert row[2 + n_ph] == lm_cfg.bos_token_id
        assert row[L - 1] == lm_cfg.eos_token_id
        assert (row[L:] == lm_cfg.pad_token_id).all()
        np.testing.assert_array_equal(batch["labels"][i][:L], row[:L])
        assert (batch["labels"][i][L:] == -100).all()
        assert batch["attention_mask"][i][:L].all() and not batch["attention_mask"][i][L:].any()


def test_trainer_dispatch_and_descent(rng, tmp_path):
    cfg = _tiny_cfg(tmp_path)
    trainer = LMTrainer(cfg)
    assert trainer.lm_type == "llama"
    assert isinstance(trainer.system, LlamaSystem)

    lm_cfg = trainer.lm_cfg
    batch = _collate(_items(rng, lm_cfg, n=4), lm_cfg)
    batch = trainer.device_put_batch(batch)
    losses = [float(trainer.train_step(batch)["loss"]) for _ in range(25)]
    assert np.isfinite(losses).all()
    assert min(losses[-5:]) < losses[0], losses[:3] + losses[-3:]

    metrics = trainer.evaluate(batch)
    assert np.isfinite(metrics["val/loss"]) and 0.0 <= metrics["val/top5_acc"] <= 1.0


def test_checkpoint_roundtrip(rng, tmp_path):
    cfg = _tiny_cfg(tmp_path)
    trainer = LMTrainer(cfg)
    batch = trainer.device_put_batch(_collate(_items(rng, trainer.lm_cfg, n=2), trainer.lm_cfg))
    trainer.train_step(batch)
    trainer.save()

    fresh = LMTrainer(cfg)
    assert fresh.resume()
    assert fresh.step == trainer.step
    a = jax.tree_util.tree_leaves(trainer.system.params)[0]
    b = jax.tree_util.tree_leaves(fresh.system.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_generate_pipeline_interface(rng):
    """generate() accepts the RoformerSystem kwargs TTSPipeline passes."""
    lm = LlamaSystem(LlamaConfig(semantic_kmeans_num=32, hidden_size=32,
                                 num_attention_heads=4, num_hidden_layers=1,
                                 intermediate_size=64), seed=0)
    phones = np.asarray(rng.integers(1, 40, (1, 5)), np.int32)
    tones = np.zeros_like(phones)
    toks, lens = lm.generate(
        phones, tones, spk_id=1, max_length=8, do_sample=False,
        rng=jax.random.PRNGKey(0), impl="scan",
    )
    assert toks.shape[0] == 1 and int(lens[0]) <= 8
    n = int(lens[0])
    got = np.asarray(toks)[0, :n]
    assert ((got >= 0) & (got < 32 + 2)).all()  # unshifted semantic space (+eos)


def test_llama_config_from_config():
    cfg = _tiny_cfg()
    lm_cfg = llama_config_from(cfg)
    assert lm_cfg.hidden_size == 32 and lm_cfg.num_hidden_layers == 2
    assert lm_cfg.semantic_kmeans_num == 32
