"""Preemption-safe training (train/signals.py): SIGTERM during the epoch
loop checkpoints once and returns cleanly — capability the reference lacks
(a preempted run there loses everything since the last interval save)."""

import dataclasses
import os
import signal
import threading

import numpy as np
import pytest

from latent_diffusion_speech_tpu.config import Config
from latent_diffusion_speech_tpu.data.lm_dataset import collate_llama_batch
from latent_diffusion_speech_tpu.train.checkpoint import latest_checkpoint_step
from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer
from latent_diffusion_speech_tpu.train.signals import GracefulShutdown


def _tiny_cfg(tmp_path):
    cfg = Config()
    m = dataclasses.replace(
        cfg.text2semantic.model, type="llama", semantic_kmeans_num=16,
        decoder=dataclasses.replace(
            cfg.text2semantic.model.decoder,
            hidden_size=16, num_attention_heads=2, num_hidden_layers=1,
            intermediate_size=32,
        ),
    )
    train = dataclasses.replace(
        cfg.text2semantic.train, batch_size=2, gradient_accumulation_steps=1,
        expdir=str(tmp_path), interval_val=10_000, interval_log=10_000, epochs=1000,
    )
    return dataclasses.replace(
        cfg, text2semantic=dataclasses.replace(cfg.text2semantic, model=m, train=train)
    )


def _batches(lm_cfg, rng, n):
    items = []
    for _ in range(2):
        phones = rng.integers(1, 40, 5).astype(np.int32)
        sem = np.concatenate([[16], rng.integers(0, 16, 6), [17]]).astype(np.int32)
        items.append({"phone": phones, "tone": np.zeros_like(phones), "semantic": sem,
                      "spk_id": np.ones_like(phones)})
    batch = collate_llama_batch(
        items, token_shift=lm_cfg.token_shift, phone_bos=lm_cfg.phone_bos,
        phone_eos=lm_cfg.phone_eos, pad_id=lm_cfg.pad_token_id, pad_multiple=8,
    )
    return [batch] * n


def test_flag_checkpoint_and_exit(rng, tmp_path):
    """The loop exits at the next step after the flag is set, saving once."""
    cfg = _tiny_cfg(tmp_path)
    trainer = LMTrainer(cfg)
    stop = GracefulShutdown(signals=())

    batches = _batches(trainer.lm_cfg, rng, n=10_000)

    def trip_after_3():
        while trainer.step < 3:
            pass
        stop.request()

    t = threading.Thread(target=trip_after_3)
    t.start()
    trainer.train(batches, shutdown=stop)
    t.join()
    assert trainer.step < 10_000  # exited early, not by exhausting the loader
    assert latest_checkpoint_step(cfg.text2semantic.train.expdir) == trainer.step

    fresh = LMTrainer(cfg)
    assert fresh.resume() and fresh.step == trainer.step


def test_real_sigterm_from_main_thread(rng, tmp_path):
    """A real SIGTERM delivered to the process sets the flag via the handler
    and the previous handler is restored afterwards."""
    cfg = _tiny_cfg(tmp_path)
    trainer = LMTrainer(cfg)
    prev = signal.getsignal(signal.SIGTERM)

    batches = _batches(trainer.lm_cfg, rng, n=10_000)

    class Killer:
        """Iterable wrapper that delivers SIGTERM after a few steps."""
        def __iter__(self):
            for i, b in enumerate(batches):
                if i == 3:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

    trainer.train(Killer())
    assert 0 < trainer.step < 10_000
    assert latest_checkpoint_step(cfg.text2semantic.train.expdir) == trainer.step
    assert signal.getsignal(signal.SIGTERM) is prev  # handler restored


def test_handler_noop_off_main_thread(tmp_path):
    """Entering GracefulShutdown off the main thread must not try to install
    handlers (signal.signal would raise); request() still works."""
    errs = []

    def run():
        try:
            with GracefulShutdown() as stop:
                assert not stop.requested
                stop.request()
                assert stop.requested
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert not errs
