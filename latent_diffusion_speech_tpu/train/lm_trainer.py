"""LM trainer (RoFormer / Llama) with mesh data parallelism.

Re-design of the reference loop (`text2semantic/roformer/train.py:73-159`):
grad accumulation via optax.MultiSteps (reference: accelerate.accumulate),
CE with -100 ignore handled inside the model loss, NaN guard, top-k accuracy
validation (`text2semantic/utils.py:15-20`).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from latent_diffusion_speech_tpu.config import Config
from latent_diffusion_speech_tpu.models.lm import LlamaConfig, LlamaSystem, RoformerConfig, RoformerSystem
from latent_diffusion_speech_tpu.models.lm.roformer import StackConfig
from latent_diffusion_speech_tpu.parallel.mesh import build_mesh
from latent_diffusion_speech_tpu.train.checkpoint import (
    latest_checkpoint_step,
    load_checkpoint,
    load_checkpoint_meta,
    save_checkpoint,
)
from latent_diffusion_speech_tpu.train.schedule import warmup_step_decay

__all__ = ["LMTrainer", "top_k_accuracy", "roformer_config_from", "llama_config_from"]


def top_k_accuracy(logits: jnp.ndarray, labels: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """Top-k accuracy over valid (!= -100) positions (ref text2semantic/utils.py:15-20)."""
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    topk = jax.lax.top_k(logits, k)[1]
    hit = jnp.any(topk == safe[..., None], axis=-1)
    return jnp.sum(hit & valid) / jnp.maximum(jnp.sum(valid), 1)


def roformer_config_from(cfg: Config) -> RoformerConfig:
    m = cfg.text2semantic.model

    def stack(tc) -> StackConfig:
        return StackConfig(
            hidden_size=tc.hidden_size,
            num_attention_heads=tc.num_attention_heads,
            num_hidden_layers=tc.num_hidden_layers,
            intermediate_size=tc.intermediate_size,
            layer_norm_eps=tc.layer_norm_eps,
            hidden_dropout_prob=tc.hidden_dropout_prob,
            attention_probs_dropout_prob=tc.attention_probs_dropout_prob,
            max_position_embeddings=tc.max_position_embeddings,
        )

    return RoformerConfig(
        encoder=stack(m.encoder),
        decoder=stack(m.decoder),
        mode="phone",  # text mode requires an external BERT tokenizer vocab
        semantic_kmeans_num=m.semantic_kmeans_num,
        n_spk=cfg.common.n_spk,
    )


def llama_config_from(cfg: Config) -> LlamaConfig:
    """Decoder-only Llama geometry from the config's `decoder` stack (the
    reference never wires llama into its dispatcher — `text2semantic/utils.py:4-9`
    raises for it — so the stack-field mapping is this framework's contract)."""
    m = cfg.text2semantic.model
    tc = m.decoder
    return LlamaConfig(
        hidden_size=tc.hidden_size,
        num_attention_heads=tc.num_attention_heads,
        num_hidden_layers=tc.num_hidden_layers,
        intermediate_size=tc.intermediate_size,
        mode="phone",
        semantic_kmeans_num=m.semantic_kmeans_num,
        moe_experts=m.moe_experts,
        moe_top_k=m.moe_top_k,
        moe_capacity_factor=m.moe_capacity_factor,
        moe_aux_weight=m.moe_aux_weight,
    )


class LMTrainer:
    """Trains the text->semantic LM named by `cfg.text2semantic.model.type`:
    'roformer' (enc-dec, `collate_text_batch` batches) or 'llama'
    (single-stream, `collate_llama_batch` batches)."""

    def __init__(self, cfg: Config, lm_cfg=None, mesh=None,
                 codebook: Optional[np.ndarray] = None, dtype=jnp.float32):
        self.cfg = cfg
        tcfg = cfg.text2semantic.train
        self.mesh = mesh if mesh is not None else build_mesh(cfg.parallel)
        self.lm_type = cfg.text2semantic.model.type
        if self.lm_type == "llama":
            self.lm_cfg = lm_cfg or llama_config_from(cfg)
            self.system = LlamaSystem(self.lm_cfg, dtype=dtype, seed=tcfg.seed, codebook=codebook,
                                      mesh=self.mesh)
        elif self.lm_type == "roformer":
            self.lm_cfg = lm_cfg or roformer_config_from(cfg)
            self.system = RoformerSystem(self.lm_cfg, dtype=dtype, seed=tcfg.seed, codebook=codebook)
        else:
            raise ValueError(f"unknown text2semantic model type: {self.lm_type!r}")

        from latent_diffusion_speech_tpu.parallel.sharding import (
            apply_param_shardings,
            infer_param_shardings,
        )

        self.param_shardings = infer_param_shardings(self.system.params, self.mesh)
        self.system.params = apply_param_shardings(self.system.params, self.param_shardings)

        schedule = warmup_step_decay(tcfg.lr, tcfg.start_lr, tcfg.warm_up_steps, tcfg.decay_step, tcfg.gamma)
        chain = []
        if tcfg.clip_grad_norm and tcfg.clip_grad_norm > 0:
            chain.append(optax.clip_by_global_norm(tcfg.clip_grad_norm))
        chain.append(optax.adamw(schedule, weight_decay=tcfg.weight_decay))
        self.tx = optax.chain(*chain)
        if tcfg.gradient_accumulation_steps > 1:
            self.tx = optax.MultiSteps(self.tx, tcfg.gradient_accumulation_steps)
        self.opt_state = self.tx.init(self.system.params)
        self.step = 0
        # data-stream position for deterministic resume (saved as ckpt meta)
        self._epoch = 0
        self._batch_in_epoch = 0
        self._train_step = self._build_train_step()

    def _build_train_step(self):
        system = self.system
        tx = self.tx
        mesh = self.mesh
        param_shardings = self.param_shardings

        pipe_size = dict(mesh.shape).get("pipe", 1)
        seq_size = dict(mesh.shape).get("seq", 1)
        if seq_size > 1:
            # sequence-parallel training: self-attention in the loss routes
            # through exact ring attention over the mesh 'seq' axis
            # (ops/attention.sequence_parallel).  The ring has no attention-
            # probability dropout (the reference default 0.1 would need a
            # sharded-rng story); require it off explicitly rather than
            # silently falling back to unsharded attention.
            attn_drop = 0.0
            if self.lm_type == "roformer":
                attn_drop = max(
                    self.lm_cfg.encoder.attention_probs_dropout_prob,
                    self.lm_cfg.decoder.attention_probs_dropout_prob,
                )
            if attn_drop > 0:
                raise ValueError(
                    "parallel.seq > 1 requires attention_probs_dropout_prob=0 "
                    "(ring attention does not implement attention-prob "
                    "dropout; hidden dropout still applies)"
                )

        def _with_seq_parallel(fn):
            if seq_size <= 1:
                return fn

            from latent_diffusion_speech_tpu.ops.attention import sequence_parallel

            def wrapped(params, batch, dropout_rng):
                for key in ("phone", "semantic", "input_ids"):
                    if key in batch and batch[key].shape[1] % seq_size != 0:
                        raise ValueError(
                            f"seq-parallel: batch dim {key}={batch[key].shape[1]} "
                            f"not divisible by seq={seq_size}; set the collate "
                            f"pad_multiple to a multiple of parallel.seq"
                        )
                with sequence_parallel(mesh):
                    return fn(params, batch, dropout_rng)

            return wrapped

        if pipe_size > 1 and self.lm_type == "roformer":
            # enc-dec pipeline (RoformerSystem.loss_pp): layer slots are
            # kind-switched (enc/dec/identity), deterministic — require
            # dropout off rather than silently changing train semantics
            if max(
                self.lm_cfg.encoder.hidden_dropout_prob,
                self.lm_cfg.encoder.attention_probs_dropout_prob,
                self.lm_cfg.decoder.hidden_dropout_prob,
                self.lm_cfg.decoder.attention_probs_dropout_prob,
            ) > 0:
                raise ValueError(
                    "parallel.pipe > 1 with the roformer requires dropout off "
                    "(hidden_dropout_prob=attention_probs_dropout_prob=0): "
                    "the pipeline path is deterministic"
                )
            microbatches = self.cfg.parallel.pipe_microbatches
            data_size = dict(mesh.shape).get("data", 1)
            batch_axis = "data" if data_size > 1 else None

            def loss_fn(params, batch, dropout_rng):
                del dropout_rng  # deterministic pipeline path
                return system.loss_pp(
                    params, batch["phone"], batch["tone"], batch["semantic"],
                    batch["labels"], mesh, spk_id=batch.get("spk_id"),
                    encoder_attention_mask=batch.get("encoder_attention_mask"),
                    attention_mask=batch.get("attention_mask"),
                    microbatches=microbatches, batch_axis=batch_axis,
                )
        elif self.lm_type == "llama" and pipe_size > 1:
            # pipeline-parallel training path: the block stack runs
            # GPipe-microbatched over the mesh 'pipe' axis (parallel/pipeline.py)
            microbatches = self.cfg.parallel.pipe_microbatches
            data_size = dict(mesh.shape).get("data", 1)
            batch_axis = "data" if data_size > 1 else None

            def loss_fn(params, batch, dropout_rng):
                del dropout_rng  # the flax Llama stack has no dropout
                return system.loss_pp(
                    params, batch["input_ids"], batch["labels"], mesh,
                    attention_mask=batch.get("attention_mask"),
                    microbatches=microbatches, batch_axis=batch_axis,
                )
        elif self.lm_type == "llama":
            def loss_fn(params, batch, dropout_rng):
                del dropout_rng  # the flax Llama stack has no dropout
                return system.loss(
                    params, batch["input_ids"], batch["labels"],
                    attention_mask=batch.get("attention_mask"),
                )
        else:
            def loss_fn(params, batch, dropout_rng):
                return system.loss(
                    params,
                    batch["phone"],
                    batch["tone"],
                    batch["semantic"],
                    batch["labels"],
                    spk_id=batch.get("spk_id"),
                    encoder_attention_mask=batch.get("encoder_attention_mask"),
                    attention_mask=batch.get("attention_mask"),
                    dropout_rng=dropout_rng,
                )

        loss_fn = _with_seq_parallel(loss_fn)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, dropout_rng):
            def constrain(x):
                # batch over 'data'; when sequence parallelism is on, the
                # token dim is laid out over 'seq' too so the ring's
                # shard_map starts from the right layout
                seq_ax = (
                    "seq"
                    if seq_size > 1 and x.ndim >= 2 and x.shape[1] % seq_size == 0
                    else None
                )
                spec = P("data", seq_ax, *([None] * max(x.ndim - 2, 0)))[: x.ndim]
                return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

            batch = jax.tree_util.tree_map(constrain, batch)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, dropout_rng)
            grads = jax.tree_util.tree_map(
                jax.lax.with_sharding_constraint, grads, param_shardings
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, optax.global_norm(grads)

        return train_step

    def device_put_batch(self, batch: Dict[str, np.ndarray]):
        from latent_diffusion_speech_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    # NaN guard cadence: the reference checks every step (`train.py:133-134`),
    # but `float(loss)` is a device fetch — a full ~30 ms sync through a
    # tunneled TPU — so the guard runs every N steps (a NaN still raises
    # within N steps of appearing; the async step stream stays unbroken)
    nan_check_interval: int = 50

    def train_step(self, batch) -> Dict[str, float]:
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(self.cfg.text2semantic.train.seed), self.step)
        params, opt_state, loss, gnorm = self._train_step(
            self.system.params, self.opt_state, batch, dropout_rng
        )
        if self.step % self.nan_check_interval == 0 and not np.isfinite(float(loss)):
            raise RuntimeError(f"NaN/Inf LM loss at step {self.step}")  # ref train.py:133-134
        self.system.params = params
        self.opt_state = opt_state
        self.step += 1
        return {"loss": loss, "grad_norm": gnorm}

    @partial(jax.jit, static_argnames=("self",))
    def _eval_logits(self, params, batch):
        if self.lm_type == "llama":
            return self.system.module.apply(
                {"params": params}, batch["input_ids"], batch.get("attention_mask")
            )
        return self.system.module.apply(
            {"params": params},
            batch["phone"], batch["tone"], batch["semantic"], batch.get("spk_id"),
            batch.get("encoder_attention_mask"), batch.get("attention_mask"),
        )

    def evaluate(self, batch) -> Dict[str, float]:
        logits = self._eval_logits(self.system.params, batch)
        if self.lm_type == "llama":
            loss = self.system.loss(
                self.system.params, batch["input_ids"], batch["labels"],
                attention_mask=batch.get("attention_mask"),
            )
        else:
            loss = self.system.loss(
                self.system.params, batch["phone"], batch["tone"], batch["semantic"],
                batch["labels"], spk_id=batch.get("spk_id"),
                encoder_attention_mask=batch.get("encoder_attention_mask"),
                attention_mask=batch.get("attention_mask"),
            )
        acc = top_k_accuracy(logits[:, :-1], batch["labels"][:, 1:], k=5)
        return {"val/loss": float(loss), "val/top5_acc": float(acc)}

    def validate_audio(self, pipe, batch, logger, n_items: int = 1, seed: int = 0,
                       method: str = "dpm-solver", infer_speedup: int = 50):
        """Synthesize validation audio through the frozen diffusion stack.

        Reference parity (`text2semantic/roformer/train.py:33-53`): during LM
        validation, run generation with the CURRENT LM weights for a few val
        utterances, decode tokens -> centroid units -> latent diffusion ->
        vocoder, and log the audio.  `pipe` is a TTSPipeline whose diffusion/
        vocoder are the frozen models; its LM params are swapped for the
        in-training ones here."""
        pipe.lm.params = self.system.params
        if self.lm_type == "llama":
            # single-stream batch: recover the phone prompt from input_ids
            # ([BOS, phones, EOS, semantic...]); tones are not conditioned on
            ids = np.asarray(batch["input_ids"])
            for i in range(min(n_items, ids.shape[0])):
                row = ids[i]
                eos_pos = int(np.argmax(row == self.lm_cfg.phone_eos))
                if eos_pos <= 1:
                    continue
                phones_i = row[1:eos_pos]
                wav, sr = pipe.tts_from_phones(
                    phones_i, np.zeros_like(phones_i), spk_id=1, seed=seed + i,
                    method=method, infer_speedup=infer_speedup,
                )
                if logger is not None and wav.size:
                    logger.log_audio(self.step, f"val/audio_{i}", wav, sr)
            return
        mask = batch.get("encoder_attention_mask")
        phones = np.asarray(batch["phone"])
        tones = np.asarray(batch["tone"])
        spk_ids = batch.get("spk_id")
        for i in range(min(n_items, phones.shape[0])):
            L = int(np.sum(np.asarray(mask)[i])) if mask is not None else phones.shape[1]
            spk = int(np.asarray(spk_ids)[i].reshape(-1)[0]) if spk_ids is not None else 1
            wav, sr = pipe.tts_from_phones(
                phones[i, :L], tones[i, :L], spk_id=spk, seed=seed + i,
                method=method, infer_speedup=infer_speedup,
            )
            if logger is not None and wav.size:
                logger.log_audio(self.step, f"val/audio_{i}", wav, sr)

    def save(self):
        # Params sharded ACROSS processes (cross-host model/pipe/expert axes)
        # save shard-per-process + index (train/sharded_checkpoint.py,
        # Orbax-style, SURVEY §5); otherwise rank-0 msgpack after a gather
        # that is a local fetch for replicated/addressable leaves
        # (reference: Saver_empty on non-main ranks).
        from latent_diffusion_speech_tpu.parallel.dist import is_main_process
        from latent_diffusion_speech_tpu.parallel.multihost import gather_to_host
        from latent_diffusion_speech_tpu.train.sharded_checkpoint import (
            save_checkpoint_sharded,
            tree_needs_sharded_save,
        )

        tcfg = self.cfg.text2semantic.train
        meta = {"epoch": self._epoch, "batch_in_epoch": self._batch_in_epoch}
        if tree_needs_sharded_save(self.system.params):
            trees = {"params": self.system.params}
            if tcfg.save_opt:
                trees["opt_state"] = self.opt_state
            save_checkpoint_sharded(
                tcfg.expdir, self.step, trees,
                keep=tcfg.last_save_model_num, meta=meta,
            )
            return
        params = gather_to_host(self.system.params)
        opt_state = gather_to_host(self.opt_state) if tcfg.save_opt else None
        if not is_main_process():
            return
        save_checkpoint(
            tcfg.expdir, self.step, params,
            opt_state, keep=tcfg.last_save_model_num,
            meta=meta,
        )

    def resume(self) -> bool:
        from latent_diffusion_speech_tpu.train.sharded_checkpoint import (
            load_checkpoint_sharded,
            sharded_checkpoint_dir,
        )

        tcfg = self.cfg.text2semantic.train
        step = latest_checkpoint_step(tcfg.expdir)
        if step is None:
            return False
        if sharded_checkpoint_dir(tcfg.expdir, step).exists():
            templates = {"params": self.system.params}
            if tcfg.save_opt:
                templates["opt_state"] = self.opt_state
            try:
                restored = load_checkpoint_sharded(tcfg.expdir, step, templates)
            except KeyError:
                # checkpoint saved without the opt_state tree
                restored = load_checkpoint_sharded(
                    tcfg.expdir, step, {"params": self.system.params}
                )
            self.system.params = restored["params"]
            if restored.get("opt_state") is not None:
                self.opt_state = restored["opt_state"]
        else:
            _, params, opt_state = load_checkpoint(
                tcfg.expdir, self.system.params,
                self.opt_state if tcfg.save_opt else None,
            )
            self.system.params = params
            if opt_state is not None:
                self.opt_state = opt_state
        self.step = step
        meta = load_checkpoint_meta(tcfg.expdir)
        self._epoch = int(meta.get("epoch", 0))
        self._batch_in_epoch = int(meta.get("batch_in_epoch", 0))
        return True

    def _step_mfu(self, batch, steps_per_sec) -> Optional[float]:
        """Analytic MFU from XLA cost analysis, once per batch shape (same
        approach as DiffusionTrainer._step_mfu)."""
        from latent_diffusion_speech_tpu.utils.flops import device_peak_flops

        shape_key = tuple(batch["input_ids"].shape) if "input_ids" in batch else tuple(
            batch["semantic"].shape
        )
        if not hasattr(self, "_step_flops"):
            self._step_flops = {}
            self._peak_flops = device_peak_flops(jax.devices()[0])
        if shape_key not in self._step_flops:
            flops = None
            try:
                rng = jax.random.PRNGKey(0)
                ca = self._train_step.lower(
                    self.system.params, self.opt_state, batch, rng
                ).compile().cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                flops = float(ca["flops"])
            except Exception:
                pass
            self._step_flops[shape_key] = flops
        flops = self._step_flops[shape_key]
        if flops is None or not self._peak_flops:
            return None
        return flops * steps_per_sec / self._peak_flops

    def train(self, loader, val_loader=None, max_steps: Optional[int] = None, logger=None,
              tts_pipeline=None, shutdown=None):
        """tts_pipeline: optional TTSPipeline with the frozen diffusion/vocoder
        (ref 21_train_lm.py:30-34) — enables validation audio synthesis.
        SIGTERM/SIGINT checkpoints once and returns (train/signals.py)."""
        import time

        from latent_diffusion_speech_tpu.train.debug import check_step, install
        from latent_diffusion_speech_tpu.train.signals import GracefulShutdown

        tcfg = self.cfg.text2semantic.train
        dcfg = getattr(self.cfg, "debug", None)
        last_t = time.time()
        with (shutdown or GracefulShutdown()) as stop, install(dcfg):
            start_epoch = self._epoch
            for epoch in range(start_epoch, tcfg.epochs):
                resuming_mid_epoch = epoch == start_epoch and self._batch_in_epoch > 0
                self._epoch = epoch
                if not resuming_mid_epoch:
                    self._batch_in_epoch = 0
                if hasattr(loader, "set_epoch"):
                    loader.set_epoch(epoch)
                    if resuming_mid_epoch:
                        loader.skip_batches(self._batch_in_epoch)
                for batch in loader:
                    if stop.requested:
                        self.save()
                        return
                    device_batch = self.device_put_batch(batch)
                    metrics = self.train_step(device_batch)
                    self._batch_in_epoch += 1
                    check_step(
                        dcfg, self.step, self.system.params, metrics["loss"],
                        batch=device_batch, expdir=tcfg.expdir,
                    )
                    if logger and self.step % tcfg.interval_log == 0:
                        dt = time.time() - last_t
                        last_t = time.time()
                        steps_per_sec = tcfg.interval_log / max(dt, 1e-9)
                        first = next(iter(device_batch.values()))
                        log = {
                            "train/loss": float(metrics["loss"]),
                            "train/grad_norm": float(metrics["grad_norm"]),
                            "train/steps_per_sec": steps_per_sec,
                            "train/samples_per_sec": steps_per_sec * int(first.shape[0]),
                        }
                        mfu = self._step_mfu(device_batch, steps_per_sec)
                        if mfu is not None:
                            log["train/mfu"] = mfu
                        logger.log(self.step, log)
                    if self.step % tcfg.interval_val == 0:
                        if val_loader is not None and logger:
                            for vb in val_loader:
                                vb = self.device_put_batch(vb)
                                logger.log(self.step, self.evaluate(vb))
                                if tts_pipeline is not None:
                                    self.validate_audio(tts_pipeline, vb, logger)
                                break
                        self.save()
                    if max_steps and self.step >= max_steps:
                        self.save()
                        return
