"""Sharded checkpoint format (train/sharded_checkpoint.py — the Orbax-style
multi-host format SURVEY §5 calls for, VERDICT r3 item 3).

Single-process coverage here: chunk dedup across replicas, bf16 byte
round-trip, re-sharding on load (save under one mesh layout, restore under
another), retention across formats, trainer auto-dispatch.  The true
cross-process save->restart->resume parity runs in tests/test_multiprocess.py.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from latent_diffusion_speech_tpu.train.checkpoint import latest_checkpoint_step
from latent_diffusion_speech_tpu.train.sharded_checkpoint import (
    load_checkpoint_sharded,
    save_checkpoint_sharded,
    sharded_checkpoint_dir,
    tree_needs_sharded_save,
)


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    return Mesh(devs, ("data", "model"))


def _tree(mesh):
    return {
        "w": jax.device_put(
            jnp.arange(32, dtype=jnp.float32).reshape(4, 8),
            NamedSharding(mesh, P(None, "model")),
        ),
        "b": jax.device_put(jnp.ones((8,), jnp.bfloat16), NamedSharding(mesh, P())),
        "count": jnp.asarray(7),  # replicated scalar (optax-style)
    }


class TestRoundTrip:
    def test_save_load_identity(self, tmp_path, mesh):
        tree = _tree(mesh)
        save_checkpoint_sharded(tmp_path, 5, {"params": tree})
        assert latest_checkpoint_step(tmp_path) == 5
        out = load_checkpoint_sharded(tmp_path, 5, {"params": tree})["params"]
        for k in tree:
            np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(tree[k]))
            assert out[k].dtype == tree[k].dtype
        assert out["w"].sharding.is_equivalent_to(tree["w"].sharding, 2)

    def test_chunks_deduplicated_across_replicas(self, tmp_path, mesh):
        """'w' is replicated over 'data' (2 copies of each model shard): the
        file must hold exactly 2 chunks for it, not 4."""
        tree = _tree(mesh)
        save_checkpoint_sharded(tmp_path, 1, {"params": tree})
        index = json.loads((sharded_checkpoint_dir(tmp_path, 1) / "index.json").read_text())
        assert len(index["trees"]["params"]["['w']"]["chunks"]) == 2
        assert len(index["trees"]["params"]["['b']"]["chunks"]) == 1

    def test_resharding_on_load(self, tmp_path, mesh):
        """Save under (data, model), restore under a transposed layout and
        under full replication — values identical, target shardings honored."""
        tree = _tree(mesh)
        save_checkpoint_sharded(tmp_path, 2, {"params": tree})
        other = {
            "w": jax.device_put(
                jnp.zeros((4, 8), jnp.float32), NamedSharding(mesh, P("data", None))
            ),
            "b": jax.device_put(jnp.zeros((8,), jnp.bfloat16),
                                NamedSharding(mesh, P("model"))),
            "count": jnp.asarray(0),
        }
        out = load_checkpoint_sharded(tmp_path, 2, {"params": other})["params"]
        np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(tree["w"]))
        np.testing.assert_array_equal(np.asarray(out["b"]), np.asarray(tree["b"]))
        assert int(out["count"]) == 7
        assert out["w"].sharding.is_equivalent_to(other["w"].sharding, 2)

    def test_multiple_trees_and_missing_tree_raises(self, tmp_path, mesh):
        tree = _tree(mesh)
        save_checkpoint_sharded(tmp_path, 3, {"params": tree, "opt_state": {"m": tree["w"]}})
        out = load_checkpoint_sharded(tmp_path, 3, {"opt_state": {"m": tree["w"]}})
        np.testing.assert_array_equal(np.asarray(out["opt_state"]["m"]), np.asarray(tree["w"]))
        with pytest.raises(KeyError, match="ema"):
            load_checkpoint_sharded(tmp_path, 3, {"ema": tree})

    def test_missing_leaf_and_shape_mismatch_raise(self, tmp_path, mesh):
        tree = _tree(mesh)
        save_checkpoint_sharded(tmp_path, 4, {"params": {"w": tree["w"]}})
        with pytest.raises(KeyError, match="b"):
            load_checkpoint_sharded(tmp_path, 4, {"params": tree})
        bad = {"w": jax.device_put(jnp.zeros((2, 8)), NamedSharding(Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model")), P()))}
        with pytest.raises(ValueError, match="shape mismatch"):
            load_checkpoint_sharded(tmp_path, 4, {"params": bad})

    def test_host_leaves_roundtrip(self, tmp_path, mesh):
        tree = {"np": np.arange(6).reshape(2, 3), "pyint": 11, "pyfloat": 0.5}
        save_checkpoint_sharded(tmp_path, 6, {"params": tree})
        out = load_checkpoint_sharded(tmp_path, 6, {"params": tree})["params"]
        np.testing.assert_array_equal(out["np"], tree["np"])
        assert out["pyint"] == 11 and isinstance(out["pyint"], int)
        assert out["pyfloat"] == 0.5 and isinstance(out["pyfloat"], float)


class TestRetentionAndPolicy:
    def test_retention_spans_formats(self, tmp_path, mesh):
        from latent_diffusion_speech_tpu.train.checkpoint import save_checkpoint

        tree = {"w": jnp.ones(3)}
        save_checkpoint(tmp_path, 1, tree, keep=0)
        for step in (2, 3, 4):
            save_checkpoint_sharded(tmp_path, step, {"params": _tree(mesh)}, keep=2)
        assert not (tmp_path / "model_1.ckpt").exists()
        assert not sharded_checkpoint_dir(tmp_path, 2).exists()
        assert sharded_checkpoint_dir(tmp_path, 3).exists()
        assert sharded_checkpoint_dir(tmp_path, 4).exists()
        assert latest_checkpoint_step(tmp_path) == 4

    def test_needs_sharded_only_for_cross_process_shards(self, mesh):
        # single-process: everything is fully addressable
        assert not tree_needs_sharded_save(_tree(mesh))


class TestTrainerDispatch:
    def test_diffusion_trainer_reads_sharded_checkpoint(self, tmp_path):
        """A sharded checkpoint written under one layout resumes into a
        trainer on a different (single-process dp) mesh."""
        from latent_diffusion_speech_tpu.config import Config
        from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig
        from latent_diffusion_speech_tpu.train import DiffusionTrainer

        cfg = Config()
        cfg.common.n_spk = 2
        cfg.diffusion.train.expdir = str(tmp_path / "exp")
        tiny = Unit2MelConfig(
            input_channel=8, n_spk=2, out_dims=4, n_hidden=8,
            block_out_channels=(8, 8), n_heads=2, timesteps=20, k_step=20,
        )
        trainer = DiffusionTrainer(cfg, model_cfg=tiny)
        batch = trainer.device_put_batch({
            "units": np.ones((2, 16, 8), np.float32),
            "mel": np.ones((2, 16, 4), np.float32),
            "spk_id": np.zeros((2, 1), np.int32),
        })
        trainer.train_step(batch, jax.random.PRNGKey(0))
        # write the state as a SHARDED checkpoint (force the format)
        save_checkpoint_sharded(
            cfg.diffusion.train.expdir, trainer.step,
            {"params": trainer.system.params},
            meta={"epoch": 0, "batch_in_epoch": 1},
        )
        fresh = DiffusionTrainer(cfg, model_cfg=tiny)
        assert fresh.resume()
        assert fresh.step == trainer.step
        for a, b in zip(
            jax.tree_util.tree_leaves(fresh.system.params),
            jax.tree_util.tree_leaves(trainer.system.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert fresh._batch_in_epoch == 1
