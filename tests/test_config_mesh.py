"""Config round-trip + device-mesh construction on the simulated 8-CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from latent_diffusion_speech_tpu.config import (
    Config,
    ParallelConfig,
    config_from_dict,
    config_to_dict,
    load_config,
    save_config,
)
from latent_diffusion_speech_tpu.parallel import (
    batch_sharding,
    build_mesh,
    is_main_process,
    shard_batch,
)


class TestConfig:
    def test_defaults_match_reference_schema(self):
        cfg = Config()
        assert cfg.data.block_size == 512
        assert cfg.data.sampling_rate == 44100
        assert cfg.diffusion.model.block_out_channels == (256, 384, 512, 512)
        assert cfg.text2semantic.model.semantic_kmeans_num == 4096
        assert cfg.text2semantic.model.decoder.num_hidden_layers == 1
        assert cfg.text2semantic.model.encoder.num_hidden_layers == 4

    def test_yaml_roundtrip(self, tmp_path):
        cfg = Config()
        cfg.diffusion.train.batch_size = 7
        p = tmp_path / "c.yaml"
        save_config(cfg, p)
        loaded = load_config(p)
        assert loaded == cfg

    def test_loads_reference_yaml(self):
        """The reference's own config.yaml must parse (unknown keys warned, not fatal)."""
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cfg = load_config("/root/reference/configs/config.yaml")
        assert cfg.common.n_spk == 323
        assert cfg.diffusion.train.batch_size == 500
        assert cfg.common.infer.method == "unipc"
        assert cfg.text2semantic.train.lr == 2e-4

    def test_unknown_key_warns(self):
        with pytest.warns(UserWarning, match="unknown key"):
            config_from_dict({"data": {"not_a_key": 1}})

    def test_to_dict_tuples_become_lists(self):
        d = config_to_dict(Config())
        assert d["diffusion"]["model"]["block_out_channels"] == [256, 384, 512, 512]


class TestMesh:
    def test_eight_cpu_devices(self):
        assert jax.device_count() == 8

    def test_default_mesh_all_data(self):
        mesh = build_mesh()
        assert mesh.shape == {"data": 8, "seq": 1, "model": 1, "pipe": 1, "expert": 1}

    def test_model_parallel_split(self):
        mesh = build_mesh(ParallelConfig(model=2))
        assert mesh.shape == {"data": 4, "seq": 1, "model": 2, "pipe": 1, "expert": 1}

    def test_invalid_split_raises(self):
        with pytest.raises(ValueError):
            build_mesh(ParallelConfig(model=3))

    def test_shard_batch_places_data_axis(self):
        mesh = build_mesh()
        batch = {"x": np.zeros((16, 4), np.float32), "y": np.zeros((16,), np.int32)}
        sharded = shard_batch(mesh, batch)
        assert sharded["x"].sharding.spec[0] == "data"
        # each device holds 16/8 = 2 rows
        assert sharded["x"].addressable_shards[0].data.shape == (2, 4)

    def test_psum_over_mesh(self):
        """Gradient-style all-reduce compiles + runs over the simulated mesh."""
        mesh = build_mesh()
        x = shard_batch(mesh, np.ones((8, 4), np.float32))

        @jax.jit
        def mean_all(v):
            return jnp.mean(v)

        assert float(mean_all(x)) == 1.0

    def test_is_main_process(self):
        assert is_main_process() is True


class TestMultihostHelpers:
    """Single-process checks of parallel/multihost.py; the real 2-process
    cluster path is tests/test_multiprocess.py (slow)."""

    def test_mesh_spans_processes_false_single_process(self):
        from latent_diffusion_speech_tpu.parallel.multihost import mesh_spans_processes

        assert mesh_spans_processes(build_mesh()) is False

    def test_global_shard_batch_single_process_equals_shard_batch(self):
        # with one process, local data IS the global batch; the stitcher must
        # produce the same global arrays + shardings as the device_put path
        from latent_diffusion_speech_tpu.parallel.multihost import global_shard_batch

        mesh = build_mesh()
        batch = {
            "x": np.arange(16 * 4, dtype=np.float32).reshape(16, 4),
            "step": np.asarray(3, np.int32),
        }
        g = global_shard_batch(mesh, batch)
        s = shard_batch(mesh, {"x": batch["x"]})
        np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
        assert g["x"].sharding.spec == s["x"].sharding.spec
        assert int(g["step"]) == 3  # 0-d replicated

    def test_global_shard_batch_bad_tiling_raises(self):
        from latent_diffusion_speech_tpu.parallel.multihost import global_shard_batch

        mesh = build_mesh()
        with pytest.raises(ValueError, match="does not tile"):
            global_shard_batch(mesh, {"x": np.zeros((3, 2), np.float32)})
