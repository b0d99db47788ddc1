"""Test harness: simulate an 8-device mesh on CPU (SURVEY.md section 4.3).

Must run before anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The image's sitecustomize registers a TPU PJRT plugin at interpreter start,
# before conftest can set env vars — override via the config API as well.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles hundreds of programs
# (multi-device trainer steps, whole-serve chains); cache them across runs
# and sessions so re-runs spend time on the tests, not on XLA.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# fast/slow split: the heavy suites (multi-device trainer steps, torch parity
# with compiled models, e2e CLI drives) are marked 'slow'.  Default runs
# everything; the fast dev loop is `pytest -m "not slow"` (<2 min).
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    "test_tensor_parallel", "test_codec_trainer", "test_train", "test_cli",
    "test_e2e", "test_hubert", "test_lora", "test_unit2mel_import",
    "test_reference_migration", "test_verify_import", "test_w2vbert", "test_wav2vec2",
    "test_discriminators", "test_lm", "test_diffusion", "test_bert_text_mode",
    "test_whisper_units", "test_vaegan", "test_fast_batch",
    # interpret-mode Pallas UNet parity suites: minutes each on CPU
    "test_pallas_unet", "test_pallas_unet_stream",
    # full block-zoo torch parity + general-UNet compiles
    "test_unet_blocks", "test_vaegan_modules",
    # shard_map pipeline compiles on 8 virtual devices: ~4 min
    "test_pipeline",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.purebasename in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
