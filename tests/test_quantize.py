"""k-means + codebook + VQ tests (vs sklearn where useful)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.quantize import (
    EuclideanCodebook,
    VectorQuantize,
    kmeans_fit,
    kmeans_predict,
    load_codebook,
    save_codebook,
)


def _blobs(rng, n_per=200, k=8, d=16, spread=0.05):
    centers = rng.standard_normal((k, d)).astype(np.float32) * 2
    data = np.concatenate(
        [c + spread * rng.standard_normal((n_per, d)).astype(np.float32) for c in centers]
    )
    labels = np.repeat(np.arange(k), n_per)
    return data, centers, labels


class TestKMeans:
    def test_recovers_blobs(self, rng):
        data, centers, labels = _blobs(rng)
        cb, inertia = kmeans_fit(data, k=8, epochs=8, batch_size=256, seed=0)
        assert cb.shape == (8, 16)
        # every true center should have a learned centroid nearby
        d = np.linalg.norm(centers[:, None, :] - cb[None, :, :], axis=-1)
        assert d.min(axis=1).max() < 0.2
        # predictions consistent within blobs
        pred = np.asarray(kmeans_predict(data, cb))
        for blob in range(8):
            ids = pred[labels == blob]
            assert (ids == ids[0]).mean() > 0.99

    def test_matches_sklearn_predict(self, rng):
        sklearn = pytest.importorskip("sklearn.cluster")
        data, _, _ = _blobs(rng, n_per=50)
        cb, _ = kmeans_fit(data, k=8, epochs=4, batch_size=128)
        km = sklearn.KMeans(n_clusters=8, n_init=1)
        km.fit(data[:100])
        km.cluster_centers_ = cb.astype(np.float32)
        km._n_threads = 1
        np.testing.assert_array_equal(
            np.asarray(kmeans_predict(data, cb)), km.predict(data)
        )

    def test_save_load_roundtrip(self, tmp_path, rng):
        cb = rng.standard_normal((16, 4)).astype(np.float32)
        save_codebook(tmp_path / "cb.npz", cb)
        np.testing.assert_array_equal(load_codebook(tmp_path / "cb.npz"), cb)

    def test_load_reference_torch_layout(self, tmp_path, rng):
        torch = pytest.importorskip("torch")
        cb = rng.standard_normal((16, 4)).astype(np.float32)
        # the reference's sklearn-attrs dict layout (17_preprocess_train_cluster.py:46-50)
        torch.save(
            {"n_features_in_": 4, "_n_threads": 4, "cluster_centers_": torch.from_numpy(cb), "n_clusters": 16},
            tmp_path / "semantic_codebook.pt",
        )
        np.testing.assert_allclose(load_codebook(tmp_path / "semantic_codebook.pt"), cb)


class TestEuclideanCodebook:
    def test_quantize_snaps_to_nearest(self, rng):
        cb = rng.standard_normal((32, 8)).astype(np.float32)
        book = EuclideanCodebook(cb)
        x = cb[5] + 1e-3
        assert int(book.quantize(jnp.asarray(x))) == 5
        np.testing.assert_allclose(np.asarray(book(jnp.asarray(x))), cb[5], atol=1e-6)

    def test_batched_shapes(self, rng):
        cb = rng.standard_normal((32, 8)).astype(np.float32)
        book = EuclideanCodebook(cb)
        x = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
        ids = book.quantize(x)
        assert ids.shape == (2, 10)
        assert book.dequantize(ids).shape == (2, 10, 8)


class TestVectorQuantize:
    def test_straight_through_and_commit(self, rng):
        vq = VectorQuantize(dim=16, codebook_size=64, codebook_dim=8)
        state = vq.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((4, 10, 16)).astype(np.float32))
        out, ids, commit, new_state = vq(state, x, train=True)
        assert out.shape == x.shape
        assert ids.shape == (4, 10)
        assert float(commit) >= 0
        # EMA updated
        assert float(jnp.sum(new_state.ema_counts)) > 0

    def test_gradients_flow_through_ste(self, rng):
        vq = VectorQuantize(dim=8, codebook_size=16, codebook_dim=4)
        state = vq.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))

        def loss_fn(x):
            out, _, commit, _ = vq(state, x, train=False)
            return jnp.sum(out**2) + commit

        g = jax.grad(loss_fn)(x)
        assert bool(jnp.any(g != 0))

    def test_encode_decode_consistent(self, rng):
        vq = VectorQuantize(dim=8, codebook_size=16, codebook_dim=4)
        state = vq.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((3, 7, 8)).astype(np.float32))
        _, ids, _, _ = vq(state, x, train=False)
        np.testing.assert_array_equal(np.asarray(vq.encode(state, x)), np.asarray(ids))
        assert vq.decode(state, ids).shape == (3, 7, 8)

    def test_utilization(self, rng):
        vq = VectorQuantize(dim=8, codebook_size=16, codebook_dim=4)
        state = vq.init(jax.random.PRNGKey(0))
        assert float(vq.utilization(state)) == 0.0
        x = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
        _, _, _, state = vq(state, x, train=True)
        assert float(vq.utilization(state)) > 0.0
