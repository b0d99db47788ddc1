"""Native C++ npy batch reader: correctness vs numpy, error paths, throughput sanity."""

import time

import numpy as np
import pytest

from latent_diffusion_speech_tpu.data.native_loader import NativeNpyReader, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="no native toolchain")


@pytest.fixture(scope="module")
def reader():
    return NativeNpyReader(num_threads=4)





def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


class TestNativeReader:
    def test_probe(self, tmp_path, reader, rng):
        arr = rng.standard_normal((100, 8)).astype(np.float32)
        p = tmp_path / "a.npy"
        np.save(p, arr)
        rows, row_bytes, dtype = reader.probe(p)
        assert rows == 100 and row_bytes == 32 and dtype == np.float32

    @pytest.mark.parametrize("dtype", [np.float32, np.int32, np.int64, np.float16])
    def test_read_matches_numpy(self, tmp_path, reader, rng, dtype):
        files, starts = [], []
        ref = []
        for i in range(6):
            arr = (rng.standard_normal((50 + i, 4)) * 100).astype(dtype)
            p = tmp_path / f"{dtype.__name__}_{i}.npy"
            np.save(p, arr)
            files.append(p)
            starts.append(i)
            ref.append(arr[i : i + 20])
        out = reader.read_batch(files, starts, 20, (4,), dtype=dtype)
        np.testing.assert_array_equal(out, np.stack(ref))

    def test_3d_rows(self, tmp_path, reader, rng):
        arr = rng.standard_normal((30, 2, 5)).astype(np.float32)
        p = tmp_path / "b.npy"
        np.save(p, arr)
        out = reader.read_batch([p], [3], 10, (2, 5))
        np.testing.assert_array_equal(out[0], arr[3:13])

    def test_out_of_range_raises(self, tmp_path, reader, rng):
        np.save(tmp_path / "c.npy", rng.standard_normal((10, 4)).astype(np.float32))
        with pytest.raises(OSError):
            reader.read_batch([tmp_path / "c.npy"], [5], 10, (4,))

    def test_missing_file_raises(self, tmp_path, reader):
        with pytest.raises(OSError):
            reader.read_batch([tmp_path / "nope.npy"], [0], 1, (4,))

    def test_wrong_row_bytes_raises(self, tmp_path, reader, rng):
        np.save(tmp_path / "d.npy", rng.standard_normal((10, 4)).astype(np.float32))
        with pytest.raises(OSError):
            reader.read_batch([tmp_path / "d.npy"], [0], 2, (8,))

    def test_bf16_converting_read_matches_astype(self, tmp_path, reader, rng):
        """The fused f32->bf16 read must be bit-identical to numpy's
        .astype(ml_dtypes.bfloat16) (both round-to-nearest-even), including
        specials (inf, nan, subnormals, exact halfway mantissas)."""
        import ml_dtypes

        files, starts, ref = [], [], []
        for i in range(4):
            arr = (rng.standard_normal((60 + i, 16)) * 10).astype(np.float32)
            # salt with specials and RNE-halfway cases
            arr[0, :8] = [0.0, -0.0, np.inf, -np.inf, np.nan, 1e-40, -1e-40, 3.0]
            arr[1, 0] = np.float32(1.0 + 2**-8)       # ties-to-even boundary
            arr[1, 1] = np.float32(1.0 + 3 * 2**-9)   # rounds up
            # non-canonical NaN payloads (sNaN bit patterns): ml_dtypes
            # canonicalizes every NaN to +/-0x7FC0 — the fused read must too
            arr[1, 2:4] = np.array([0x7F800001, 0xFF923456], np.uint32).view(
                np.float32
            )
            np.save(tmp_path / f"bf_{i}.npy", arr)
            files.append(tmp_path / f"bf_{i}.npy")
            starts.append(i)
            ref.append(arr[i : i + 40].astype(ml_dtypes.bfloat16))
        out = reader.read_batch_bf16(files, starts, 40, (16,))
        assert out.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(
            out.view(np.uint16), np.stack(ref).view(np.uint16)
        )

    def test_bf16_read_rejects_non_f32(self, tmp_path, reader, rng):
        np.save(tmp_path / "i4.npy", rng.integers(0, 9, (10, 4)).astype(np.int32))
        with pytest.raises(OSError):
            reader.read_batch_bf16([tmp_path / "i4.npy"], [0], 2, (4,))

    def test_faster_than_python_loop(self, tmp_path, reader, rng):
        """Sanity: parallel native read of many files should not be slower than
        sequential np.load by a large margin (usually much faster)."""
        files = []
        for i in range(64):
            p = tmp_path / f"perf_{i}.npy"
            np.save(p, rng.standard_normal((400, 128)).astype(np.float32))
            files.append(p)
        starts = [10] * 64

        # best-of-3 for both paths: wall-clock ratios flake under parallel
        # test-suite CPU load (the threads share cores with other workers)
        t_native = min(
            _timed(lambda: reader.read_batch(files, starts, 300, (128,)))
            for _ in range(3)
        )
        t_numpy = min(
            _timed(lambda: np.stack([np.load(f)[10:310] for f in files]))
            for _ in range(3)
        )
        out = reader.read_batch(files, starts, 300, (128,))
        ref = np.stack([np.load(f)[10:310] for f in files])
        np.testing.assert_array_equal(out, ref)
        # very loose bound (typically 3-5x faster); guards against the native
        # path being pathologically slower without flaking under CI load
        assert t_native < t_numpy * 5.0
