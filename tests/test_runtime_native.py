"""Native host data-plane tests: builds runtime/libnlbac_host.so on first
use and checks ring-buffer + TSV semantics against the Python twins."""

import os

import numpy as np
import pytest

from nlbac_tpu import runtime_native as rn

pytestmark = pytest.mark.skipif(not rn.native_available(),
                                reason="no C++ toolchain")


def test_ring_buffer_push_sample():
    buf = rn.HostReplay(capacity=8, record_size=3, seed=1)
    for i in range(5):
        buf.push(np.array([i, i + 0.5, i + 0.25], np.float32))
    assert len(buf) == 5 and buf.total == 5
    s = buf.sample(64)
    assert s.shape == (64, 3)
    assert np.all(s[:, 0] < 5)
    np.testing.assert_allclose(s[:, 1] - s[:, 0], 0.5)


def test_ring_buffer_wraparound():
    buf = rn.HostReplay(capacity=4, record_size=1, seed=2)
    buf.push_many(np.arange(6, dtype=np.float32)[:, None])
    assert len(buf) == 4 and buf.total == 6
    s = buf.sample(256)
    vals = np.unique(s)
    assert set(vals.tolist()) <= {2.0, 3.0, 4.0, 5.0}


def test_ring_buffer_bounded_sampling():
    buf = rn.HostReplay(capacity=64, record_size=1, seed=3)
    buf.push_many(np.arange(50, dtype=np.float32)[:, None])
    s = buf.sample(256, max_index=5)
    assert np.all(s < 5)


def test_empty_buffer_samples_zeros():
    buf = rn.HostReplay(capacity=8, record_size=2, seed=4)
    s = buf.sample(4)
    np.testing.assert_allclose(s, 0.0)


def test_tsv_writer_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "progress.txt")
    w = rn.NativeTsvWriter(path)
    w.header(["Episode", "reward"])
    for i in range(100):
        w.row([float(i), i * 2.0])
    w.close()
    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(path)
    assert len(cols["Episode"]) == 100
    np.testing.assert_allclose(cols["reward"], 2.0 * np.arange(100))


def test_throughput_sane():
    """Native pushes should handle >=1e5 records/sec easily."""
    import time
    buf = rn.HostReplay(capacity=100_000, record_size=32, seed=5)
    recs = np.random.randn(50_000, 32).astype(np.float32)
    t0 = time.perf_counter()
    buf.push_many(recs)
    dt = time.perf_counter() - t0
    assert dt < 2.0, dt
    assert buf.total == 50_000
