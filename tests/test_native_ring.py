"""Native SPSC ring buffer + realtime engine tests."""

import threading

import numpy as np

from streamvoiceanon_tpu.native import RingBuffer


def test_ring_builds_native():
    r = RingBuffer(1024)
    assert r.native, "native library failed to build/load"


def test_ring_write_read_roundtrip():
    r = RingBuffer(1024)
    x = np.arange(300, dtype=np.float32)
    r.write(x)
    assert r.available() == 300
    out = r.read(300)
    np.testing.assert_array_equal(out, x)
    assert r.available() == 0


def test_ring_underrun_pads_zeros():
    r = RingBuffer(64)
    r.write(np.ones(10, np.float32))
    out = r.read(20)
    np.testing.assert_array_equal(out[:10], 1.0)
    np.testing.assert_array_equal(out[10:], 0.0)
    assert r.underruns() == 10


def test_ring_overrun_drops_oldest():
    r = RingBuffer(64)  # rounds to 64
    r.write(np.arange(64, dtype=np.float32))
    r.write(np.arange(64, 80, dtype=np.float32))  # overruns by 16
    assert r.overruns() == 16
    out = r.read(64)
    np.testing.assert_array_equal(out, np.arange(16, 80, dtype=np.float32))


def test_ring_threaded_spsc():
    """Producer/consumer on different threads: all data arrives in order."""
    r = RingBuffer(1 << 14)
    total = 1 << 16
    src = np.arange(total, dtype=np.float32)
    got = []

    def producer():
        cap = 1 << 14
        for i in range(0, total, 997):
            n = len(src[i : i + 997])
            while cap - r.available() < n:  # wait for space (no drops wanted)
                pass
            r.write(src[i : i + 997])

    def consumer():
        read = 0
        while read < total:
            n = min(1024, total - read)
            if r.available() >= n:
                got.append(r.read(n))
                read += n

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tc.start()
    tp.start()
    tp.join()
    tc.join(timeout=10)
    out = np.concatenate(got)
    assert len(out) == total
    assert r.overruns() == 0
    np.testing.assert_array_equal(out, src)
