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


def test_ring_overrun_race_consumer_resync():
    """Producer floods the ring while the consumer reads: the SPSC invariant
    (only the consumer writes `tail`) means every read must deliver a
    coherent window — strictly increasing sample values, never more than
    capacity behind the freshest write, and available() never exceeds
    capacity (the round-1 producer-side tail store lost drops under exactly
    this overload interleaving)."""
    cap = 1 << 10
    r = RingBuffer(cap)
    total = 1 << 18
    stop = threading.Event()
    errors = []

    def producer():
        i = 0
        while i < total and not stop.is_set():
            n = 512
            r.write(np.arange(i, i + n, dtype=np.float32))
            i += n

    def consumer():
        last = -1.0
        while not stop.is_set():
            avail = r.available()
            if avail > cap:
                errors.append(f"available {avail} > capacity {cap}")
                return
            out = r.read(256)
            vals = out[out > 0]  # zero-fill from underruns is allowed
            if len(vals):
                if np.any(np.diff(vals) <= 0):
                    errors.append("non-monotone window (torn read)")
                    return
                if vals[-1] <= last:
                    errors.append("window went backwards across reads")
                    return
                last = float(vals[-1])

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tc.start()
    tp.start()
    tp.join()
    stop.set()
    tc.join(timeout=10)
    assert not errors, errors
    if r.overruns() == 0:
        # a heavily loaded scheduler can starve the producer so the consumer
        # always keeps up — force the overrun path deterministically instead
        base = float(total)
        r.write(np.arange(base, base + 2 * cap, dtype=np.float32))
        out = r.read(cap)
        vals = out[out > 0]
        assert np.all(np.diff(vals) > 0), "torn window after forced overrun"
    assert r.overruns() > 0, "overrun path never exercised"
