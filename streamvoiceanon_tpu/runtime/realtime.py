"""Headless real-time conversion engines (the GUI's audio core, L6).

Equivalent of evaluations/real-time-gui.py:1204-1406 without the tkinter UI:
an audio producer (device callback or test harness) pushes capture blocks of
any size into a native SPSC ring; a compute thread assembles fixed
2048*k-sample chunks, runs the StreamSession, and pushes converted audio into
an output ring the playback callback drains.  Warm-up runs delay+3 silent
chunks to trigger compilation before going live (real-time-gui.py:1234-1274).

Two engines:

* RealtimeEngine — one live stream (the reference's one-stream-per-GPU
  operating point, real-time-gui.py:1316-1359).
* MultiStreamEngine — B concurrent live streams through ONE batched
  StreamSession: every dispatch serves all B streams (the latency-bound
  stages — 8-step fast codebook loop, vocoder conv chain — amortize across
  the batch, docs/KERNELS.md), which is where the TPU build beats the
  reference outright: the reference cannot batch live streams at all.

sounddevice is not available in this image, so device hookup is left to the
caller: feed `push_input()` from any capture callback and drain
`pull_output()` from any playback callback.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional

import numpy as np

from streamvoiceanon_tpu.native import RingBuffer


class _FetchPool:
    """Ordered adaptive-batch fetcher pool shared by both engines.

    Workers pull (seq, t0, wav) items; each drains the whole pending backlog
    (a contiguous seq run — the drain holds a lock), materializes it with ONE
    device-concat transfer via `materialize`, then passes an ordered-writeback
    turnstile so `deliver` runs strictly in sequence.  On the axon relay a
    host fetch costs a fixed ~25-30 ms regardless of size while dispatches
    take ~2-5 ms; concurrent fetches overlap when the relay pipelines them,
    and when it degrades and serializes them the adaptive batch converges the
    period to ~RTT/backlog instead of ~1 RTT/chunk."""

    def __init__(self, materialize, deliver, num_fetchers, max_batch, stop_event):
        self._materialize = materialize
        self._deliver = deliver
        self.max_batch = max_batch
        self._stop = stop_event
        self.q: "queue.Queue" = queue.Queue(maxsize=64)
        self._turnstile = threading.Condition()
        self._drain = threading.Lock()
        self._state = {"next": 0}
        self.max_fetch_batch = 0  # largest adaptive fetch batch seen
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, int(num_fetchers)))
        ]
        for t in self._threads:
            t.start()

    def submit(self, seq, t0, wav) -> None:
        self.q.put((seq, t0, wav))

    def _worker(self):
        while True:
            with self._drain:
                item = self.q.get()
                if item is None:
                    return
                batch = [item]
                while len(batch) < self.max_batch:
                    try:
                        nxt = self.q.get_nowait()
                    except queue.Empty:
                        break
                    if nxt is None:
                        self.q.put(None)  # hand shutdown to another worker
                        break
                    batch.append(nxt)
            arrs = self._materialize([b[2] for b in batch])
            with self._turnstile:
                while (self._state["next"] != batch[0][0]
                       and not self._stop.is_set()):
                    self._turnstile.wait(timeout=0.5)
                t1 = time.perf_counter()
                # instrumentation updated under the turnstile: fetcher
                # threads would otherwise race the read-modify-write
                self.max_fetch_batch = max(self.max_fetch_batch, len(batch))
                for (seq, t0, _), arr in zip(batch, arrs):
                    self._deliver(seq, t0, t1, arr)
                self._state["next"] = batch[-1][0] + 1
                self._turnstile.notify_all()

    def close(self):
        with self._turnstile:
            self._turnstile.notify_all()
        for _ in self._threads:
            self.q.put(None)
        for t in self._threads:
            t.join(timeout=5.0)


def _pow2_concat(wavs, axis):
    """Device-concat a list of same-shape wavs padded to the next power-of-2
    bucket (2/4/8/16): only a fixed program set ever compiles, each of which
    warm-up pre-compiles, so a first degraded-relay backlog never pays an
    XLA trace inside a fetcher thread."""
    import jax.numpy as jnp

    k = len(wavs)
    b = 1 << (k - 1).bit_length()
    padded = list(wavs) + [wavs[-1]] * (b - k)
    sizes = [int(w.shape[axis]) for w in padded]
    cat = np.asarray(jnp.concatenate(padded, axis=axis))
    return np.split(cat, np.cumsum(sizes[:-1]), axis=axis)[:k]


class RealtimeEngine:
    MAX_BATCH = 16  # adaptive-fetch drain limit (pow-2 concat buckets)

    def __init__(self, session, ring_seconds: float = 2.0,
                 num_fetchers: int = 4):
        """num_fetchers: size of the output-fetch thread pool (see
        _FetchPool).  1 restores single-fetcher behavior; on local PJRT
        (fetches ~µs) the pool is simply idle and batches stay size 1."""
        self.session = session
        self.chunk = session.scfg.decode_chunk_frames * session.spf
        cap = int(ring_seconds * session.cfg.sample_rate)
        self.in_ring = RingBuffer(cap)
        self.out_ring = RingBuffer(cap)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._pool: Optional[_FetchPool] = None
        self.num_fetchers = max(1, int(num_fetchers))
        self.chunks_processed = 0
        self.last_latency_ms = 0.0
        # per-chunk (t_read, t_delivered) perf_counter pairs, appended in
        # sequence order — benchmark instrumentation (bench.py pipelined mode)
        self.latency_log: list = []

    # ---- audio-thread side -------------------------------------------------

    def push_input(self, block: np.ndarray) -> None:
        """Call from the capture callback (any block size, mono float32)."""
        self.in_ring.write(block)

    def pull_output(self, n: int) -> np.ndarray:
        """Call from the playback callback; returns n samples (zeros on
        underrun)."""
        return self.out_ring.read(n)

    def _materialize(self, wavs) -> list:
        """Fetch a contiguous run of device chunks to host: one device-side
        concat + ONE transfer for k>1, so a whole backlog costs a single
        relay round-trip."""
        if len(wavs) == 1:
            return [np.asarray(wavs[0])]
        return _pow2_concat(wavs, axis=0)

    # ---- compute side ------------------------------------------------------

    def warm_up(self) -> None:
        """Compile all chunk phases with silent input
        (real-time-gui.py:1234-1274), plus every adaptive-fetch concat
        bucket — a first degraded-relay backlog must not pay a compile
        inside the fetcher thread."""
        for _ in range(self.session.delay + 3):
            self.session.process_chunk(np.zeros(self.chunk, np.float32))
        import jax
        import jax.numpy as jnp

        z = jnp.zeros((self.chunk,), jnp.float32)
        b = 2
        while b <= self.MAX_BATCH:
            jax.block_until_ready(jnp.concatenate([z] * b))
            b <<= 1

    @property
    def max_fetch_batch(self) -> int:
        """Largest adaptive fetch batch seen (live — readable mid-run)."""
        return self._pool.max_fetch_batch if self._pool else 0

    def _deliver(self, seq, t0, t1, arr):
        self.out_ring.write(arr)
        self.last_latency_ms = (t1 - t0) * 1e3
        self.latency_log.append((t0, t1))
        self.chunks_processed += 1

    def _loop(self):
        """Compute thread: dispatch-only (no device sync — materialization
        happens on the fetcher pool and overlaps the next dispatches)."""
        pool = _FetchPool(self._materialize, self._deliver,
                          self.num_fetchers, self.MAX_BATCH, self._stop)
        self._pool = pool
        use_async = getattr(self.session, "incremental", False)
        seq = 0
        try:
            while not self._stop.is_set():
                if self.in_ring.available() < self.chunk:
                    time.sleep(0.002)
                    continue
                block = self.in_ring.read(self.chunk)
                t0 = time.perf_counter()
                if use_async:
                    wav = self.session.process_chunk_async(block)
                    pool.submit(seq, t0, wav)
                    seq += 1
                else:
                    out = self.session.process_chunk(block)
                    self.out_ring.write(np.asarray(out))
                    self.last_latency_ms = (time.perf_counter() - t0) * 1e3
                    self.chunks_processed += 1
        finally:
            pool.close()

    def start(self) -> None:
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None


class MultiStreamEngine:
    """B concurrent live streams served by ONE batched StreamSession.

    Each stream has its own capture/playback SPSC ring pair; a dispatch
    thread assembles one (B, 2048*k) block per engine tick and runs the
    batched session (every per-chunk program amortizes the LM fast loop and
    the vocoder conv chain over all B streams), and the ordered fetcher pool
    splits the fetched (B, n) wav back into the per-stream output rings.

    Tick discipline (frame clock): a tick fires as soon as EVERY stream has
    a full chunk buffered — or, once `slack` frame periods have elapsed
    since the previous tick, with silence standing in for any stream that
    is late (counted in `missed[i]`; its pending partial input stays
    buffered for the next tick).  Late capture therefore degrades only the
    late stream — it cannot stall the other B-1 — matching the real-time
    semantics of the single-stream path (ring overrun: latest audio wins).

    The reference's live app serves exactly ONE stream per GPU
    (real-time-gui.py:1316-1359); batched live serving is TPU-first
    economics: per docs/KERNELS.md the remaining per-chunk floor is
    serial-latency-bound, so audio-s/s/chip scales nearly with B.
    """

    MAX_BATCH = 16

    def __init__(self, session, ring_seconds: float = 2.0,
                 num_fetchers: int = 4, slack: float = 1.5):
        assert getattr(session, "incremental", False), (
            "MultiStreamEngine requires an incremental-mode session")
        self.session = session
        self.B = int(session.batch)
        self.chunk = session.scfg.decode_chunk_frames * session.spf
        self.period = self.chunk / session.cfg.sample_rate
        self.slack = float(slack)
        cap = int(ring_seconds * session.cfg.sample_rate)
        self.in_rings = [RingBuffer(cap) for _ in range(self.B)]
        self.out_rings = [RingBuffer(cap) for _ in range(self.B)]
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._pool: Optional[_FetchPool] = None
        self.num_fetchers = max(1, int(num_fetchers))
        self.ticks_processed = 0
        self.missed = [0] * self.B  # silence-padded (late) chunks per stream
        self.last_latency_ms = 0.0
        self.latency_log: list = []  # (t_assembled, t_delivered) per tick

    # ---- audio-thread side -------------------------------------------------

    def push_input(self, i: int, block: np.ndarray) -> None:
        """Capture callback for stream i (any block size, mono float32)."""
        self.in_rings[i].write(block)

    def pull_output(self, i: int, n: int) -> np.ndarray:
        """Playback callback for stream i (zeros on underrun)."""
        return self.out_rings[i].read(n)

    # ---- compute side ------------------------------------------------------

    def warm_up(self) -> None:
        """Compile all chunk phases at batch B with silent input, plus the
        adaptive-fetch concat buckets."""
        for _ in range(self.session.delay + 3):
            self.session.process_chunk(np.zeros((self.B, self.chunk), np.float32))
        import jax
        import jax.numpy as jnp

        z = jnp.zeros((self.B, self.chunk), jnp.float32)
        b = 2
        while b <= self.MAX_BATCH:
            jax.block_until_ready(jnp.concatenate([z] * b, axis=-1))
            b <<= 1

    def _materialize(self, wavs) -> list:
        if len(wavs) == 1:
            return [np.asarray(wavs[0])]
        return _pow2_concat(wavs, axis=-1)  # (B, k*n) -> k x (B, n)

    def _deliver(self, seq, t0, t1, arr):
        for i in range(self.B):
            self.out_rings[i].write(arr[i])
        self.last_latency_ms = (t1 - t0) * 1e3
        self.latency_log.append((t0, t1))
        self.ticks_processed += 1

    def _assemble(self) -> np.ndarray:
        """Read one chunk per ready stream; silence for late ones (their
        buffered partial input is left in place for the next tick)."""
        block = np.zeros((self.B, self.chunk), np.float32)
        for i, r in enumerate(self.in_rings):
            if r.available() >= self.chunk:
                block[i] = r.read(self.chunk)
            else:
                self.missed[i] += 1
        return block

    @property
    def max_fetch_batch(self) -> int:
        """Largest adaptive fetch batch seen (live — readable mid-run)."""
        return self._pool.max_fetch_batch if self._pool else 0

    def _loop(self):
        pool = _FetchPool(self._materialize, self._deliver,
                          self.num_fetchers, self.MAX_BATCH, self._stop)
        self._pool = pool
        seq = 0
        deadline = time.perf_counter() + self.slack * self.period
        try:
            while not self._stop.is_set():
                now = time.perf_counter()
                ready = sum(r.available() >= self.chunk for r in self.in_rings)
                if ready == self.B or (ready > 0 and now >= deadline):
                    block = self._assemble()
                    t0 = time.perf_counter()
                    wav = self.session.process_chunk_async(block)
                    pool.submit(seq, t0, wav)
                    seq += 1
                    deadline = t0 + self.slack * self.period
                else:
                    time.sleep(0.001)
        finally:
            pool.close()

    def start(self) -> None:
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None
