"""Headless real-time conversion engine (the GUI's audio core, L6).

Equivalent of evaluations/real-time-gui.py:1204-1406 without the tkinter UI:
an audio producer (device callback or test harness) pushes capture blocks of
any size into a native SPSC ring; a compute thread assembles fixed
2048*k-sample chunks, runs the StreamSession, and pushes converted audio into
an output ring the playback callback drains.  Warm-up runs delay+3 silent
chunks to trigger compilation before going live (real-time-gui.py:1234-1274).

sounddevice is not available in this image, so device hookup is left to the
caller: feed `push_input()` from any capture callback and drain
`pull_output()` from any playback callback.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import numpy as np

from streamvoiceanon_tpu.native import RingBuffer


class RealtimeEngine:
    MAX_BATCH = 16  # adaptive-fetch drain limit (pow-2 concat buckets)

    def __init__(self, session, ring_seconds: float = 2.0,
                 num_fetchers: int = 4):
        """num_fetchers: size of the output-fetch thread pool.  On the axon
        relay a host fetch costs a fixed ~25-30 ms regardless of size; a
        single fetcher therefore caps the sustained rate at ~1 chunk / 30 ms
        even though dispatches take ~2-5 ms.  A pool overlaps several
        in-flight fetches (the relay pipelines concurrent materialization
        requests) while an ordered-writeback turnstile keeps the audio ring
        strictly in sequence.  Each fetch is additionally ADAPTIVE: a worker
        drains the whole pending backlog and materializes it as one
        device-concat transfer, so when the relay degrades and serializes
        concurrent fetches the period still converges to dispatch-bound
        (~RTT/backlog) instead of ~1 RTT/chunk.  1 restores the
        single-fetcher behavior; on local PJRT (fetches ~µs) the pool is
        simply idle and batches stay size 1."""
        self.session = session
        self.chunk = session.scfg.decode_chunk_frames * session.spf
        cap = int(ring_seconds * session.cfg.sample_rate)
        self.in_ring = RingBuffer(cap)
        self.out_ring = RingBuffer(cap)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.num_fetchers = max(1, int(num_fetchers))
        self.chunks_processed = 0
        self.max_fetch_batch = 0  # largest adaptive fetch batch seen
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
        relay round-trip.  The concat is padded to the next power-of-2
        bucket (2/4/8/16) so only a fixed program set ever compiles — each
        of which warm_up() pre-compiles, keeping first-degraded-backlog
        latency compile-free."""
        import jax.numpy as jnp

        k = len(wavs)
        if k == 1:
            return [np.asarray(wavs[0])]
        b = 1 << (k - 1).bit_length()
        padded = list(wavs) + [wavs[-1]] * (b - k)
        sizes = [int(w.shape[0]) for w in padded]
        cat = np.asarray(jnp.concatenate(padded))
        return np.split(cat, np.cumsum(sizes[:-1]))[:k]

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

    def _loop(self):
        """Compute thread: dispatch-only (no device sync — on the axon
        runtime a fetch costs a fixed ~25 ms, so materialization happens on
        the fetcher pool and overlaps the next dispatches).  Fetchers pull
        (seq, t0, wav) items, materialize CONCURRENTLY, then pass an
        ordered-writeback turnstile so ring writes (and the latency log)
        stay strictly in sequence.

        Each fetcher drains ALL currently-pending chunks (a contiguous seq
        run — the drain holds a lock), device-concats them and fetches ONCE:
        one relay round-trip then delivers k chunks, so even when the relay
        serializes concurrent materializations (degraded windows, where the
        pool alone gets no overlap) the sustained period self-adjusts to
        ~RTT/k -> dispatch-bound.  Under a paced real-time feed the queue
        rarely holds more than one chunk, so per-chunk delivery latency
        stays ~1 fetch."""
        import queue

        q: "queue.Queue" = queue.Queue(maxsize=64)
        turnstile = threading.Condition()
        drain = threading.Lock()
        state = {"next": 0}

        def fetcher():
            while True:
                with drain:
                    item = q.get()
                    if item is None:
                        return
                    batch = [item]
                    while len(batch) < self.MAX_BATCH:
                        try:
                            nxt = q.get_nowait()
                        except queue.Empty:
                            break
                        if nxt is None:
                            q.put(None)  # hand shutdown to another worker
                            break
                        batch.append(nxt)
                arrs = self._materialize([b[2] for b in batch])
                with turnstile:
                    while (state["next"] != batch[0][0]
                           and not self._stop.is_set()):
                        turnstile.wait(timeout=0.5)
                    t1 = time.perf_counter()
                    # instrumentation updated under the turnstile: fetcher
                    # threads would otherwise race the read-modify-write
                    self.max_fetch_batch = max(self.max_fetch_batch, len(batch))
                    for (seq, t0, _), arr in zip(batch, arrs):
                        self.out_ring.write(arr)
                        self.last_latency_ms = (t1 - t0) * 1e3
                        self.latency_log.append((t0, t1))
                        self.chunks_processed += 1
                    state["next"] = batch[-1][0] + 1
                    turnstile.notify_all()

        fts = [threading.Thread(target=fetcher, daemon=True)
               for _ in range(self.num_fetchers)]
        for ft in fts:
            ft.start()
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
                    q.put((seq, t0, wav))
                    seq += 1
                else:
                    out = self.session.process_chunk(block)
                    self.out_ring.write(np.asarray(out))
                    self.last_latency_ms = (time.perf_counter() - t0) * 1e3
                    self.chunks_processed += 1
        finally:
            with turnstile:
                turnstile.notify_all()
            for _ in fts:
                q.put(None)
            for ft in fts:
                ft.join(timeout=5.0)

    def start(self) -> None:
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None
