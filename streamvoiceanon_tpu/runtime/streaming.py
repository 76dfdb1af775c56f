"""Streaming voice-conversion runtime.

Two modes:

* incremental (default) — TPU-native design: ONE fused, fixed-shape jitted
  program per chunk carries all streaming state (STFT tail, conv tails,
  windowed-attention KV ring, LM KV cache, vocoder conv tails) and does
  content-encode -> AR frame decode -> vocode in a single dispatch with
  donated buffers.  Encoder and vocoder are exactly prefix-consistent with
  their offline forms (tests/test_tokenizer_stream.py,
  tests/test_vocoder_stream.py), so the stream equals offline conversion.

* window — bit-faithful re-expression of the reference state machine
  (evaluations/infer_arvc.py:443-689): rolling 128-frame window re-encode,
  64-frame vocoder window seeded with reference-code tail.

Both share the LM phases: silence while the first `delay` tokens accumulate,
a one-time delay prefill, per-frame 2-token decode, and periodic prompt
refill when the LM position reaches max_seq_frames (:547-564) — refill is
scheduled host-side (the position trajectory is deterministic), so no
data-dependent branching enters compiled code.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.config import PipelineConfig, SamplingConfig, StreamConfig
from streamvoiceanon_tpu.models import arvc, dual_ar, tokenizer, tokenizer_stream, vocoder
from streamvoiceanon_tpu.utils.jitopts import scoped_vmem_jit


# ---------------------------------------------------------------------------
# jitted programs (shared)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 6, 7))
def _prefill_prompt(arvc_params, cfg: PipelineConfig, ref_tokens, ref_codes,
                    style, timbre, delay: int, cache_dtype):
    return arvc.prefill_prompt(
        arvc_params, cfg.arvc, ref_tokens, ref_codes, style, timbre,
        delay=delay, cache_dtype=cache_dtype,
    )


@functools.partial(jax.jit, static_argnums=(1, 4))
def _prefill_delay(arvc_params, cfg: PipelineConfig, lm_state, src_tokens, delay: int):
    return arvc.prefill_src_condition4delay(
        arvc_params, cfg.arvc, lm_state, src_tokens, delay
    )


@functools.partial(jax.jit, static_argnums=(1, 5))
def _prefill_history(arvc_params, cfg: PipelineConfig, base_state,
                     recent_tokens, recent_codes, delay: int):
    """Fast refill: append buffer_frames recent pairs to the stashed
    post-prompt state (arvc.prefill_history) — a small fixed-shape program
    instead of the full padded-prompt prefill on the hot path."""
    return arvc.prefill_history(
        arvc_params, cfg.arvc, base_state, recent_tokens, recent_codes, delay
    )


@functools.partial(jax.jit, static_argnums=(1,))
def _encode_window(params, cfg: PipelineConfig, wav_window):
    return tokenizer.encode(params, cfg.tokenizer, wav_window)


@functools.partial(jax.jit, static_argnums=(1,))
def _vocode_window(params, cfg: PipelineConfig, code_window):
    return vocoder.decode(params, cfg.vocoder, code_window)


@scoped_vmem_jit(static_argnums=(1, 5, 6))
def _decode_frames(params, cfg: PipelineConfig, state, tokens_k, key,
                   sampling: SamplingConfig, k: int):
    """k sequential decode_one steps (process_one_chunk :534-537)."""

    def step(carry, tok):
        st, kk = carry
        kk, sub = jax.random.split(kk)
        st, codes = arvc.decode_one(params, cfg.arvc, st, tok[:, None], sub, sampling)
        return (st, kk), codes

    (state, _), codes = jax.lax.scan(step, (state, key), jnp.swapaxes(tokens_k, 0, 1))
    return state, jnp.transpose(codes, (1, 2, 0))  # (B, nq, k)


class FusedState(NamedTuple):
    tok: tokenizer_stream.TokenizerStreamState
    lm: arvc.ARVCState
    voc: Dict
    tok_ring: jax.Array  # (B, R) recent content tokens (refill history)
    code_ring: jax.Array  # (B, nq, R) recent decoded codes (refill history)
    # NOTE: the sampling PRNG key lives on the SESSION (self.key), chained
    # through _decode_vocode_inc's returned scan key — a key field here would
    # be stale dead state and a trap for snapshot/restore readers.


# NOTE: the per-chunk work is deliberately split into THREE jitted programs
# (incremental encode / LM decode / incremental vocode) instead of one fused
# program.  Empirically on the axon TPU runtime, one giant fused executable
# (tokenizer+LM+vocoder, ~550s compile) degrades EVERY subsequent dispatch in
# the process to ~25-30ms (executable thrash), while the three modest
# programs run at ~0.4-1ms each with ~0.1ms dispatch overhead.  Buffers are
# not donated for the same reason (copies are ~0.2ms and harmless).


@functools.partial(jax.jit, static_argnums=(1,))
def _encode_inc(tok_params, cfg: PipelineConfig, tok_state, tok_ring, wav_chunk,
                mel_consts):
    """Incremental encode of one chunk + token-ring update."""
    tstate, toks = tokenizer_stream.encode_stream(
        tok_params, cfg.tokenizer, tok_state, wav_chunk, mel_consts
    )
    ring = jnp.concatenate([tok_ring[:, toks.shape[1]:], toks], axis=1)
    return tstate, ring, toks


@scoped_vmem_jit(static_argnums=(2, 7))
def _decode_vocode_inc(arvc_params, voc_params, cfg: PipelineConfig, lm_state,
                       code_ring, voc_state, toks, sampling: SamplingConfig, key):
    """Merged LM decode + incremental vocode (one fewer program per chunk —
    per-program replay costs dominate on the axon relay)."""

    def step(carry, tok):
        st, kk = carry
        kk, s2 = jax.random.split(kk)
        st, codes = arvc.decode_one(arvc_params, cfg.arvc, st, tok[:, None], s2, sampling)
        return (st, kk), codes

    (lm, kk), codes = jax.lax.scan(step, (lm_state, key), jnp.swapaxes(toks, 0, 1))
    codes = jnp.transpose(codes, (1, 2, 0))
    ring = jnp.concatenate([code_ring[:, :, codes.shape[-1]:], codes], axis=-1)
    voc, wav = vocoder.decode_stream(voc_params, cfg.vocoder, voc_state, codes)
    # the advanced scan key is returned so the caller can CHAIN it as the
    # next chunk's key — a host-side jax.random.split would dispatch one
    # extra tiny device program per chunk, which on the axon relay costs as
    # much as the decode itself
    return lm, ring, voc, wav, kk


class StreamSession:
    """One real-time conversion stream.

    Usage:
        sess = StreamSession(converter, stream_cfg, ref_wavs, key=...)
        for chunk in chunks_of_2048_samples:
            out = sess.process_chunk(chunk)   # (2048 * k,) samples
    """

    def __init__(
        self,
        converter,
        scfg: Optional[StreamConfig] = None,
        ref_wavs=None,
        *,
        key: Optional[jax.Array] = None,
        sampling: Optional[SamplingConfig] = None,
        style: Optional[jax.Array] = None,
        timbre: Optional[jax.Array] = None,
        ref_tokens: Optional[jax.Array] = None,
        ref_codes: Optional[jax.Array] = None,
        incremental: bool = True,
        state_dtype=jnp.float32,
        batch: int = 1,
    ):
        self.cv = converter
        self.cfg: PipelineConfig = converter.cfg
        self.scfg = scfg or self.cfg.stream
        self.sampling = sampling or self.cfg.sampling
        self.key = jax.random.PRNGKey(0) if key is None else key
        self.spf = self.cfg.samples_per_frame
        self.delay = self.scfg.delay
        self.incremental = incremental
        self.state_dtype = state_dtype
        self.batch = batch

        # ---- prompt computation (prefill_prompt, infer_arvc.py:463-489)
        if ref_wavs is not None:
            self.key, k_spk = jax.random.split(self.key)
            style, timbre = self.cv.speaker_embeddings(
                ref_wavs if isinstance(ref_wavs, (list, tuple)) else [ref_wavs],
                self.scfg.alpha, k_spk,
            )
            cat = jnp.concatenate(
                [jnp.asarray(w) for w in
                 (ref_wavs if isinstance(ref_wavs, (list, tuple)) else [ref_wavs])]
            )[None]
            ref_codes = self.cv.audio_codes(cat)
            ref_tokens = self.cv.content_tokens(cat)
        assert ref_tokens is not None and ref_codes is not None
        mp = self.scfg.max_prompt_frames
        self.ref_tokens = ref_tokens[:, :mp]
        self.ref_codes = ref_codes[:, :, :mp]
        self.style = style
        self.timbre = timbre
        self.Tp = self.ref_tokens.shape[1]

        lm_state = _prefill_prompt(
            self.cv.arvc_params, self.cfg, self.ref_tokens, self.ref_codes,
            style, timbre, self.delay, state_dtype,
        )
        self._lm_pos_host = int(lm_state.decode.pos)
        # stash the post-prompt state for the fast (incremental) refill: the
        # ref prefix of every refill prompt is constant, so refills only need
        # to append the recent history to this state (arvc.prefill_history)
        self._base_lm = lm_state if (incremental and self.scfg.fast_refill) else None
        self._base_pos_host = self._lm_pos_host
        # background-refill shadow state: rebuilt incrementally over the last
        # buffer_frames frames before each boundary, swapped in at the
        # boundary (see _process_chunk_incremental / _finish_refill)
        self._shadow = None
        self._shadow_appended = 0

        # ---- stream caches
        k = self.scfg.decode_chunk_frames
        self.tok_ring_len = self.scfg.buffer_frames + max(self.delay, 1) + k + 8
        self.tokens_seen = 0
        self.frames_decoded = 0
        self.refill_count = 0  # prompt-refill boundaries crossed (host counter)
        self.delay_prefilled = self.delay == 0

        if incremental:
            B = batch
            self._mel_consts = tokenizer_stream.mel_consts(self.cfg.tokenizer.mel)
            self.fstate = FusedState(
                tok=tokenizer_stream.init_stream_state(
                    self.cv.tokenizer_params, self.cfg.tokenizer, B, state_dtype
                ),
                lm=lm_state,
                voc=vocoder.init_stream_state(
                    self.cv.vocoder_params, self.cfg.vocoder, B, state_dtype
                ),
                tok_ring=jnp.zeros((B, self.tok_ring_len), jnp.int32),
                code_ring=jnp.zeros(
                    (B, self.cfg.arvc.decoder.num_codebooks, self.tok_ring_len),
                    jnp.int32,
                ),
            )
        else:
            self.state = lm_state
            self.wav_window = jnp.zeros((1, self.scfg.encode_window_frames * self.spf))
            self.tok_ring = jnp.zeros((1, self.tok_ring_len), jnp.int32)
            W = self.scfg.decode_window_frames
            seed = self.ref_codes[:, :, -W:]
            pad = W - seed.shape[-1]
            if pad > 0:
                seed = jnp.concatenate(
                    [jnp.zeros_like(seed[:, :, :1]).repeat(pad, -1), seed], -1
                )
            self.code_window = seed

    # ------------------------------------------------------------------

    def transfer(self, converter, device) -> "StreamSession":
        """Return a copy of this session with all device state moved to
        `device`, using `converter` (same config, params resident there).

        Fast-start path: the one-time prep (prompt prefill, delay prefill,
        warm-up chunks) can run on the local CPU backend — no relay
        round-trips, local XLA compiles — and the live stream then continues
        on the TPU, which only ever compiles the small per-chunk programs.
        Mirrors the reference's torch.compile warm-up split
        (real-time-gui.py:1234-1274) re-expressed for a remote accelerator.
        """
        import copy as _copy

        new = _copy.copy(self)
        new.cv = converter
        # a partially-built background-refill shadow stays on the old device
        # and may be layout-incompatible — drop it; the next boundary falls
        # back to the one-shot refill and background resumes afterwards
        new._shadow, new._shadow_appended = None, 0
        # rebind the static config from the new converter: the target device
        # may use different program-selection flags (e.g. the Pallas fast
        # decoder on TPU while CPU prep ran the plain XLA scan) — state
        # pytrees are shape-identical across those flags
        new.cfg = converter.cfg
        put = lambda t: jax.device_put(t, device)
        new.key = put(self.key)
        new.ref_tokens = put(self.ref_tokens)
        new.ref_codes = put(self.ref_codes)
        if self.style is not None:
            new.style = put(self.style)
        if self.timbre is not None:
            new.timbre = put(self.timbre)
        # the LM KV-cache layout is config-dependent (flat rows for the
        # grid-pipelined slow kernel, per-head otherwise) — migrate it when
        # the target flags differ from the ones the state was built under
        dcfg = converter.cfg.arvc.decoder
        relayout = lambda st: st._replace(
            decode=dual_ar.convert_cache_layout(st.decode, dcfg))
        if self._base_lm is not None:
            new._base_lm = relayout(jax.tree.map(put, self._base_lm))
        if self.incremental:
            new._mel_consts = put(self._mel_consts)
            new.fstate = jax.tree.map(put, self.fstate)
            tok2 = tokenizer_stream.convert_enc_layout(
                new.fstate.tok, converter.tokenizer_params,
                converter.cfg.tokenizer)
            new.fstate = new.fstate._replace(
                lm=relayout(new.fstate.lm),
                tok=tok2._replace(ring=tokenizer_stream.convert_ring_layout(
                    tok2.ring, converter.cfg.tokenizer.transformer)),
                voc=vocoder.convert_head_layout(
                    new.fstate.voc, converter.cfg.vocoder.head),
            )
        else:
            new.state = relayout(jax.tree.map(put, self.state))
            new.wav_window = put(self.wav_window)
            new.tok_ring = put(self.tok_ring)
            new.code_window = put(self.code_window)
        return new

    # ------------------------------------------------------------------
    # snapshot / restore (process-portable session state)
    # ------------------------------------------------------------------

    def snapshot(self) -> dict:
        """Host-side snapshot of the full stream state: numpy pytrees plus
        host counters, picklable and process-portable.

        Pair with `restore` to move a live session across processes and
        backends.  bench.py uses this to run the one-time prep (prompt
        prefill, delay prefill, warm-up) in a JAX_PLATFORMS=cpu subprocess —
        during an axon relay outage, backend discovery in the main process
        blocks on the tunnel, so prep must not touch it (round-2 postmortem:
        BENCH_r02.json lost to exactly that).  Also usable as a stream
        checkpoint (save mid-stream, resume later)."""
        assert self.incremental, "snapshot supports incremental mode"
        tonp = lambda t: jax.tree.map(np.asarray, t)
        return {
            "attrs": dict(
                cfg=self.cfg, scfg=self.scfg, sampling=self.sampling,
                spf=self.spf, delay=self.delay, incremental=True,
                state_dtype=self.state_dtype, batch=self.batch,
                tok_ring_len=self.tok_ring_len, tokens_seen=self.tokens_seen,
                frames_decoded=self.frames_decoded,
                refill_count=self.refill_count,
                delay_prefilled=self.delay_prefilled,
                _lm_pos_host=self._lm_pos_host, Tp=self.Tp,
                _base_pos_host=self._base_pos_host,
            ),
            "arrays": dict(
                key=np.asarray(self.key),
                ref_tokens=np.asarray(self.ref_tokens),
                ref_codes=np.asarray(self.ref_codes),
                style=None if self.style is None else np.asarray(self.style),
                timbre=None if self.timbre is None else np.asarray(self.timbre),
                fstate=tonp(self.fstate),
                _mel_consts=tonp(self._mel_consts),
                _base_lm=None if self._base_lm is None else tonp(self._base_lm),
            ),
        }

    @classmethod
    def restore(cls, converter, snap: dict, device) -> "StreamSession":
        """Rebuild a session from `snapshot()` output onto `device`, bound to
        `converter` (same model geometry; program-selection flags may differ
        — the KV/ring/head layouts are migrated exactly as in `transfer`)."""
        sess = object.__new__(cls)
        sess.__dict__.update(snap["attrs"])
        sess.__dict__.setdefault("refill_count", 0)  # pre-r5 snapshots
        for k, v in snap["arrays"].items():
            setattr(sess, k, v)
        sess.cv = converter  # rebound (with layout migration) by transfer
        return sess.transfer(converter, device)

    def with_cache_rows(self, rows: int) -> "StreamSession":
        """Right-size the LM KV cache to the session's serving geometry.

        The decode step reads the FULL cache every frame (fixed-shape
        masked attention), so cache length is state traffic: at the
        default reference geometry (max_seq_len 2048) the 12-layer bf16
        cache read is 76 MB/frame/stream, while a max_seq_frames=128
        serving point never moves the position past ~260 rows.  Slicing
        the cache to `rows` divides the dominant lm_slow HBM term by
        2048/rows for every stream — the lever that makes batched
        multi-stream serving scale (each stream owns its cache; weights
        amortize across the batch, state does not).

        Position semantics are unchanged: cache slot index == absolute
        position, and every reachable position (prompt, refill window,
        delay prefill) must fit — asserted below.  Returns a copy bound
        to a converter whose decoder.max_seq_len is `rows` (programs are
        traced per static config, so the per-chunk programs recompile at
        the new shape once)."""
        import copy as _copy
        from dataclasses import replace as _drep

        k = self.scfg.decode_chunk_frames
        need = max(
            2 * self.scfg.max_seq_frames + 2 * k + 2 * self.delay + 4,
            self._lm_pos_host + 2 * k + 2,
            self._base_pos_host + 2 * self.scfg.buffer_frames
            + 2 * self.delay + 2,
            33 + 2 * self.Tp + 2 * self.delay + 2,  # prompt prefill rows
        )
        assert rows >= need, f"cache rows {rows} < reachable max {need}"
        new_cfg = _drep(self.cfg, arvc=_drep(
            self.cfg.arvc, decoder=_drep(
                self.cfg.arvc.decoder, max_seq_len=rows)))

        def cut(st):
            # both layouts — per-head (L,B,H,S,D) and flat (L,B,S,H*D) —
            # carry S at axis -2
            return st._replace(decode=st.decode._replace(
                k_cache=st.decode.k_cache[..., :rows, :],
                v_cache=st.decode.v_cache[..., :rows, :]))

        new = _copy.copy(self)
        new.cfg = new_cfg
        new.cv = _drep(self.cv, cfg=new_cfg)
        new._shadow, new._shadow_appended = None, 0
        if self.incremental:
            new.fstate = self.fstate._replace(lm=cut(self.fstate.lm))
        else:
            new.state = cut(self.state)
        if self._base_lm is not None:
            new._base_lm = cut(self._base_lm)
        return new

    def fanout(self, B: int) -> "StreamSession":
        """Clone this prepared single-stream session into a B-stream batched
        session by tiling every batch-dim state leaf on-device.

        Serving primitive for batched live conversion (runtime/realtime.py
        MultiStreamEngine): N callers anonymized to a shared target speaker
        reuse ONE prompt prefill — the clone costs a single tiling program
        instead of a B-sized prompt prefill compile + B reference encodes.
        Per-stream references remain fully supported by constructing the
        session with batched refs (tests/test_multistream.py); the compute
        cost per chunk is identical either way.

        The batch axis of each leaf is identified structurally: against a
        `jax.eval_shape` template of the B-stream state, exactly one axis
        differs (1 -> B) for batched leaves and none for shared leaves
        (positions, counters)."""
        assert self.incremental and self.batch == 1, "fanout needs a 1-stream incremental session"
        import copy as _copy

        # the packed Pallas layouts (ConvNeXt stem, HiFiGAN head) are
        # B=1-only — normalize the live state to the batch-generic layout
        # before tiling (same converters StreamSession.transfer uses)
        fs0 = self.fstate._replace(
            tok=tokenizer_stream.convert_enc_layout(
                self.fstate.tok, self.cv.tokenizer_params, self.cfg.tokenizer,
                target_batch=B),
            voc=vocoder.convert_head_layout(
                self.fstate.voc, self.cfg.vocoder.head, target_batch=B),
        )

        def tok_template():
            st = tokenizer_stream.init_stream_state(
                self.cv.tokenizer_params, self.cfg.tokenizer, B,
                self.state_dtype)
            st = tokenizer_stream.convert_enc_layout(
                st, self.cv.tokenizer_params, self.cfg.tokenizer,
                target_batch=B)
            return st._replace(ring=tokenizer_stream.convert_ring_layout(
                st.ring, self.cfg.tokenizer.transformer))

        def voc_template():
            return vocoder.convert_head_layout(
                vocoder.init_stream_state(
                    self.cv.vocoder_params, self.cfg.vocoder, B,
                    self.state_dtype),
                self.cfg.vocoder.head, target_batch=B)

        templates = {
            "tok": jax.eval_shape(tok_template),
            "voc": jax.eval_shape(voc_template),
            "lm": jax.eval_shape(
                lambda rt, rc, s, t: arvc.prefill_prompt(
                    self.cv.arvc_params, self.cfg.arvc, rt, rc, s, t,
                    delay=self.delay, cache_dtype=self.state_dtype),
                jax.ShapeDtypeStruct((B, self.Tp), self.ref_tokens.dtype),
                jax.ShapeDtypeStruct((B,) + self.ref_codes.shape[1:],
                                     self.ref_codes.dtype),
                None if self.style is None else jax.ShapeDtypeStruct(
                    (B,) + self.style.shape[1:], self.style.dtype),
                None if self.timbre is None else jax.ShapeDtypeStruct(
                    (B,) + self.timbre.shape[1:], self.timbre.dtype)),
        }

        def tile_like(tree, tgt):
            def leaf(x, t):
                if tuple(x.shape) == tuple(t.shape):
                    return x
                diff = [i for i, (a, b) in enumerate(zip(x.shape, t.shape))
                        if a != b]
                assert (len(x.shape) == len(t.shape) and len(diff) == 1
                        and x.shape[diff[0]] == 1
                        and t.shape[diff[0]] == B), (x.shape, t.shape)
                return jnp.repeat(x, B, axis=diff[0])
            return jax.tree.map(leaf, tree, tgt)

        rep0 = lambda x: None if x is None else jnp.repeat(x, B, axis=0)
        new = _copy.copy(self)
        new.batch = B
        new._shadow, new._shadow_appended = None, 0
        new.ref_tokens = rep0(self.ref_tokens)
        new.ref_codes = rep0(self.ref_codes)
        new.style = rep0(self.style)
        new.timbre = rep0(self.timbre)
        tile_all = jax.jit(lambda fs, base: (
            FusedState(
                tok=tile_like(fs.tok, templates["tok"]),
                lm=tile_like(fs.lm, templates["lm"]),
                voc=tile_like(fs.voc, templates["voc"]),
                tok_ring=jnp.repeat(fs.tok_ring, B, axis=0),
                code_ring=jnp.repeat(fs.code_ring, B, axis=0),
            ),
            None if base is None else tile_like(base, templates["lm"]),
        ))
        new.fstate, new._base_lm = tile_all(fs0, self._base_lm)
        return new

    def _lm_state(self):
        return self.fstate.lm if self.incremental else self.state

    def _lm_pos(self) -> int:
        return int(self._lm_state().decode.pos)

    @property
    def truncation_count(self) -> int:
        """Cumulative nucleus-truncation events (windowed top-p filter whose
        top-k window held < top_p mass — see ops/sampling.sample_token).
        Nonzero means sampled distributions were silently clipped; switch to
        top_k_window=0 for the exact filter.  Carried as data in the decode
        state so it works on callback-free backends; reading it is one host
        fetch (~25 ms on the axon relay) — call it from stats paths, not the
        per-chunk hot loop."""
        return int(self._lm_state().decode.trunc)

    def process_chunk(self, chunk: np.ndarray) -> np.ndarray:
        if self.incremental:
            out = np.asarray(self._process_chunk_incremental(chunk)[0])
            return out[0] if self.batch == 1 else out
        return self._process_chunk_window(chunk)

    def process_chunk_async(self, chunk: np.ndarray) -> "jax.Array":
        """Dispatch one chunk and return the output wav as a DEVICE array
        without any host synchronization.

        On the axon runtime a host fetch of a freshly-dispatched chained
        program pays a fixed ~25 ms penalty, while dispatches themselves cost
        ~2 ms; fetching from a separate thread (runtime/realtime.py) overlaps
        that latency so sustained throughput is dispatch-bound.  Returns
        (2048*k,) samples (zeros during the delay-fill phase)."""
        assert self.incremental, "async path requires incremental mode"
        wav = self._process_chunk_incremental(chunk)[0]
        return wav[0] if self.batch == 1 else wav

    # ------------------------------------------------------------------
    # incremental mode
    # ------------------------------------------------------------------

    def _process_chunk_incremental(self, chunk):
        """Returns (wav (n,) device array, used_lm: bool)."""
        k = self.scfg.decode_chunk_frames
        n = k * self.spf
        chunk = jnp.asarray(chunk).reshape(self.batch, n)

        tstate, ring, toks = _encode_inc(
            self.cv.tokenizer_params, self.cfg, self.fstate.tok,
            self.fstate.tok_ring, chunk, self._mel_consts,
        )
        self.fstate = self.fstate._replace(tok=tstate, tok_ring=ring)
        self.tokens_seen += k

        if self.tokens_seen <= self.delay or not self.delay_prefilled:
            if self.tokens_seen >= self.delay and not self.delay_prefilled:
                lm = _prefill_delay(
                    self.cv.arvc_params, self.cfg, self.fstate.lm,
                    self.fstate.tok_ring[:, -self.delay :], self.delay,
                )
                self.fstate = self.fstate._replace(lm=lm)
                self._lm_pos_host += 2 * self.delay - 1
                self.delay_prefilled = True
            return jnp.zeros((self.batch, n), jnp.float32), False

        lm, code_ring, voc, wav, self.key = _decode_vocode_inc(
            self.cv.arvc_params, self.cv.vocoder_params, self.cfg,
            self.fstate.lm, self.fstate.code_ring, self.fstate.voc, toks,
            self.sampling, self.key,
        )
        self.fstate = self.fstate._replace(lm=lm, code_ring=code_ring, voc=voc)
        self.frames_decoded += k
        # refill scheduling is deterministic: pos advances 2 per frame from a
        # known start, so track it host-side without any device sync
        self._lm_pos_host += 2 * k
        r = self._lm_pos_host // 2
        msf = self.scfg.max_seq_frames
        b = self.scfg.buffer_frames
        if (self._base_lm is not None and self.scfg.background_refill
                and b % k == 0):
            # background refill: the swap position r_swap is deterministic
            # (first r + m*k >= msf); chunks whose end position r satisfies
            # r_swap - r < b are the refill window — append THIS chunk's k
            # (content, code) pairs to the shadow state so the boundary
            # chunk only swaps (+ delay prefill), never runs a b-frame
            # prefill on the hot path
            rem = msf - r
            in_window = rem <= 0 or (-(-rem // k)) * k < b
            if in_window:
                if self._shadow is None:
                    self._shadow, self._shadow_appended = self._base_lm, 0
                self._shadow = _prefill_history(
                    self.cv.arvc_params, self.cfg, self._shadow,
                    self._recent_tokens(k), self._recent_codes(k), self.delay,
                )
                self._shadow_appended += k
            elif self._shadow is not None:
                # window abandoned (max_seq_frames changed mid-window)
                self._shadow, self._shadow_appended = None, 0
        if r >= msf:
            self._finish_refill()
        return wav, True

    def _finish_refill(self):
        """Boundary chunk: install the refilled LM state.  If the background
        shadow holds exactly buffer_frames appended pairs it IS the refilled
        state (prefill_history chains, so group-by-group appends equal the
        one-shot b-frame append) — swap it in with only the delay prefill
        left to dispatch.  Otherwise (first boundary after a config change,
        misaligned chunking, background disabled) fall back to the one-shot
        refill."""
        self.refill_count += 1
        b = self.scfg.buffer_frames
        if self._shadow is not None and self._shadow_appended == b:
            lm = self._shadow
            self._lm_pos_host = self._base_pos_host + 2 * b
            if self.delay > 0:
                lm = _prefill_delay(
                    self.cv.arvc_params, self.cfg, lm,
                    self.fstate.tok_ring[:, -self.delay :], self.delay,
                )
                self._lm_pos_host += 2 * self.delay - 1
            self.fstate = self.fstate._replace(lm=lm)
        else:
            self._refill_incremental()
        self._shadow, self._shadow_appended = None, 0

    def warm_refill_programs(self):
        """Compile every program a refill boundary can dispatch (one-shot
        fast/monolithic refill, the background per-chunk history append, the
        delay prefill) against throwaway state — so no boundary on the live
        hot path ever pays a compile.  bench.py calls this after warm-up."""
        saved = (self.fstate, self._lm_pos_host, self._shadow,
                 self._shadow_appended)
        try:
            self._refill_incremental()
            jax.block_until_ready(self.fstate.lm)
            if self._base_lm is not None and self.scfg.background_refill:
                k = self.scfg.decode_chunk_frames
                sh = _prefill_history(
                    self.cv.arvc_params, self.cfg, self._base_lm,
                    self._recent_tokens(k), self._recent_codes(k), self.delay,
                )
                jax.block_until_ready(sh.decode.k_cache)
        finally:
            (self.fstate, self._lm_pos_host, self._shadow,
             self._shadow_appended) = saved

    def _refill_incremental(self):
        b = self.scfg.buffer_frames
        if self._base_lm is not None:
            # fast path: one small fixed-shape dispatch (2b [+2d-1] rows)
            # against the stashed post-prompt state — no full-prompt prefill,
            # no device sync; the position trajectory stays deterministic
            lm = _prefill_history(
                self.cv.arvc_params, self.cfg, self._base_lm,
                self._recent_tokens(b), self._recent_codes(b), self.delay,
            )
            self._lm_pos_host = self._base_pos_host + 2 * b
        else:
            lm = _prefill_prompt(
                self.cv.arvc_params, self.cfg,
                jnp.concatenate([self.ref_tokens, self._recent_tokens(b)], axis=-1),
                jnp.concatenate([self.ref_codes, self._recent_codes(b)], axis=-1),
                self.style, self.timbre, self.delay, self.state_dtype,
            )
            self._lm_pos_host = self._base_pos_host + 2 * b
        if self.delay > 0:
            lm = _prefill_delay(
                self.cv.arvc_params, self.cfg, lm,
                self.fstate.tok_ring[:, -self.delay :], self.delay,
            )
            self._lm_pos_host += 2 * self.delay - 1
        self.fstate = self.fstate._replace(lm=lm)

    def _recent_tokens(self, b):
        if self.delay > 0:
            return self.fstate.tok_ring[:, -b - self.delay : -self.delay]
        return self.fstate.tok_ring[:, -b:]

    def _recent_codes(self, b):
        return self.fstate.code_ring[:, :, -b:]

    # ------------------------------------------------------------------
    # window (reference-faithful) mode
    # ------------------------------------------------------------------

    def _process_chunk_window(self, chunk) -> np.ndarray:
        k = self.scfg.decode_chunk_frames
        n = k * self.spf
        chunk = jnp.asarray(chunk).reshape(1, n)

        self.wav_window = jnp.concatenate([self.wav_window[:, n:], chunk], axis=1)
        toks = _encode_window(self.cv.tokenizer_params, self.cfg, self.wav_window)
        new_toks = toks[:, -k:]
        self.tok_ring = jnp.concatenate([self.tok_ring[:, k:], new_toks], axis=1)
        self.tokens_seen += k

        if self.tokens_seen < self.delay:
            return np.zeros(n, np.float32)
        if not self.delay_prefilled:
            self.state = _prefill_delay(
                self.cv.arvc_params, self.cfg, self.state,
                self.tok_ring[:, -self.delay :], self.delay,
            )
            self.delay_prefilled = True
            return np.zeros(n, np.float32)

        self.key, sub = jax.random.split(self.key)
        self.state, codes_k = _decode_frames(
            self.cv.arvc_params, self.cfg, self.state, new_toks, sub,
            self.sampling, k,
        )
        self.code_window = jnp.concatenate(
            [self.code_window[:, :, k:], codes_k], axis=-1
        )
        self.frames_decoded += k

        if self._lm_pos() // 2 >= self.scfg.max_seq_frames:
            self._refill_window()

        wav = _vocode_window(self.cv.vocoder_params, self.cfg, self.code_window)
        return np.asarray(wav[0, -n:])

    def _refill_window(self):
        self.refill_count += 1
        b = self.scfg.buffer_frames
        ext_codes = jnp.concatenate(
            [self.ref_codes, self.code_window[:, :, -b:]], axis=-1
        )
        if self.delay > 0:
            tok_hist = self.tok_ring[:, -b - self.delay : -self.delay]
        else:
            tok_hist = self.tok_ring[:, -b:]
        ext_tokens = jnp.concatenate([self.ref_tokens, tok_hist], axis=-1)
        self.state = _prefill_prompt(
            self.cv.arvc_params, self.cfg, ext_tokens, ext_codes,
            self.style, self.timbre, self.delay, jnp.float32,
        )
        if self.delay > 0:
            self.state = _prefill_delay(
                self.cv.arvc_params, self.cfg, self.state,
                self.tok_ring[:, -self.delay :], self.delay,
            )

    # ------------------------------------------------------------------

    def stream_file(self, src_wav: np.ndarray) -> np.ndarray:
        """Simulated streaming over a file (stream_infer, :598-689)."""
        k = self.scfg.decode_chunk_frames
        n = k * self.spf
        pad = (-len(src_wav)) % n
        src = np.pad(src_wav, (pad, 0))
        outs = [self.process_chunk(src[i : i + n]) for i in range(0, len(src), n)]
        return np.concatenate(outs)
