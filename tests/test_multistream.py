"""Batched multi-stream session must reproduce independent single streams."""

import numpy as np

import jax
import jax.numpy as jnp

import tinymodels
from streamvoiceanon_tpu.config import SamplingConfig, StreamConfig
from streamvoiceanon_tpu.runtime.streaming import StreamSession

SPF = 2048
GREEDY = SamplingConfig(greedy=True)


def test_two_streams_equal_two_sessions(rng):
    cv = tinymodels.tiny_converter()
    delay, Ls, Tr = 1, 6, 4
    scfg = StreamConfig(max_prompt_frames=32, max_seq_frames=10_000,
                        buffer_frames=4, decode_chunk_frames=1, delay=delay)

    refs = [(rng.standard_normal(Tr * SPF) * 0.1).astype(np.float32) for _ in range(2)]
    srcs = [(rng.standard_normal(Ls * SPF) * 0.1).astype(np.float32) for _ in range(2)]
    ref_tokens = [cv.content_tokens(jnp.asarray(r)[None]) for r in refs]
    ref_codes = [cv.audio_codes(jnp.asarray(r)[None]) for r in refs]
    styles = [jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32)) for _ in range(2)]
    timbres = [jnp.asarray(rng.standard_normal((1, 32, 128)).astype(np.float32)) for _ in range(2)]

    # two independent sessions
    singles = []
    for i in range(2):
        sess = StreamSession(
            cv, scfg, key=jax.random.PRNGKey(1), sampling=GREEDY,
            style=styles[i], timbre=timbres[i],
            ref_tokens=ref_tokens[i], ref_codes=ref_codes[i],
        )
        outs = [sess.process_chunk(srcs[i][t * SPF : (t + 1) * SPF]) for t in range(Ls)]
        singles.append(np.concatenate(outs))

    # one batched session
    sess2 = StreamSession(
        cv, scfg, key=jax.random.PRNGKey(1), sampling=GREEDY,
        style=jnp.concatenate(styles), timbre=jnp.concatenate(timbres),
        ref_tokens=jnp.concatenate(ref_tokens), ref_codes=jnp.concatenate(ref_codes),
        batch=2,
    )
    outs = []
    for t in range(Ls):
        chunk = np.stack([s[t * SPF : (t + 1) * SPF] for s in srcs])
        outs.append(sess2.process_chunk(chunk))
    batched = np.concatenate(outs, axis=-1)

    np.testing.assert_allclose(batched[0], singles[0], atol=2e-4)
    np.testing.assert_allclose(batched[1], singles[1], atol=2e-4)


def test_fanout_equals_direct_batched(rng):
    """fanout(B) of a prepared 1-stream session must continue exactly like a
    directly-built B-stream session with the same reference and history —
    the serving primitive bench.py's multistream phase is built on."""
    cv = tinymodels.tiny_converter()
    delay, Tr, B = 2, 4, 3
    scfg = StreamConfig(max_prompt_frames=32, max_seq_frames=10_000,
                        buffer_frames=4, decode_chunk_frames=1, delay=delay)
    ref = (rng.standard_normal(Tr * SPF) * 0.1).astype(np.float32)
    ref_tokens = cv.content_tokens(jnp.asarray(ref)[None])
    ref_codes = cv.audio_codes(jnp.asarray(ref)[None])
    style = jnp.asarray(rng.standard_normal((1, 192)), jnp.float32)
    timbre = jnp.asarray(rng.standard_normal((1, 32, 128)), jnp.float32)

    warm = (rng.standard_normal((delay + 3) * SPF) * 0.1).astype(np.float32)
    src = (rng.standard_normal((B, 6 * SPF)) * 0.1).astype(np.float32)

    mk = lambda b: StreamSession(
        cv, scfg, key=jax.random.PRNGKey(1), sampling=GREEDY,
        style=jnp.repeat(style, b, 0), timbre=jnp.repeat(timbre, b, 0),
        ref_tokens=jnp.repeat(ref_tokens, b, 0),
        ref_codes=jnp.repeat(ref_codes, b, 0), batch=b)

    # path A: B=1 prep (prompt + warm chunks), then fanout
    s1 = mk(1)
    for t in range(delay + 3):
        s1.process_chunk(warm[t * SPF:(t + 1) * SPF])
    sf = s1.fanout(B)

    # path B: direct B-stream session fed the same warm history per stream
    sb = mk(B)
    for t in range(delay + 3):
        sb.process_chunk(np.repeat(warm[None, t * SPF:(t + 1) * SPF], B, 0))

    got, want = [], []
    for t in range(6):
        chunk = src[:, t * SPF:(t + 1) * SPF]
        got.append(np.asarray(sf.process_chunk(chunk)))
        want.append(np.asarray(sb.process_chunk(chunk)))
    got, want = np.concatenate(got, -1), np.concatenate(want, -1)
    assert float(np.abs(want).max()) > 0
    np.testing.assert_allclose(got, want,
                               atol=float(np.abs(want).max()) * 1e-5, rtol=0)


def test_with_cache_rows_exact_continuation(rng):
    """Right-sizing the LM KV cache (with_cache_rows) must not change the
    stream: rows beyond every reachable position are fully masked, so the
    sliced-cache session continues exactly like the full-cache one —
    including across refill boundaries."""
    cv = tinymodels.tiny_converter()
    delay, Tr = 2, 4
    scfg = StreamConfig(max_prompt_frames=32, max_seq_frames=24,
                        buffer_frames=4, decode_chunk_frames=1, delay=delay)
    ref = (rng.standard_normal(Tr * SPF) * 0.1).astype(np.float32)
    sess = StreamSession(
        cv, scfg, key=jax.random.PRNGKey(1), sampling=GREEDY,
        style=jnp.asarray(rng.standard_normal((1, 192)), jnp.float32),
        timbre=jnp.asarray(rng.standard_normal((1, 32, 128)), jnp.float32),
        ref_tokens=cv.content_tokens(jnp.asarray(ref)[None]),
        ref_codes=cv.audio_codes(jnp.asarray(ref)[None]))

    warm = (rng.standard_normal(6 * SPF) * 0.1).astype(np.float32)
    for t in range(6):
        sess.process_chunk(warm[t * SPF:(t + 1) * SPF])

    small = sess.with_cache_rows(96)
    assert small.cfg.arvc.decoder.max_seq_len == 96
    assert small.fstate.lm.decode.k_cache.shape[-2] == 96

    n = 30  # crosses several refill boundaries at max_seq_frames=24
    src = (rng.standard_normal(n * SPF) * 0.1).astype(np.float32)
    r0 = sess.refill_count
    got, want = [], []
    for t in range(n):
        chunk = src[t * SPF:(t + 1) * SPF]
        want.append(np.asarray(sess.process_chunk(chunk)))
        got.append(np.asarray(small.process_chunk(chunk)))
    got, want = np.concatenate(got), np.concatenate(want)
    assert sess.refill_count > r0, "run must cross refill boundaries"
    assert small.refill_count == sess.refill_count
    assert float(np.abs(want).max()) > 0
    np.testing.assert_allclose(got, want,
                               atol=float(np.abs(want).max()) * 1e-5, rtol=0)
