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
