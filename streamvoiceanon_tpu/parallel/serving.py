"""Batched / data-parallel offline conversion (BASELINE config 4-5).

Utterances are bucketed by frame length, padded to the bucket size, and the
whole [tokenize -> generate -> vocode] pipeline runs jitted with the batch
axis sharded over the mesh 'data' axis; model params are replicated (or LM
matmuls sharded over 'model').  Multi-host: same code under
jax.distributed.initialize with per-host batch shards.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.config import PipelineConfig, SamplingConfig
from streamvoiceanon_tpu.models import arvc, tokenizer, vocoder
from streamvoiceanon_tpu.parallel import mesh as meshlib


def bucket_by_frames(
    lengths: Sequence[int], bucket_sizes: Sequence[int]
) -> Dict[int, List[int]]:
    """Groups utterance indices into the smallest bucket >= their frame
    length (padding/bucketing, BASELINE config 4)."""
    out: Dict[int, List[int]] = {b: [] for b in bucket_sizes}
    for i, L in enumerate(lengths):
        for b in bucket_sizes:
            if L <= b:
                out[b].append(i)
                break
        else:
            raise ValueError(f"utterance of {L} frames exceeds largest bucket")
    return {b: idx for b, idx in out.items() if idx}


@functools.partial(jax.jit, static_argnums=(1, 7, 8, 9))
def _convert_batch(
    params: Tuple,
    cfg: PipelineConfig,
    src_wavs,  # (B, T) padded to bucket
    ref_tokens,  # (B, Tr)
    ref_codes,  # (B, nq, Tr)
    style,  # (B, 192)
    timbre,  # (B, 32, 128)
    sampling: SamplingConfig,
    delay: int,
    cache_dtype=jnp.float32,
    key=None,
):
    tok_params, arvc_params, voc_params = params
    src_tokens = tokenizer.encode(tok_params, cfg.tokenizer, src_wavs)
    key = jax.random.PRNGKey(0) if key is None else key
    codes = arvc.generate(
        arvc_params, cfg.arvc, ref_tokens, ref_codes, src_tokens,
        style, timbre, key, sampling, delay,
        cache_dtype=cache_dtype,
        # right-size the KV cache to the bucket: cache reads dominate the
        # decode scan's HBM traffic and the full 2048-row reference
        # geometry OOMs at batch 128 (2x12-layer f32 caches alone)
        auto_cache_rows=True,
    )
    return vocoder.decode(voc_params, cfg.vocoder, codes)


class BatchServer:
    """Data-parallel conversion server over a device mesh.

    Multi-host: pass the global mesh (after jax.distributed.initialize) —
    every host must hold the same full input batch (deterministic stream
    split or host broadcast); shards are uploaded host-locally and the
    output is allgathered back to every host (SURVEY §7 step 8 / BASELINE
    config 5, replacing the reference's single-GPU-only serving)."""

    def __init__(self, converter, n_model: int = 1, mesh=None):
        self.cv = converter
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(n_model=n_model)
        self._multihost = any(
            d.process_index != jax.process_index()
            for d in self.mesh.devices.flat
        )
        specs = jax.tree.map(lambda _: meshlib.P(), converter.arvc_params)
        specs["model"] = meshlib.dual_ar_param_specs(converter.arvc_params["model"])
        self.params = (
            meshlib.replicate(converter.tokenizer_params, self.mesh),
            meshlib.shard_params(converter.arvc_params, self.mesh, specs),
            meshlib.replicate(converter.vocoder_params, self.mesh),
        )

    def convert(
        self,
        src_wavs: np.ndarray,  # (B, T) same-bucket batch
        ref_tokens,
        ref_codes,
        style,
        timbre,
        *,
        sampling: SamplingConfig = SamplingConfig(),
        delay: int = 2,
        cache_dtype=jnp.float32,
        key=None,
    ) -> np.ndarray:
        """cache_dtype: decode KV-cache precision.  f32 (default) is
        bit-identical to the unbatched generate path; bf16 halves the
        dominant cache-read HBM term (the same precision the live serving
        path runs with, accuracy-gated in benchmarks/bf16_accuracy.py) —
        worth ~1.2x throughput at large batch (BENCH.md)."""
        B = src_wavs.shape[0]
        n_data = self.mesh.shape["data"]
        # keep inputs HOST-LOCAL (numpy) until the sharded device_put: a
        # premature jnp.asarray commits them to one local device, which
        # cannot be resharded onto a mesh spanning other processes
        tree = {
            "src": np.asarray(src_wavs),
            "rt": np.asarray(ref_tokens),
            "rc": np.asarray(ref_codes),
            "st": np.asarray(style),
            "tb": np.asarray(timbre),
        }
        if B % n_data == 0:
            batch = meshlib.shard_batch(tree, self.mesh)
        else:  # ragged remainder batch: run replicated
            batch = meshlib.replicate(tree, self.mesh)
        with self.mesh:
            wav = _convert_batch(
                self.params, self.cv.cfg, batch["src"], batch["rt"], batch["rc"],
                batch["st"], batch["tb"], sampling, delay,
                jnp.dtype(cache_dtype), key,
            )
        if not wav.is_fully_addressable:  # gather remote shards to every host
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(wav, tiled=True))
        return np.asarray(wav)
