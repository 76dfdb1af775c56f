"""Pallas TPU kernel: VMEM-resident fast-codebook decoder.

The dual-AR LM's fast transformer autoregresses over the 8 codec codebooks of
every frame (reference modules/dual_ar_stream.py:540-602, 1197-1217).  As a
lax.scan of 8 steps x 4 layers in XLA, each step re-reads every fast-layer
weight from HBM: ~8 x 61 MB = ~490 MB of weight traffic per frame — the
dominant cost of the LM decode stage (~2.2 ms of the ~3.2 ms chunk floor
measured by benchmarks/stage_floor.py).

This kernel runs the ENTIRE 8-step loop in one invocation with all fast-layer
weights resident in VMEM (4 layers x ~15.3 MB bf16 = ~61 MB, well under the
v5e's 128 MB), so weights stream from HBM exactly once per frame.  Everything
the loop needs lives in-kernel:

* flat-lane attention: activations stay (1, dim) the whole time — per-head
  score/mix reductions are expressed with constant one-hot "segment" matmuls
  (G: (dim, n_head)) instead of (head, head_dim) reshapes, which Mosaic
  relayouts poorly;
* RoPE on interleaved (even, odd) pairs via a constant pair-rotation matrix
  (x*cos + (x@R)*sin), matching ops/rope.apply_rope bit-for-bit in f32;
* the KV "cache" is a tiny VMEM scratch (L, 8, dim) — the reference zeroes
  the fast cache every frame (dual_ar_stream.py:1197-1205), here it is simply
  overwritten slot by slot;
* sampling is the reference's EXACT full-vocab nucleus filter
  (dual_ar_stream.py:1099-1132: top-p mask -> temperature -> softmax ->
  multinomial): the kept set {i : sum of probs strictly above p_i <= top_p}
  is found by 40-step bisection on the probability threshold (a decreasing
  step function — cheap VPU reductions over the 1024-lane logit row), and
  the multinomial is a Gumbel-max race with noise pre-generated OUTSIDE the
  kernel (keys split exactly like the XLA path with top_k_window=0), so
  kernel and XLA sampling agree token-for-token.  The only divergence is at
  exact logit ties on the nucleus boundary: a sort keeps part of the tied
  group, the threshold keeps all of it (measure-zero in f32; possible with
  bf16 logits, and harmless — slightly higher entropy at the boundary).

Gotcha the wrapper handles: Mosaic wants 128-lane-aligned shapes, so the
codebook vocabulary (1000) is padded to 1024 with -inf logits.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from streamvoiceanon_tpu.ops.pallas_common import (  # shared kernel helpers
    NEG_INF as _NEG_INF,
    SMEM as _SMEM,
    VMEM as _MEM,
    dot as _dot,
    dotf as _dotf,
    pltpu,
    rms as _rms,
)

from streamvoiceanon_tpu.ops.rope import precompute_freqs_cis



def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _fast_decode_kernel(
    # inputs (per-batch blocks first, then resident weights)
    hid_ref,  # (1, dim)
    gum_ref,  # (1, nq, Vp) f32
    wqkv_ref,  # (L, dim, 3*dim)
    wo_ref,  # (L, dim, dim)
    w1_ref,  # (L, dim, inter)
    w3_ref,  # (L, dim, inter)
    w2_ref,  # (L, inter, dim)
    anorm_ref,  # (L, dim)
    fnorm_ref,  # (L, dim)
    outnorm_ref,  # (1, dim)
    wout_ref,  # (dim, Vp)
    emb_ref,  # (Vp, dim)
    cbemb_ref,  # (nq, vocab, mdim) — next-frame table, HBM-resident (ANY)
    cos_ref,  # (nq, dim) f32 — per-position cos, pair-expanded + head-tiled
    sin_ref,  # (nq, dim) f32
    codes_ref,  # out: (1, nq) int32
    aemb_ref,  # out: (1, mdim) — sum of the sampled codes' embeddings
    kc_ref,  # scratch: (L, nq, dim)
    vc_ref,  # scratch: (L, nq, dim)
    cbrow_ref,  # scratch: (8, mdim) — DMA landing block for cbemb gathers
    csem_ref,  # scratch: DMA semaphore
    *,
    n_layer: int,
    nq: int,
    dim: int,
    n_head: int,
    head_dim: int,
    vocab: int,
    norm_eps: float,
    temperature: float,
    top_p: float,
    greedy: bool,
):
    f32 = jnp.float32
    vp = wout_ref.shape[-1]
    inv_scale = 1.0 / np.sqrt(head_dim)

    # constant structure matrices (VPU iota builds, hoisted by the compiler)
    d0 = jax.lax.broadcasted_iota(jnp.int32, (dim, n_head), 0)
    h1 = jax.lax.broadcasted_iota(jnp.int32, (dim, n_head), 1)
    seg = (d0 // head_dim == h1).astype(f32)  # (dim, n_head) one-hot segments
    segT = jnp.transpose(seg)  # (n_head, dim)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, vp), 1)
    in_vocab = col < vocab

    # pair rotation rp[2i] = -x[2i+1], rp[2i+1] = x[2i] as a constant
    # permutation-sign matmul (measured faster than pltpu.roll lane rolls,
    # which trigger relayouts: 0.64 vs 0.75 ms/frame on v5e)
    rj = jax.lax.broadcasted_iota(jnp.int32, (dim, dim), 0)
    rc = jax.lax.broadcasted_iota(jnp.int32, (dim, dim), 1)
    rot = ((rj % 2 == 0) & (rc == rj + 1)).astype(f32) - (
        (rj % 2 == 1) & (rc == rj - 1)
    ).astype(f32)

    def rotate_pairs(x32: jax.Array) -> jax.Array:
        return jax.lax.dot_general(
            x32, rot, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    def rope(x32: jax.Array, s: int) -> jax.Array:
        c = cos_ref[s, :][None, :]
        sn = sin_ref[s, :][None, :]
        return x32 * c + rotate_pairs(x32) * sn

    x = hid_ref[...]  # (1, dim), weight dtype
    wd = x.dtype

    for s in range(nq):
        h = x
        for l in range(n_layer):
            # --- attention ---
            hn = _rms(h, anorm_ref[l, :][None, :], norm_eps)
            qkv = _dot(hn, wqkv_ref[l])  # (1, 3*dim)
            q32 = qkv[:, :dim].astype(f32)
            k32 = qkv[:, dim : 2 * dim].astype(f32)
            v = qkv[:, 2 * dim :]
            qr = rope(q32, s)
            kr = rope(k32, s)

            # step 0 zeroes the slots: uninitialized scratch rows > s would
            # poison the value mix through 0 * NaN; the slot write itself is a
            # static-index row store (s is a Python int in this unrolled loop)
            if s == 0:
                kc_ref[l] = jnp.zeros((nq, dim), kc_ref.dtype)
                vc_ref[l] = jnp.zeros((nq, dim), vc_ref.dtype)
            kc_ref[l, s : s + 1, :] = kr.astype(kc_ref.dtype)
            vc_ref[l, s : s + 1, :] = v.astype(vc_ref.dtype)
            kcache = kc_ref[l]
            vcache = vc_ref[l]

            # per-head scores via segment matmul: (nq, dim) -> (nq, n_head)
            prod = qr * kcache.astype(f32)  # broadcast (1,dim)*(nq,dim)
            scores = (
                jax.lax.dot_general(
                    prod, seg, (((1,), (0,)), ((), ())), preferred_element_type=f32
                )
                * inv_scale
            )
            srow = jax.lax.broadcasted_iota(jnp.int32, (nq, n_head), 0)
            scores = jnp.where(srow <= s, scores, _NEG_INF)
            w = jax.nn.softmax(scores, axis=0)  # (nq, n_head) f32
            wexp = jax.lax.dot_general(
                w, segT, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )  # (nq, dim)
            attn = jnp.sum(wexp * vcache.astype(f32), axis=0, keepdims=True)
            h = h + _dot(attn.astype(wd), wo_ref[l])

            # --- SwiGLU FFN ---
            fn = _rms(h, fnorm_ref[l, :][None, :], norm_eps)
            a = _dot(fn, w1_ref[l]).astype(f32)
            # silu in f32: Mosaic mis-verifies jax.nn.silu's scalar broadcast
            # on bf16 vectors ('vector.broadcast' element-type mismatch)
            silu = a / (1.0 + jnp.exp(-a))
            gate = silu.astype(wd) * _dot(fn, w3_ref[l])
            h = h + _dot(gate.astype(wd), w2_ref[l])

        # --- head + sampling ---
        y = _rms(h, outnorm_ref[...], norm_eps)
        logits = _dot(y, wout_ref[...]).astype(f32)  # (1, Vp), wd-rounded like XLA
        logits = jnp.where(in_vocab, logits, _NEG_INF)

        if greedy:
            race = logits
        elif top_p < 1.0:
            m = jnp.max(logits)
            e = jnp.where(in_vocab, jnp.exp(logits - m), 0.0)
            probs = e / jnp.sum(e)

            def bis(_, lohi):
                lo, hi = lohi
                mid = (lo + hi) * 0.5
                mass = jnp.sum(jnp.where(probs > mid, probs, 0.0))
                kept = mass <= top_p
                return (jnp.where(kept, lo, mid), jnp.where(kept, mid, hi))

            lo, _ = jax.lax.fori_loop(0, 40, bis, (jnp.float32(0.0), jnp.float32(1.0)))
            filtered = jnp.where(probs > lo, logits, _NEG_INF)
            race = filtered / max(temperature, 1e-5) + gum_ref[0, s, :][None, :]
        else:
            race = logits / max(temperature, 1e-5) + gum_ref[0, s, :][None, :]

        best = jnp.max(race)
        # codes_ref lives in SMEM: Mosaic requires SCALAR stores there
        # ("Can only store scalars to SMEM") — the keepdims block-store form
        # is only needed for VMEM outputs (see pallas_slow_decode epilogue).
        code = jnp.min(jnp.where(race == best, col, vp)).astype(jnp.int32)
        codes_ref[0, s] = code

        onehot = (col == code).astype(wd)  # (1, Vp)
        x = _dot(onehot, emb_ref[...])  # (1, dim)

        # next-frame audio embedding: sum of per-codebook rows
        # (models/dual_ar.embed_codes, reference dual_ar_stream.py:245-255).
        # The table stays in HBM and only the aligned 8-row block holding the
        # sampled code is DMA'd in (~12 KB; HBM sublane slices must be 8-row
        # tile-aligned), instead of holding a VMEM-padded (nq, Vp, mdim)
        # copy: that 16 MB operand was double-buffered per scan iteration by
        # XLA and blew the 16 MB scoped-vmem stack inside serving loops, and
        # the one-hot gather matmul it fed read the whole 16 MB each frame.
        code8 = (code // 8) * 8
        copy = pltpu.make_async_copy(
            cbemb_ref.at[s, pl.ds(code8, 8), :], cbrow_ref, csem_ref)
        copy.start()
        copy.wait()
        sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
               == code - code8).astype(wd)
        contrib = _dot(sel, cbrow_ref[...])  # (1, mdim), weight dtype
        aemb = contrib if s == 0 else aemb + contrib

    aemb_ref[...] = aemb


def _expand_cos_sin(nq: int, head_dim: int, n_head: int, rope_base: float):
    """freqs_cis (nq, hd//2, 2) -> pair-expanded, head-tiled (nq, dim) f32."""
    fc = precompute_freqs_cis(nq, head_dim, rope_base)  # (nq, hd//2, 2) f32
    cos = np.repeat(fc[..., 0], 2, axis=-1)  # (nq, hd)
    sin = np.repeat(fc[..., 1], 2, axis=-1)
    return (
        np.tile(cos, (1, n_head)).astype(np.float32),
        np.tile(sin, (1, n_head)).astype(np.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "nq", "n_head", "head_dim", "vocab", "rope_base", "norm_eps",
        "temperature", "top_p", "greedy", "interpret",
    ),
)
def fast_decode(
    fast_layers: Dict,  # stacked: wqkv/wo/w1/w3/w2 (L, ...), norms (L, dim)
    fast_norm: jax.Array,  # (dim,)
    fast_output: jax.Array,  # (dim, vocab)
    fast_embeddings: jax.Array,  # (vocab, dim)
    codebook_embeddings: jax.Array,  # (nq*vocab, model_dim) next-frame table
    hidden: jax.Array,  # (B, dim) — projected frame latent, weight dtype
    key: jax.Array,
    *,
    nq: int,
    n_head: int,
    head_dim: int,
    vocab: int,
    rope_base: float = 10000.0,
    norm_eps: float = 1e-5,
    temperature: float = 0.7,
    top_p: float = 0.7,
    greedy: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (codes (B, nq) int32, audio_emb (B, model_dim)).

    Drop-in for models/dual_ar._fast_decode + embed_codes: exact full-vocab
    nucleus sampling (the XLA scan path's top_k_window=0 semantics) plus the
    next frame's summed codebook embedding, so the per-frame XLA glue skips
    the embedding gather.  Gumbel noise is drawn with the same key structure
    as the scan path (split(key, nq), then split(k, B))."""
    B, dim = hidden.shape
    L = fast_layers["wqkv"]["w"].shape[0]
    inter = fast_layers["w1"]["w"].shape[-1]
    vp = _round_up(vocab, 128)

    if greedy:
        gumbel = jnp.zeros((B, nq, vp), jnp.float32)
    else:
        ks = jax.random.split(key, nq)
        g = jax.vmap(
            lambda k: jax.vmap(lambda kk: jax.random.gumbel(kk, (vocab,), jnp.float32))(
                jax.random.split(k, B)
            )
        )(ks)  # (nq, B, vocab)
        gumbel = jnp.swapaxes(g, 0, 1)  # (B, nq, vocab)
        gumbel = jnp.pad(gumbel, ((0, 0), (0, 0), (0, vp - vocab)))

    wd = fast_output.dtype
    wout = jnp.pad(fast_output, ((0, 0), (0, vp - vocab)))
    emb = jnp.pad(fast_embeddings, ((0, vp - vocab), (0, 0)))
    mdim = codebook_embeddings.shape[-1]
    # HBM-resident, rows padded only to the 8-row DMA tile (sampled codes are
    # always < vocab, so pad rows are never selected)
    v8 = _round_up(vocab, 8)
    cbemb = jnp.pad(
        codebook_embeddings.reshape(nq, vocab, mdim),
        ((0, 0), (0, v8 - vocab), (0, 0)),
    ).astype(wd)
    cos_np, sin_np = _expand_cos_sin(nq, head_dim, n_head, rope_base)
    cos = jnp.asarray(cos_np)
    sin = jnp.asarray(sin_np)

    kernel = functools.partial(
        _fast_decode_kernel,
        n_layer=L, nq=nq, dim=dim, n_head=n_head, head_dim=head_dim,
        vocab=vocab, norm_eps=norm_eps, temperature=temperature, top_p=top_p,
        greedy=greedy,
    )

    def spec(shape, index_map, smem=False):
        if not interpret and pltpu is not None:
            return pl.BlockSpec(shape, index_map, memory_space=_SMEM if smem else _MEM)
        return pl.BlockSpec(shape, index_map)

    in_specs = [
        spec((1, dim), lambda b: (b, 0)),
        spec((1, nq, vp), lambda b: (b, 0, 0)),
        spec((L, dim, 3 * dim), lambda b: (0, 0, 0)),
        spec((L, dim, dim), lambda b: (0, 0, 0)),
        spec((L, dim, inter), lambda b: (0, 0, 0)),
        spec((L, dim, inter), lambda b: (0, 0, 0)),
        spec((L, inter, dim), lambda b: (0, 0, 0)),
        spec((L, dim), lambda b: (0, 0)),
        spec((L, dim), lambda b: (0, 0)),
        spec((1, dim), lambda b: (0, 0)),
        spec((dim, vp), lambda b: (0, 0)),
        spec((vp, dim), lambda b: (0, 0)),
        # whole-array HBM ref: the kernel DMAs the selected rows itself
        pl.BlockSpec(memory_space=pl.ANY),
        spec((nq, dim), lambda b: (0, 0)),
        spec((nq, dim), lambda b: (0, 0)),
    ]
    out_specs = (
        spec((1, nq), lambda b: (b, 0), smem=True),
        spec((1, mdim), lambda b: (b, 0)),
    )

    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        )
    scratch = [
        pltpu.VMEM((L, nq, dim), wd) if pltpu is not None else None,
        pltpu.VMEM((L, nq, dim), wd) if pltpu is not None else None,
        pltpu.VMEM((8, mdim), wd) if pltpu is not None else None,
        pltpu.SemaphoreType.DMA if pltpu is not None else None,
    ]
    if pltpu is None:  # pragma: no cover — interpret-only environments
        raise RuntimeError("pallas tpu module unavailable")

    codes, aemb = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((B, nq), jnp.int32),
            jax.ShapeDtypeStruct((B, mdim), wd),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(
        hidden.astype(wd),
        gumbel,
        fast_layers["wqkv"]["w"],
        fast_layers["wo"]["w"],
        fast_layers["w1"]["w"],
        fast_layers["w3"]["w"],
        fast_layers["w2"]["w"],
        fast_layers["attention_norm"]["w"],
        fast_layers["ffn_norm"]["w"],
        fast_norm[None, :],
        wout,
        emb,
        cbemb,
        cos,
        sin,
    )
    return codes, aemb
