"""Incremental (true streaming) content-tokenizer encode.

The reference streams the tokenizer by re-encoding a rolling 128-frame window
per 1-frame chunk (infer_arvc.py:495-518) — ~100x redundant compute, and its
RoPE positions restart every window.  This module instead carries:

* an STFT sample tail (win - hop samples),
* conv input tails for the ConvNeXt backbone and the two stride-2
  downsampling convs,
* a *rotated-frame KV ring* for the window-limited transformer: RoPE
  attention scores depend only on relative distance, so cached keys are kept
  rotated to a fixed query frame (each step every cached key is rotated by
  one negative position step, costing one elementwise multiply over the
  512-slot ring).  This makes streaming output EXACTLY equal to offline
  encoding (up to fp error) for any stream length, with O(window) work per
  token — better than the reference approximation on both axes.

Chunk unit: one 2048-sample frame -> 4 mel hops -> 1 content token.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.config import TokenizerConfig, WindowedTransformerConfig
from streamvoiceanon_tpu.models import convnext
from streamvoiceanon_tpu.models.dual_ar import _pallas_interpret
from streamvoiceanon_tpu.ops import conv as convops
from streamvoiceanon_tpu.ops import quantizers, stft
from streamvoiceanon_tpu.ops.norm import layer_norm, rms_norm
from streamvoiceanon_tpu.ops.rope import precompute_freqs_cis


# ---------------------------------------------------------------------------
# Streaming mel
# ---------------------------------------------------------------------------


class MelState(NamedTuple):
    tail: jax.Array  # (B, win - hop) previous samples


def mel_init_state(cfg, batch: int = 1) -> MelState:
    return MelState(jnp.zeros((batch, cfg.win_length - cfg.hop_length), jnp.float32))


def mel_consts(cfg) -> dict:
    """Device-residency-friendly spectral tables.  Passed as ARGUMENTS to the
    jitted chunk programs instead of being baked in as constants: on the axon
    relay, program constants are re-shipped per execution (~1ms/16MB), while
    argument buffers stay device-resident."""
    return {
        "dft": jnp.asarray(stft._dft_kernel(cfg.n_fft, cfg.win_length)),
        "fb": jnp.asarray(stft._mel_matrix(cfg)),
    }


def mel_stream(state: MelState, wav_chunk: jax.Array, cfg,
               consts: dict = None) -> Tuple[MelState, jax.Array]:
    """(B, k*hop) samples -> (B, k, n_mels); equals causal log_mel of the
    full signal at the corresponding frames."""
    x = jnp.concatenate([state.tail, wav_chunk.astype(jnp.float32)], axis=1)
    if consts is None:
        # causal_pad=False (the tail provides the context) but the reference
        # pow2_sqrt magnitude epsilon must stay (spectrogram.py:63) — same
        # formula as the consts branch below
        mel = stft.log_mel_spectrogram(x, cfg, causal_pad=False,
                                       pow2_sqrt_eps=True)
    else:
        # explicit window-stack + one MXU matmul instead of a strided
        # conv_general_dilated: XLA's general-conv lowering of this shape
        # measured 91 µs/chunk vs 10 µs for the stacked dot (9.4x,
        # r5 mel micro-bench) — k is static, so the slice-stack unrolls
        # at trace time; numerics are same-precision reassociation only
        # (rel 8e-7, tokens unchanged — tests/test_tokenizer_stream.py)
        n_frames = (x.shape[1] - cfg.win_length) // cfg.hop_length + 1
        frames = jnp.stack(
            [x[:, i * cfg.hop_length : i * cfg.hop_length + cfg.win_length]
             for i in range(n_frames)], axis=1)
        spec = jnp.einsum("bfw,wc->bfc", frames, consts["dft"][:, 0, :],
                          preferred_element_type=jnp.float32)
        n_bins = cfg.n_fft // 2 + 1
        re, im = spec[..., :n_bins], spec[..., n_bins:]
        mag = jnp.sqrt(re * re + im * im + 1e-6)
        mel = jnp.log(jnp.clip(jnp.einsum(
            "btf,fm->btm", mag, consts["fb"], preferred_element_type=jnp.float32
        ), min=1e-5))
    new_tail = x[:, x.shape[1] - (cfg.win_length - cfg.hop_length):]
    return MelState(new_tail), mel


# ---------------------------------------------------------------------------
# Streaming ConvNeXt encoder
# ---------------------------------------------------------------------------


def convnext_encoder_init_stream(p: Dict, cfg, batch: int = 1, dtype=jnp.float32) -> Dict:
    st = {
        "stem": convops.causal_conv1d_init_state(
            batch, cfg.input_channels, p["stem_conv"]["w"].shape[0], dtype=dtype
        ),
        "stages": [],
    }
    for i in range(len(cfg.depths)):
        st["stages"].append(
            [convnext.convnext_block_init_stream(b, batch, dtype) for b in p[f"stage_{i}"]]
        )
    return st


def convnext_encoder_apply_stream(p: Dict, cfg, state: Dict, x: jax.Array):
    new = {"stages": []}
    for i in range(len(cfg.depths)):
        if i == 0:
            new["stem"], x = convops.causal_conv1d_stream(
                state["stem"], x, p["stem_conv"]["w"], p["stem_conv"]["b"]
            )
            x = layer_norm(x, p["stem_norm"]["w"], p["stem_norm"]["b"], eps=1e-6)
        else:
            x = layer_norm(x, p[f"mid_norm_{i-1}"]["w"], p[f"mid_norm_{i-1}"]["b"], eps=1e-6)
            x = x @ p[f"mid_conv_{i-1}"]["w"][0] + p[f"mid_conv_{i-1}"]["b"]
        stage_states = []
        for blk, bst in zip(p[f"stage_{i}"], state["stages"][i]):
            bst, x = convnext.convnext_block_apply_stream(blk, bst, x)
            stage_states.append(bst)
        new["stages"].append(stage_states)
    x = layer_norm(x, p["final_norm"]["w"], p["final_norm"]["b"], eps=1e-6)
    return new, x


# ---------------------------------------------------------------------------
# Rotated-frame KV ring for the window-limited transformer
# ---------------------------------------------------------------------------


class RingState(NamedTuple):
    k_ring: jax.Array  # (L, B, H, W, D) keys rotated to the fixed query frame
    v_ring: jax.Array  # (L, B, H, W, D)
    count: jax.Array  # scalar int32: tokens seen so far
    # (L, B, K-1, dim) GLU-output tail for the depthwise-conv (LConv1d)
    # branch (windowed_transformer.py:197-234); None when cfg.dw_conv is off
    conv_tail: Optional[jax.Array] = None


@functools.lru_cache(maxsize=8)
def _unit_rotation(head_dim: int, rope_base: float) -> np.ndarray:
    """cos/sin of a -1 position step per rotary dim pair: (D//2, 2)."""
    freqs = 1.0 / (
        rope_base ** (np.arange(0, head_dim, 2)[: head_dim // 2] / head_dim)
    )
    return np.stack([np.cos(-freqs), np.sin(-freqs)], axis=-1).astype(np.float32)


def _rotate_pairs(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    xs = x.astype(jnp.float32).reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x0, x1 = xs[..., 0], xs[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def ring_init(cfg: WindowedTransformerConfig, batch: int = 1, dtype=jnp.float32) -> RingState:
    W = cfg.window_size
    if cfg.use_pallas_stream and not cfg.dw_conv:
        # flat circular absolute-rope layout consumed by ops/pallas_wt_stream
        # (kernel at batch 1, XLA circular step otherwise).  dw_conv keeps
        # the rotated-frame layout — its LConv branch lives on that path.
        shape = (cfg.n_layer, batch, W, cfg.n_head * cfg.head_dim)
    else:
        shape = (cfg.n_layer, batch, cfg.n_head, W, cfg.head_dim)
    conv_tail = (
        jnp.zeros((cfg.n_layer, batch, cfg.conv_kernel_size - 1, cfg.dim), dtype)
        if cfg.dw_conv
        else None
    )
    return RingState(
        jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.int32(0), conv_tail
    )


def convert_ring_layout(state: RingState, cfg: WindowedTransformerConfig) -> RingState:
    """Re-layout a RingState to match cfg.use_pallas_stream.

    Rotated-frame per-head (L, B, H, W, D) <-> circular absolute-rope flat
    (L, B, W, H*D).  The two stores differ by a SINGLE rotation angle for
    every valid slot — rotated-frame slot w holds token t = count-W+w at
    angle t-(count-1), the circular store wants angle W+(t mod R)-R*(rebases
    since t), and their difference telescopes to the constant
    W + ((count-1) mod R) — plus a slot permutation (roll by count mod W).
    Used by StreamSession.transfer."""
    from streamvoiceanon_tpu.ops import pallas_wt_stream as pwt

    kr = state.k_ring
    want_flat = cfg.use_pallas_stream and not cfg.dw_conv
    cnt = state.count
    if want_flat and kr.ndim == 5:
        L, B, H, W, D = kr.shape
        R = cfg.rope_table_rows - W
        cos_np, sin_np = pwt._signed_tables(
            cfg.rope_table_rows, cfg.head_dim, cfg.n_head, cfg.rope_base)
        delta = W + ((cnt - 1) % R)
        cosd = jax.lax.dynamic_slice_in_dim(jnp.asarray(cos_np), delta, 1, 0)
        sind = jax.lax.dynamic_slice_in_dim(jnp.asarray(sin_np), delta, 1, 0)

        def to_flat(r):
            return jnp.swapaxes(r, 2, 3).reshape(L, B, W, H * D)

        # rotated slot w holds token count-W+w -> circular slot (count+w)%W:
        # roll the W axis right by (count % W)
        shift = cnt % W
        k = pwt._rope_rows(to_flat(state.k_ring), cosd, sind)
        return state._replace(
            k_ring=_roll_w(k, shift),
            v_ring=_roll_w(to_flat(state.v_ring), shift),
        )
    if not want_flat and kr.ndim == 4:
        L, B, W, HD = kr.shape
        H, D = cfg.n_head, cfg.head_dim
        R = cfg.rope_table_rows - W
        cos_np, sin_np = pwt._signed_tables(
            cfg.rope_table_rows, cfg.head_dim, cfg.n_head, cfg.rope_base)
        delta = W + ((cnt - 1) % R)
        cosd = jax.lax.dynamic_slice_in_dim(jnp.asarray(cos_np), delta, 1, 0)
        # inverse rotation: conjugate (negate the signed sin row)
        sind = -jax.lax.dynamic_slice_in_dim(jnp.asarray(sin_np), delta, 1, 0)

        def to_headed(r):
            return jnp.swapaxes(r.reshape(L, B, W, H, D), 2, 3)

        shift = cnt % W
        k = pwt._rope_rows(_roll_w(state.k_ring, -shift), cosd, sind)
        return state._replace(
            k_ring=to_headed(k),
            v_ring=to_headed(_roll_w(state.v_ring, -shift)),
        )
    return state


def _roll_w(r: jax.Array, shift) -> jax.Array:
    """Roll the W (axis -2) dimension by a traced shift."""
    W = r.shape[-2]
    idx = (jnp.arange(W) - shift) % W
    return jnp.take(r, idx, axis=-2)


def transformer_stream_step(
    params: Dict, cfg: WindowedTransformerConfig, state: RingState, x: jax.Array
) -> Tuple[RingState, jax.Array]:
    """One new token (B, 1, dim) through all layers with the rotated ring.

    The query sits at fixed relative position 0; cached key at age a carries
    rotation angle -a (applied incrementally).  Equal to offline windowed
    causal attention because RoPE scores depend only on (query - key)
    position differences."""
    W = cfg.window_size
    flat = state.k_ring.ndim == 4  # (L, B, W, H*D) — use_pallas_stream layout
    if flat:
        from streamvoiceanon_tpu.ops import pallas_wt_stream as pwt

        B = x.shape[0]
        k_in = pwt.maybe_rebase_ring(
            state.k_ring, state.count,
            head_dim=cfg.head_dim, n_head=cfg.n_head, rope_base=cfg.rope_base,
            table_rows=cfg.rope_table_rows,
        )
        if B == 1 and cfg.n_head * cfg.head_dim == cfg.dim:
            h, k_ring, v_ring = pwt.wt_stream_step(
                _stack_wt_layers(params), x[0], k_in[:, 0],
                state.v_ring[:, 0], state.count,
                n_head=cfg.n_head, head_dim=cfg.head_dim,
                rope_base=cfg.rope_base, norm_eps=cfg.norm_eps,
                table_rows=cfg.rope_table_rows,
                interpret=_pallas_interpret(),
            )
            k_ring, v_ring = k_ring[:, None], v_ring[:, None]
            h = h[None]
        else:  # batched: same circular semantics in XLA
            h, k_ring, v_ring = pwt.circular_stream_step_xla(
                _stack_wt_layers(params), x, k_in, state.v_ring, state.count,
                n_head=cfg.n_head, head_dim=cfg.head_dim,
                rope_base=cfg.rope_base, norm_eps=cfg.norm_eps,
                table_rows=cfg.rope_table_rows,
            )
        h = rms_norm(h, params["final_norm"]["w"], cfg.norm_eps)
        return RingState(k_ring, v_ring, state.count + 1, state.conv_tail), h
    unit = jnp.asarray(_unit_rotation(cfg.head_dim, cfg.rope_base))
    cos, sin = unit[None, None, None, :, 0], unit[None, None, None, :, 1]
    age = W - 1 - jnp.arange(W)  # slot W-1 is the newest
    valid = age <= jnp.minimum(state.count, W - 1)

    def layer(carry, inp):
        h = carry
        lp, k_ring, v_ring, conv_tail = inp
        B = h.shape[0]
        hn = rms_norm(h, lp["attention_norm"]["w"], cfg.norm_eps)
        qkv = hn @ lp["wqkv"]["w"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, 1, cfg.n_head, cfg.head_dim)
        k = k.reshape(B, 1, cfg.n_head, cfg.head_dim)
        # rotate all cached keys one step into the past, then append the new
        # key at relative position 0
        k_ring = _rotate_pairs(k_ring, cos, sin)
        k_ring = jnp.roll(k_ring, -1, axis=2)
        v_ring = jnp.roll(v_ring, -1, axis=2)
        k_ring = k_ring.at[:, :, W - 1].set(
            jnp.swapaxes(k, 1, 2)[:, :, 0].astype(k_ring.dtype)
        )
        v_ring = v_ring.at[:, :, W - 1].set(
            jnp.swapaxes(v.reshape(B, 1, cfg.n_head, cfg.head_dim), 1, 2)[:, :, 0]
            .astype(v_ring.dtype)
        )
        qh = jnp.swapaxes(q, 1, 2)  # (B, H, 1, D)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, k_ring.astype(h.dtype),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(cfg.head_dim)
        scores = jnp.where(valid[None, None, None, :], scores, -jnp.inf)
        w = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
        out = jnp.einsum("bhqk,bhkd->bqhd", w, v_ring.astype(h.dtype))
        out = out.reshape(B, 1, cfg.n_head * cfg.head_dim)
        h = h + lp["attn_scale"] * (out @ lp["wo"]["w"])
        if cfg.dw_conv:
            # streaming LConv1d branch: the causal depthwise conv needs only
            # the GLU outputs of the previous K-1 tokens (zero-initialized
            # tail == offline left zero-pad, windowed_transformer.lconv_apply)
            lcp = lp["lconv"]
            y = rms_norm(h, lcp["pre_norm"]["w"], cfg.norm_eps)
            y = y @ lcp["w_start"]["w"]
            a, b2 = jnp.split(y, 2, axis=-1)
            g = a * jax.nn.sigmoid(b2)  # (B, 1, dim)
            full = jnp.concatenate([conv_tail.astype(h.dtype), g], axis=1)
            yc = jnp.einsum(
                "bkc,kc->bc", full, lcp["dw"]["w"][:, 0, :],
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)[:, None, :]
            yc = rms_norm(yc, lcp["conv_norm"]["w"], cfg.norm_eps)
            yc = jax.nn.silu(yc) @ lcp["w_end"]["w"]
            h = h + lcp["scale"] * yc
            conv_tail = full[:, 1:].astype(conv_tail.dtype)
        f = rms_norm(h, lp["ffn_norm"]["w"], cfg.norm_eps)
        f = (jax.nn.silu(f @ lp["w1"]["w"]) * (f @ lp["w3"]["w"])) @ lp["w2"]["w"]
        h = h + lp["ffn_scale"] * f
        return h, (k_ring, v_ring, conv_tail)

    stacked = _stack_wt_layers(params)
    x, rings = jax.lax.scan(
        lambda c, i: layer(c, (i[0], i[1], i[2], i[3])),
        x,
        (stacked, state.k_ring, state.v_ring, state.conv_tail),
    )
    x = rms_norm(x, params["final_norm"]["w"], cfg.norm_eps)
    return RingState(rings[0], rings[1], state.count + 1, rings[2]), x


@functools.lru_cache(maxsize=4)
def _stack_cache():
    return {}


def _stack_wt_layers(params: Dict):
    """Stack the windowed-transformer layer list once per params identity.
    The params object is pinned alongside the stacked tree — the cache is
    keyed by id(), and a collected dict's address can be reused."""
    cache = _stack_cache()
    key = id(params)
    if key not in cache:
        from streamvoiceanon_tpu.models.dual_ar import stack_layers

        cache[key] = (params, stack_layers(params["layers"]))
    return cache[key][1]


# ---------------------------------------------------------------------------
# Full tokenizer stream
# ---------------------------------------------------------------------------


class TokenizerStreamState(NamedTuple):
    mel: MelState
    backbone: Dict
    down: Tuple
    ring: RingState


def init_stream_state(params: Dict, cfg: TokenizerConfig, batch: int = 1,
                      dtype=jnp.float32) -> TokenizerStreamState:
    dims = cfg.quantizer.input_dim
    down = []
    for stage, f in zip(params["downsample"], cfg.quantizer.downsample_factor):
        down.append(
            {
                "conv": convops.causal_conv1d_init_state(
                    batch, dims, stage["conv"]["w"].shape[0], stride=f, dtype=dtype
                ),
                "block": convnext.convnext_block_init_stream(stage["block"], batch, dtype),
            }
        )
    if cfg.use_pallas_encoder and cfg.backbone.gin_channels == 0 and batch == 1:
        from streamvoiceanon_tpu.ops.pallas_convnext_enc import init_packed_state

        return TokenizerStreamState(
            mel=mel_init_state(cfg.mel, batch),
            backbone=init_packed_state(cfg, batch, dtype),
            down=(),
            ring=ring_init(cfg.transformer, batch, dtype),
        )
    return TokenizerStreamState(
        mel=mel_init_state(cfg.mel, batch),
        backbone=convnext_encoder_init_stream(params["backbone"], cfg.backbone, batch, dtype),
        down=tuple(down),
        ring=ring_init(cfg.transformer, batch, dtype),
    )


def convert_enc_layout(state: TokenizerStreamState, params: Dict,
                       cfg: TokenizerConfig,
                       target_batch: int = 0) -> TokenizerStreamState:
    """Migrate the ConvNeXt front-end streaming state between the dict
    layout and the fused kernel's PackedEncState, per cfg.use_pallas_encoder
    (used by StreamSession.transfer).  `target_batch` overrides the state's
    own batch in the packed-eligibility check: StreamSession.fanout passes
    the FUTURE batch so a packed B=1 state is unpacked to the batch-generic
    layout before tiling (the packed kernels are B=1-only)."""
    from streamvoiceanon_tpu.ops import pallas_convnext_enc as pce

    is_packed = isinstance(state.backbone, pce.PackedEncState)
    batch = target_batch or (
        state.backbone.stem.shape[0] if is_packed
        else state.backbone["stem"].tail.shape[0])
    want_packed = (cfg.use_pallas_encoder and cfg.backbone.gin_channels == 0
                   and batch == 1)
    if want_packed and not is_packed:
        return state._replace(
            backbone=pce.pack_enc_state(state.backbone, state.down, cfg),
            down=())
    if not want_packed and is_packed:
        bb, dn = pce.unpack_enc_state(state.backbone, cfg)
        return state._replace(backbone=bb, down=dn)
    return state


def _encode_front_dict(params, cfg, state, mel):
    """mel -> pre-transformer features via the op-by-op XLA path."""
    bb_state, feat = convnext_encoder_apply_stream(
        params["backbone"], cfg.backbone, state.backbone, mel
    )
    z = feat
    new_down = []
    for stage, st, f in zip(params["downsample"], state.down,
                            cfg.quantizer.downsample_factor):
        cs, z = convops.causal_conv1d_stream(
            st["conv"], z, stage["conv"]["w"], stage["conv"]["b"], stride=f
        )
        bs, z = convnext.convnext_block_apply_stream(stage["block"], st["block"], z)
        new_down.append({"conv": cs, "block": bs})
    return bb_state, z, tuple(new_down)


def encode_stream(
    params: Dict, cfg: TokenizerConfig, state: TokenizerStreamState,
    wav_chunk: jax.Array, consts: dict = None,
) -> Tuple[TokenizerStreamState, jax.Array]:
    """(state, (B, k*2048) samples) -> (state', (B, k) content tokens).

    Exactly prefix-consistent with tokenizer.encode on the whole signal."""
    from streamvoiceanon_tpu.ops import pallas_convnext_enc as pce

    mel_state, mel = mel_stream(state.mel, wav_chunk, cfg.mel, consts)
    if isinstance(state.backbone, pce.PackedEncState):
        if mel.shape[0] == 1:
            pw = params.get("enc_packed")
            if pw is None:
                pw = pce.packed_weights(params, cfg)
            bb_state, z = pce.encoder_front_step(
                pw, state.backbone, mel, cfg, interpret=_pallas_interpret())
            new_down = ()
        else:  # batched: unpack -> XLA path -> repack
            bb, dn = pce.unpack_enc_state(state.backbone, cfg)
            tmp = state._replace(backbone=bb, down=dn)
            bb2, z, nd = _encode_front_dict(params, cfg, tmp, mel)
            bb_state = pce.pack_enc_state(bb2, nd, cfg)
            new_down = ()
    else:
        bb_state, z, new_down = _encode_front_dict(params, cfg, state, mel)

    # one transformer step per new token (k is tiny — usually 1)
    ring = state.ring
    outs = []
    for t in range(z.shape[1]):
        ring, h = transformer_stream_step(
            params["pre_module"], cfg.transformer, ring, z[:, t : t + 1]
        )
        outs.append(h)
    z = jnp.concatenate(outs, axis=1)
    tokens = quantizers.lfq_encode(params["lfq"], z, cfg.quantizer.codebook_bits)
    return (
        TokenizerStreamState(mel_state, bb_state, tuple(new_down), ring),
        tokens,
    )
