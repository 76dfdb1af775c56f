"""Native JAX w2v-BERT 2.0 conformer encoder.

The reference uses the frozen HF `facebook/w2v-bert-2.0` truncated at layer
17 as the distillation teacher (modules/wav2vec/w2v_bert2.py:10-84); the
framework's `models/w2v_bert.py` wraps the same HF torch module.  This module
is the TPU-native implementation of that encoder (HF
`Wav2Vec2BertModel` semantics with the default `relative_key` position
embeddings): feature projection -> N conformer blocks (macaron FFN x2 with
0.5 scaling, self-attention with learned relative-distance key bias, causal
depthwise-conv module with GLU) — so teacher featurization runs on TPU with
layers stacked and scanned, no torch in the loop.

Weights load from the published HF state_dict via `convert()`; parity vs the
HF implementation is tested with random weights
(tests/parity/test_w2v_bert_native_parity.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class W2VBertConfig:
    feat_dim: int = 160           # stacked-fbank input features
    hidden: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    intermediate: int = 4096
    conv_kernel: int = 31
    left_max_pos: int = 64        # relative_key clamp range
    right_max_pos: int = 8
    eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden // self.n_heads


def _ln(p, x, eps):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["w"] + p["b"]


def _lin(p, x):
    return x @ p["w"] + p["b"] if "b" in p else x @ p["w"]


def _ffn(p, x, eps):
    # macaron feed-forward (Wav2Vec2BertFeedForward, swish)
    h = jax.nn.silu(_lin(p["in"], x))
    return _lin(p["out"], h)


def _rel_key_bias(q, table, left, right):
    """relative_key attention bias (modeling_wav2vec2_bert.py SelfAttention
    forward): distance-clamped learned key embeddings dotted with queries."""
    T = q.shape[2]
    dist = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]  # r - l
    dist = jnp.clip(dist, -left, right) + left
    pos = table[dist]  # (T, T, head_dim)
    return jnp.einsum("bhld,lrd->bhlr", q, pos.astype(q.dtype))


def _attention(p, cfg: W2VBertConfig, x, bias):
    B, T, _ = x.shape
    H, hd = cfg.n_heads, cfg.head_dim
    q = _lin(p["q"], x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    k = _lin(p["k"], x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    v = _lin(p["v"], x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd)
    scores = scores + _rel_key_bias(q, p["dist"], cfg.left_max_pos,
                                    cfg.right_max_pos) / np.sqrt(hd)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, -1)
    out = (probs @ v).transpose(0, 2, 1, 3).reshape(B, T, H * hd)
    return _lin(p["o"], out)


def _conv_module(p, cfg: W2VBertConfig, x, pad_mask):
    # Wav2Vec2BertConvolutionModule: LN -> pw1 -> GLU -> causal depthwise ->
    # LN -> swish -> pw2
    h = _ln(p["ln"], x, cfg.eps)
    if pad_mask is not None:
        h = h * pad_mask[..., None]
    h = h @ p["pw1"]                       # (B, T, 2H)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)              # GLU over channel dim
    h = jnp.pad(h, ((0, 0), (cfg.conv_kernel - 1, 0), (0, 0)))
    h = jax.lax.conv_general_dilated(
        h, p["dw"], window_strides=(1,), padding="VALID",
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=cfg.hidden,
    )
    h = _ln(p["dw_ln"], h, cfg.eps)
    h = jax.nn.silu(h)
    return h @ p["pw2"]


def _layer(p, cfg: W2VBertConfig, x, bias, pad_mask):
    x = x + 0.5 * _ffn(p["ffn1"], _ln(p["ffn1_ln"], x, cfg.eps), cfg.eps)
    x = x + _attention(p["attn"], cfg, _ln(p["attn_ln"], x, cfg.eps), bias)
    x = x + _conv_module(p["conv"], cfg, x, pad_mask)
    x = x + 0.5 * _ffn(p["ffn2"], _ln(p["ffn2_ln"], x, cfg.eps), cfg.eps)
    return _ln(p["final_ln"], x, cfg.eps)


def apply(params: Dict, cfg: W2VBertConfig, feats: jax.Array,
          mask: Optional[jax.Array] = None,
          num_layers: Optional[int] = None) -> jax.Array:
    """feats (B, T, feat_dim), mask (B, T) 1=valid -> hidden states after
    `num_layers` conformer blocks (None = all; the reference teacher stops at
    17).  Stacked-layer scan; truncation slices the stacked params."""
    x = _lin(params["proj"], _ln(params["fp_ln"], feats, cfg.eps))
    bias = None
    pad_mask = None
    if mask is not None:
        pad_mask = mask.astype(x.dtype)
        x = x * pad_mask[..., None]
        bias = (1.0 - pad_mask)[:, None, None, :] * jnp.finfo(x.dtype).min
    n = cfg.n_layers if num_layers is None else num_layers
    layers = jax.tree.map(lambda a: a[:n], params["layers"])

    def body(h, lp):
        return _layer(lp, cfg, h, bias, pad_mask), None

    x, _ = jax.lax.scan(body, x, layers)
    return x


# ---------------------------------------------------------------------------
# Feature extraction (SeamlessM4TFeatureExtractor semantics)
# ---------------------------------------------------------------------------


def stacked_features(wav16k: jax.Array, x_lens: Optional[jax.Array] = None):
    """wav (B, T) float in [-1,1] @16 kHz -> (features (B, T', 160),
    mask (B, T')): the teacher's input featurization
    (transformers SeamlessM4TFeatureExtractor.__call__, checkpoint-free):
    kaldi-mel 80-bin power-2 fbank (400/160/512, povey, preemph 0.97 with
    HF's first-sample scaling, DC removal, mel floor 2^-23), per-mel-bin
    mean/var normalization (ddof=1) over each utterance's valid frames,
    then stride-2 frame stacking to 160 dims."""
    from streamvoiceanon_tpu.audio.fbank import (
        _dft_mats,
        kaldi_mel_banks,
        povey_window,
    )

    if wav16k.ndim == 1:
        wav16k = wav16k[None]
    win, hop, padded, n_mel = 400, 160, 512, 80
    x = wav16k.astype(jnp.float32) * 32768.0
    B, T = x.shape
    m = 1 + (T - win) // hop
    if x_lens is None:
        x_lens = jnp.full((B,), T, jnp.int32)
    frame_lens = 1 + (x_lens - win) // hop

    frames = jax.lax.conv_general_dilated_patches(
        x[:, :, None], filter_shape=(win,), window_strides=(hop,),
        padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
    ).reshape(B, m, win)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # HF preemphasis: in-place buffer[1:] -= p*buffer[:-1]; buffer[0] *= 1-p
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    pre = frames - 0.97 * prev
    frames = pre.at[..., 0].set(frames[..., 0] * (1.0 - 0.97))
    frames = frames * jnp.asarray(povey_window(win), jnp.float32)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - win)))
    cos_m, sin_m = _dft_mats(padded)
    re = jnp.einsum("bmw,wk->bmk", frames, jnp.asarray(cos_m),
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("bmw,wk->bmk", frames, jnp.asarray(sin_m),
                    preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel_fb = jnp.asarray(kaldi_mel_banks(n_mel, padded, 16000.0))
    mel = jnp.log(jnp.maximum(power @ mel_fb, 1.192092955078125e-07))

    # per-utterance, per-mel-bin mean/var normalization over valid frames
    valid = (jnp.arange(m)[None, :] < frame_lens[:, None]).astype(jnp.float32)
    n = jnp.maximum(frame_lens.astype(jnp.float32), 1.0)[:, None]
    mean = jnp.sum(mel * valid[..., None], axis=1) / n
    var = jnp.sum((mel - mean[:, None]) ** 2 * valid[..., None], axis=1) / jnp.maximum(
        n - 1.0, 1.0
    )
    mel = (mel - mean[:, None]) / jnp.sqrt(var[:, None] + 1e-7)
    mel = mel * valid[..., None]

    # stride-2 stacking (frame count zero-padded to even first, like the HF
    # extractor's pad_to_multiple_of=2; a half-valid last row is masked out)
    m2 = (m + 1) // 2
    mel = jnp.pad(mel, ((0, 0), (0, m2 * 2 - m), (0, 0)))
    feats = mel.reshape(B, m2, 2 * n_mel)
    mask = (jnp.arange(m2)[None, :] < (frame_lens // 2)[:, None]).astype(jnp.int32)
    return feats, mask


def init_params(key, cfg: W2VBertConfig, dtype=jnp.float32) -> Dict:
    """Random init with the same pytree layout as `convert` (He-normal
    linears, identity layer norms) — used when training the conformer from
    scratch (e.g. the ASR_eval recognizer); real HF weights remain pluggable
    via `convert` outside the sandbox."""
    H = cfg.hidden

    def lin(k, din, dout, bias=True):
        p = {"w": jax.random.normal(k, (din, dout), dtype) * np.sqrt(2.0 / din)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def ln():
        return {"w": jnp.ones((H,), dtype), "b": jnp.zeros((H,), dtype)}

    def layer(k):
        ks = jax.random.split(k, 12)
        return {
            "ffn1_ln": ln(),
            "ffn1": {"in": lin(ks[0], H, cfg.intermediate),
                     "out": lin(ks[1], cfg.intermediate, H)},
            "attn_ln": ln(),
            "attn": {
                "q": lin(ks[2], H, H),
                "k": lin(ks[3], H, H),
                "v": lin(ks[4], H, H),
                "o": lin(ks[5], H, H),
                "dist": jax.random.normal(
                    ks[6], (cfg.left_max_pos + cfg.right_max_pos + 1,
                            cfg.head_dim), dtype) * 0.02,
            },
            "conv": {
                "ln": ln(),
                "pw1": jax.random.normal(ks[7], (H, 2 * H), dtype)
                * np.sqrt(2.0 / H),
                "dw": jax.random.normal(ks[8], (cfg.conv_kernel, 1, H), dtype)
                * np.sqrt(2.0 / cfg.conv_kernel),
                "dw_ln": ln(),
                "pw2": jax.random.normal(ks[9], (H, H), dtype)
                * np.sqrt(2.0 / H),
            },
            "ffn2_ln": ln(),
            "ffn2": {"in": lin(ks[10], H, cfg.intermediate),
                     "out": lin(ks[11], cfg.intermediate, H)},
            "final_ln": ln(),
        }

    k0, k1, klayers = jax.random.split(key, 3)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[layer(k) for k in jax.random.split(klayers, cfg.n_layers)],
    )
    return {
        "fp_ln": {"w": jnp.ones((cfg.feat_dim,), dtype),
                  "b": jnp.zeros((cfg.feat_dim,), dtype)},
        "proj": lin(k1, cfg.feat_dim, H),
        "layers": stacked,
    }


# ---------------------------------------------------------------------------
# HF state_dict converter
# ---------------------------------------------------------------------------


def convert(sd: Dict, cfg: W2VBertConfig) -> Dict:
    """HF Wav2Vec2BertModel state_dict -> stacked-layer pytree."""

    def t(name):
        return np.asarray(sd[name], np.float32)

    def lin(prefix, bias=True):
        p = {"w": t(prefix + ".weight").T}
        if bias:
            p["b"] = t(prefix + ".bias")
        return p

    def ln(prefix):
        return {"w": t(prefix + ".weight"), "b": t(prefix + ".bias")}

    def layer(i):
        pre = f"encoder.layers.{i}."
        return {
            "ffn1_ln": ln(pre + "ffn1_layer_norm"),
            "ffn1": {"in": lin(pre + "ffn1.intermediate_dense"),
                     "out": lin(pre + "ffn1.output_dense")},
            "attn_ln": ln(pre + "self_attn_layer_norm"),
            "attn": {
                "q": lin(pre + "self_attn.linear_q"),
                "k": lin(pre + "self_attn.linear_k"),
                "v": lin(pre + "self_attn.linear_v"),
                "o": lin(pre + "self_attn.linear_out"),
                "dist": t(pre + "self_attn.distance_embedding.weight"),
            },
            "conv": {
                "ln": ln(pre + "conv_module.layer_norm"),
                # torch conv1d (out, in, k): pointwise k=1 -> (in, out) matmul
                "pw1": t(pre + "conv_module.pointwise_conv1.weight")[:, :, 0].T,
                # depthwise (H, 1, k) -> TIO (k, 1, H)
                "dw": t(pre + "conv_module.depthwise_conv.weight").transpose(2, 1, 0),
                "dw_ln": ln(pre + "conv_module.depthwise_layer_norm"),
                "pw2": t(pre + "conv_module.pointwise_conv2.weight")[:, :, 0].T,
            },
            "ffn2_ln": ln(pre + "ffn2_layer_norm"),
            "ffn2": {"in": lin(pre + "ffn2.intermediate_dense"),
                     "out": lin(pre + "ffn2.output_dense")},
            "final_ln": ln(pre + "final_layer_norm"),
        }

    stacked = jax.tree.map(
        lambda *xs: np.stack(xs), *[layer(i) for i in range(cfg.n_layers)]
    )
    return {
        "fp_ln": ln("feature_projection.layer_norm"),
        "proj": lin("feature_projection.projection"),
        "layers": stacked,
    }
