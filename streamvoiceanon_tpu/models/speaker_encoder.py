"""SparkTTS / BiCodec timbre encoder.

wav @16 kHz -> MelSpectrogram(128 mels, hop 320, power=1) -> ECAPA-TDNN
(c512, global-context attentive stats) latent sequence (1536-d) ->
PerceiverResampler (32 learned latents, dim 128, 2 layers,
cross_attn_include_queries) -> ResidualFSQ (levels 4^6, 1 quantizer) ->
timbre latents (B, 32, 128).

Behavior matches reference modules/bicodec_speaker_encoder/
{speaker_encoder.py:34-153, ecapa_tdnn.py:28-250, perceiver_encoder.py:52-350,
fsq/residual_fsq.py:48-263}.  Frozen at inference; BatchNorm uses running
stats; channels-last throughout.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.config import MelConfig, SpeakerEncoderConfig
from streamvoiceanon_tpu.ops import quantizers, stft


def _bn(p: Dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    y = (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)
    if "w" in p:
        y = y * p["w"] + p["b"]
    return y


def _conv1d(x, w, b=None, *, dilation=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((padding, padding),),
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return y + b if b is not None else y


# ---------------------------------------------------------------------------
# ECAPA-TDNN (c512, global-context ASTP)
# ---------------------------------------------------------------------------


def _res2_block(p: Dict, x: jax.Array, dilation: int, scale: int = 8,
                bn_fn=_bn) -> jax.Array:
    """SE_Res2Block (ecapa_tdnn.py:135-149): 1x1 -> res2 conv -> 1x1 -> SE.
    `bn_fn` lets training-mode callers (evals/ecapa_asv.py) swap stored-stat
    batch norm for batch-stat normalization."""
    h = jax.nn.relu(_conv1d(x, p["conv1_w"], p["conv1_b"]))
    h = bn_fn(p["bn1"], h)
    # Res2: split channels into `scale` groups; rolling conv with carry
    width = h.shape[-1] // scale
    sp = jnp.split(h, scale, axis=-1)
    outs = []
    carry = sp[0]
    for i in range(scale - 1):
        if i >= 1:
            carry = carry + sp[i]
        carry = _conv1d(
            carry, p["res2"][i]["w"], p["res2"][i]["b"],
            dilation=dilation, padding=dilation,
        )
        carry = bn_fn(p["res2"][i]["bn"], jax.nn.relu(carry))
        outs.append(carry)
    outs.append(sp[scale - 1])
    h = jnp.concatenate(outs, axis=-1)
    h = jax.nn.relu(_conv1d(h, p["conv2_w"], p["conv2_b"]))
    h = bn_fn(p["bn2"], h)
    # SE connect
    s = jnp.mean(h, axis=1)
    s = jax.nn.relu(s @ p["se1_w"] + p["se1_b"])
    s = jax.nn.sigmoid(s @ p["se2_w"] + p["se2_b"])
    return x + h * s[:, None]


def ecapa_latents(params: Dict, mel: jax.Array, bn_fn=_bn) -> jax.Array:
    """mel (B, T, 128) -> latent sequence (B, T, 1536)
    (ecapa_tdnn.py:191-207 with return_latent=True)."""
    h = jax.nn.relu(_conv1d(mel, params["layer1_w"], params["layer1_b"], padding=2))
    h = bn_fn(params["layer1_bn"], h)
    o2 = _res2_block(params["layer2"], h, dilation=2, bn_fn=bn_fn)
    o3 = _res2_block(params["layer3"], o2, dilation=3, bn_fn=bn_fn)
    o4 = _res2_block(params["layer4"], o3, dilation=4, bn_fn=bn_fn)
    cat = jnp.concatenate([o2, o3, o4], axis=-1)
    return jax.nn.relu(_conv1d(cat, params["conv_w"], params["conv_b"]))


def x_vector(params: Dict, mel: jax.Array) -> jax.Array:
    """Pooled speaker embedding (B, embed_dim) — the reference forward()'s
    first output (ecapa_tdnn.py:191-206): ECAPA latents -> ASTP attentive
    statistics pooling with global context (pooling_layers.py:92-144,
    global_context_att=True in the GLOB_c512 variant) -> BN -> linear.
    Unused by the timbre/tokenize path, kept for checkpoint completeness."""
    lat = ecapa_latents(params["ecapa"], mel)  # (B, T, C) channels-last
    xv = params["xvec"]
    # global context: per-channel mean/std over time, broadcast along T
    mean_c = jnp.mean(lat, axis=1, keepdims=True)
    std_c = jnp.sqrt(jnp.var(lat, axis=1, keepdims=True) + 1e-7)
    ones = jnp.ones_like(lat)
    x_in = jnp.concatenate([lat, mean_c * ones, std_c * ones], axis=-1)
    # k=1 convs are dense layers on the channel dim (channels-last)
    alpha = jnp.tanh(x_in @ xv["pool_lin1_w"][0] + xv["pool_lin1_b"])
    alpha = jax.nn.softmax(alpha @ xv["pool_lin2_w"][0] + xv["pool_lin2_b"], axis=1)
    mean = jnp.sum(alpha * lat, axis=1)
    var = jnp.sum(alpha * lat * lat, axis=1) - mean * mean
    std = jnp.sqrt(jnp.clip(var, 1e-7))
    out = _bn(xv["bn"], jnp.concatenate([mean, std], axis=-1))
    out = out @ xv["lin_w"] + xv["lin_b"]
    if "bn2" in xv:
        out = _bn(xv["bn2"], out)
    return out


# ---------------------------------------------------------------------------
# Perceiver resampler
# ---------------------------------------------------------------------------


def _perceiver_rms(p: Dict, x: jax.Array) -> jax.Array:
    """F.normalize(x) * sqrt(dim) * gamma (perceiver_encoder.py:195-214)."""
    n = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    return n * np.sqrt(x.shape[-1]) * p["gamma"]


def perceiver(params: Dict, cfg: SpeakerEncoderConfig, context: jax.Array,
              mask: Optional[jax.Array] = None) -> jax.Array:
    """context (B, T, 1536) -> latents (B, 32, latent_dim).

    Cross attention *includes the queries* in the context
    (perceiver_encoder.py:285-287), so the mask covers 32 + T keys."""
    B = context.shape[0]
    x = context @ params["proj_w"] + params["proj_b"]
    lat = jnp.broadcast_to(params["latents"], (B,) + params["latents"].shape)
    heads, dim_head = 8, 64
    for layer in params["layers"]:
        ctx = jnp.concatenate([lat, x], axis=1)
        q = (lat @ layer["to_q"]).reshape(B, -1, heads, dim_head)
        kv = ctx @ layer["to_kv"]
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(B, -1, heads, dim_head)
        v = v.reshape(B, -1, heads, dim_head)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k) / np.sqrt(dim_head)
        if mask is not None:
            big = jnp.finfo(sim.dtype).max
            sim = jnp.where(mask[:, None, None, :], sim, -big)
        att = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", att, v).reshape(B, -1, heads * dim_head)
        lat = out @ layer["to_out"] + lat
        # GEGLU feed-forward: Linear -> (x, gate) -> gelu(gate) * x -> Linear
        f = lat @ layer["ff1_w"] + layer["ff1_b"]
        a, g = jnp.split(f, 2, axis=-1)
        f = jax.nn.gelu(g, approximate=False) * a
        lat = f @ layer["ff2_w"] + layer["ff2_b"] + lat
    return _perceiver_rms(params["norm"], lat)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def mel_config(cfg: SpeakerEncoderConfig) -> MelConfig:
    return MelConfig(
        sample_rate=cfg.sample_rate, n_fft=cfg.n_fft, win_length=cfg.win_length,
        hop_length=cfg.hop_length, n_mels=cfg.n_mels, f_min=cfg.mel_fmin,
        f_max=cfg.mel_fmax,
    )


def tokenize_wav(
    params: Dict, cfg: SpeakerEncoderConfig, wav16k: jax.Array,
    wav_lens: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """wav (B, T) @16 kHz -> (timbre latents (B, 32, latent_dim), indices).

    Equivalent of SpeakerEncoder.tokenize_wav (speaker_encoder.py:136-144)
    followed by the runtime's `.mT` (infer_arvc.py:219-223)."""
    mel = stft.mel_spectrogram_center(wav16k, mel_config(cfg))  # (B, T', 128)
    feats = ecapa_latents(params["ecapa"], mel)
    T = feats.shape[1]
    if wav_lens is None:
        mask = None
    else:
        mel_lens = wav_lens // cfg.hop_length
        mask = jnp.arange(cfg.token_num + T)[None, :] < (mel_lens + cfg.token_num)[:, None]
    lat = perceiver(params["perceiver"], cfg, feats, mask)  # (B, 32, 128)
    zq, idx = quantizers.residual_fsq_encode(
        params["fsq"], lat, cfg.fsq_levels, cfg.fsq_num_quantizers
    )
    return zq, idx


# ---------------------------------------------------------------------------
# Converter
# ---------------------------------------------------------------------------


def convert(sd, cfg: SpeakerEncoderConfig) -> Dict:
    from streamvoiceanon_tpu.runtime.convert import to_numpy

    sd = to_numpy(sd)

    def bn(prefix):
        return {
            "mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"],
            "w": sd[f"{prefix}.weight"], "b": sd[f"{prefix}.bias"],
        }

    def conv_w(prefix):
        return np.transpose(sd[f"{prefix}.weight"], (2, 1, 0))

    def lin_w(prefix):
        return np.transpose(sd[f"{prefix}.weight"])

    e = "speaker_encoder"

    def res2(prefix):
        p = {
            "conv1_w": conv_w(f"{prefix}.se_res2block.0.conv"),
            "conv1_b": sd[f"{prefix}.se_res2block.0.conv.bias"],
            "bn1": bn(f"{prefix}.se_res2block.0.bn"),
            "conv2_w": conv_w(f"{prefix}.se_res2block.2.conv"),
            "conv2_b": sd[f"{prefix}.se_res2block.2.conv.bias"],
            "bn2": bn(f"{prefix}.se_res2block.2.bn"),
            "se1_w": lin_w(f"{prefix}.se_res2block.3.linear1"),
            "se1_b": sd[f"{prefix}.se_res2block.3.linear1.bias"],
            "se2_w": lin_w(f"{prefix}.se_res2block.3.linear2"),
            "se2_b": sd[f"{prefix}.se_res2block.3.linear2.bias"],
            "res2": [],
        }
        for i in range(7):  # scale 8 -> 7 convs
            p["res2"].append(
                {
                    "w": conv_w(f"{prefix}.se_res2block.1.convs.{i}"),
                    "b": sd[f"{prefix}.se_res2block.1.convs.{i}.bias"],
                    "bn": bn(f"{prefix}.se_res2block.1.bns.{i}"),
                }
            )
        return p

    ecapa = {
        "layer1_w": conv_w(f"{e}.layer1.conv"),
        "layer1_b": sd[f"{e}.layer1.conv.bias"],
        "layer1_bn": bn(f"{e}.layer1.bn"),
        "layer2": res2(f"{e}.layer2"),
        "layer3": res2(f"{e}.layer3"),
        "layer4": res2(f"{e}.layer4"),
        "conv_w": conv_w(f"{e}.conv"),
        "conv_b": sd[f"{e}.conv.bias"],
    }

    pv = "perceiver_sampler"
    layers = []
    for i in range(2):
        layers.append(
            {
                "to_q": lin_w(f"{pv}.layers.{i}.0.to_q"),
                "to_kv": lin_w(f"{pv}.layers.{i}.0.to_kv"),
                "to_out": lin_w(f"{pv}.layers.{i}.0.to_out"),
                "ff1_w": lin_w(f"{pv}.layers.{i}.1.0"),
                "ff1_b": sd[f"{pv}.layers.{i}.1.0.bias"],
                "ff2_w": lin_w(f"{pv}.layers.{i}.1.2"),
                "ff2_b": sd[f"{pv}.layers.{i}.1.2.bias"],
            }
        )
    perceiver_p = {
        "proj_w": lin_w(f"{pv}.proj_context"),
        "proj_b": sd[f"{pv}.proj_context.bias"],
        "latents": sd[f"{pv}.latents"],
        "layers": layers,
        "norm": {"gamma": sd[f"{pv}.norm.gamma"]},
    }

    fsq_p = {}
    if "quantizer.project_in.weight" in sd:
        fsq_p["project_in"] = {
            "w": lin_w("quantizer.project_in"),
            "b": sd["quantizer.project_in.bias"],
        }
        fsq_p["project_out"] = {
            "w": lin_w("quantizer.project_out"),
            "b": sd["quantizer.project_out.bias"],
        }

    # x-vector head: ASTP attentive-stats pooling + BN + linear
    # (ecapa_tdnn.py:179-206).  The timbre path discards its output
    # (speaker_encoder.py:131 `_, features = ...`), but the published
    # checkpoint contains the weights — consume them and expose `x_vector`
    # so the key-coverage contract holds and the reference's forward()
    # x_vector output stays available.
    xvec = {
        "pool_lin1_w": conv_w(f"{e}.pool.linear1"),  # (1, in, bott) k=1 conv
        "pool_lin1_b": sd[f"{e}.pool.linear1.bias"],
        "pool_lin2_w": conv_w(f"{e}.pool.linear2"),
        "pool_lin2_b": sd[f"{e}.pool.linear2.bias"],
        "bn": bn(f"{e}.bn"),
        "lin_w": lin_w(f"{e}.linear"),
        "lin_b": sd[f"{e}.linear.bias"],
    }
    if f"{e}.bn2.running_mean" in sd:  # emb_bn variant
        xvec["bn2"] = bn(f"{e}.bn2")

    return jax.tree.map(
        jnp.asarray,
        {"ecapa": ecapa, "perceiver": perceiver_p, "fsq": fsq_p, "xvec": xvec},
    )
