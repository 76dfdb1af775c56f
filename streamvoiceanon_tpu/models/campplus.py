"""CAM++ (D-TDNN) speaker style encoder.

Behavior matches reference modules/campplus/DTDNN.py:13-138 and layers.py:
FCM 2-D residual stem -> dense CAM-TDNN blocks (12/24/16 layers, growth 32)
with transit layers -> masked stats pooling -> 192-d embedding.  Frozen at
inference; BatchNorm uses running statistics.

Input is kaldi fbank features (B, T, 80), already mean-normalized per
utterance (infer_arvc.py:192 subtracts the per-utterance mean).
All convs here are channels-last; 2-D convs are NHWC with H=frequency.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from streamvoiceanon_tpu.config import CAMPPlusConfig


def _bn(p: Dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Inference BatchNorm over the channel (last) axis."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    y = (x - p["mean"]) * inv
    if "w" in p:
        y = y * p["w"] + p["b"]
    return y


def _conv2d(x, w, *, stride=(1, 1)):
    """x: (B, H, W, Cin), w: (kh, kw, Cin, Cout), padding SAME-1."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _conv1d(x, w, b=None, *, stride=1, dilation=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((padding, padding),),
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return y + b if b is not None else y


def _res_block(p: Dict, x: jax.Array, stride: int) -> jax.Array:
    h = jax.nn.relu(_bn(p["bn1"], _conv2d(x, p["conv1"], stride=(stride, 1))))
    h = _bn(p["bn2"], _conv2d(h, p["conv2"]))
    if "shortcut_conv" in p:
        s = jax.lax.conv_general_dilated(
            x, p["shortcut_conv"], window_strides=(stride, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        s = _bn(p["shortcut_bn"], s)
    else:
        s = x
    return jax.nn.relu(h + s)


def _fcm(p: Dict, x: jax.Array) -> jax.Array:
    """x: (B, T, F=80) -> (B, T, 32 * F//8) (DTDNN.py:39-48)."""
    h = jnp.transpose(x, (0, 2, 1))[..., None]  # (B, F, T, 1)
    h = jax.nn.relu(_bn(p["bn1"], _conv2d(h, p["conv1"])))
    for i, blk in enumerate(p["layer1"]):
        h = _res_block(blk, h, stride=2 if i == 0 else 1)
    for i, blk in enumerate(p["layer2"]):
        h = _res_block(blk, h, stride=2 if i == 0 else 1)
    h = jax.nn.relu(_bn(p["bn2"], _conv2d(h, p["conv2"], stride=(2, 1))))
    # (B, F//8, T, C) -> (B, T, C * F//8); torch reshapes (B, C*F', T) with C
    # outer — match that ordering
    B, Fp, T, C = h.shape
    h = jnp.transpose(h, (0, 3, 1, 2)).reshape(B, C * Fp, T)
    return jnp.transpose(h, (0, 2, 1))


def _cam_layer(p: Dict, x: jax.Array, kernel: int, dilation: int, seg_len: int = 100) -> jax.Array:
    """Context-aware mask conv (layers.py:84-124).  x: (B, T, C)."""
    pad = (kernel - 1) // 2 * dilation
    y = _conv1d(x, p["local_w"], None, dilation=dilation, padding=pad)
    mean_ctx = jnp.mean(x, axis=1, keepdims=True)
    # segment pooling: average within fixed 100-frame segments (ceil mode)
    B, T, C = x.shape
    nseg = -(-T // seg_len)
    padded = jnp.pad(x, ((0, 0), (0, nseg * seg_len - T), (0, 0)))
    seg = padded.reshape(B, nseg, seg_len, C)
    counts = jnp.clip(
        jnp.minimum(seg_len, T - jnp.arange(nseg) * seg_len), 1, seg_len
    )[None, :, None]
    seg = jnp.sum(seg, axis=2) / counts
    seg_full = jnp.repeat(seg, seg_len, axis=1)[:, :T]
    ctx = mean_ctx + seg_full
    m = jax.nn.relu(ctx @ p["fc1_w"] + p["fc1_b"])
    m = jax.nn.sigmoid(m @ p["fc2_w"] + p["fc2_b"])
    return y * m


def _dense_layer(p: Dict, x: jax.Array, kernel: int, dilation: int) -> jax.Array:
    h = jax.nn.relu(_bn(p["nl1"], x))
    h = _conv1d(h, p["lin1_w"])
    h = jax.nn.relu(_bn(p["nl2"], h))
    return _cam_layer(p["cam"], h, kernel, dilation)


def apply(params: Dict, cfg: CAMPPlusConfig, feat: jax.Array,
          feat_lens: Optional[jax.Array] = None) -> jax.Array:
    """feat (B, T, 80) mean-normalized -> style vector (B, embedding_size).

    feat_lens follows the runtime convention: valid frames at the *pooled*
    (stride-2) rate, i.e. input_frames // 2 (infer_arvc.py:195-200)."""
    x = _fcm(params["fcm"], feat)
    x = _conv1d(x, params["tdnn_conv"], stride=2, padding=2)
    x = jax.nn.relu(_bn(params["tdnn_bn"], x))
    for bi, (n_layers, k, dil) in enumerate(
        zip(cfg.block_layers, cfg.block_kernels, cfg.block_dilations)
    ):
        for lp in params[f"block{bi+1}"]:
            x = jnp.concatenate([x, _dense_layer(lp, x, k, dil)], axis=-1)
        tp = params[f"transit{bi+1}"]
        x = jax.nn.relu(_bn(tp["bn"], x))
        x = _conv1d(x, tp["w"])
    x = jax.nn.relu(_bn(params["out_bn"], x))

    # masked statistics pooling (layers.py:34-44): mean + unbiased std
    B, T, C = x.shape
    if feat_lens is None:
        n = jnp.full((B, 1), T, jnp.float32)
        mask = jnp.ones((B, T, 1), jnp.float32)
    else:
        mask = (jnp.arange(T)[None, :] < feat_lens[:, None]).astype(jnp.float32)[..., None]
        n = feat_lens[:, None].astype(jnp.float32)
    mean = jnp.sum(x * mask, axis=1) / n
    var = jnp.sum((x - mean[:, None]) ** 2 * mask, axis=1) / jnp.maximum(n - 1.0, 1.0)
    stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)

    out = stats @ params["dense_w"][0]
    return _bn(params["dense_bn"], out)


# ---------------------------------------------------------------------------
# Converter
# ---------------------------------------------------------------------------


def _t_bn(sd, prefix) -> Dict:
    p = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    if f"{prefix}.weight" in sd:
        p["w"] = sd[f"{prefix}.weight"]
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _t_conv2d(sd, prefix) -> np.ndarray:
    return np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))  # -> (kh, kw, in, out)


def _t_conv1d_w(sd, prefix) -> np.ndarray:
    return np.transpose(sd[f"{prefix}.weight"], (2, 1, 0))


def convert(sd, cfg: CAMPPlusConfig) -> Dict:
    """Reference CAMPPlus state_dict -> params (handles the repo's key remap
    of stats/dense, DTDNN.py:113-130)."""
    from streamvoiceanon_tpu.runtime.convert import rename_keys, to_numpy

    sd = rename_keys(
        to_numpy(sd),
        lambda k: k.replace("xvector.stats", "stats").replace("xvector.dense", "dense"),
    )

    def res_block(prefix):
        p = {
            "conv1": _t_conv2d(sd, f"{prefix}.conv1"),
            "bn1": _t_bn(sd, f"{prefix}.bn1"),
            "conv2": _t_conv2d(sd, f"{prefix}.conv2"),
            "bn2": _t_bn(sd, f"{prefix}.bn2"),
        }
        if f"{prefix}.shortcut.0.weight" in sd:
            p["shortcut_conv"] = _t_conv2d(sd, f"{prefix}.shortcut.0")
            p["shortcut_bn"] = _t_bn(sd, f"{prefix}.shortcut.1")
        return p

    fcm = {
        "conv1": _t_conv2d(sd, "head.conv1"),
        "bn1": _t_bn(sd, "head.bn1"),
        "conv2": _t_conv2d(sd, "head.conv2"),
        "bn2": _t_bn(sd, "head.bn2"),
        "layer1": [res_block(f"head.layer1.{i}") for i in range(2)],
        "layer2": [res_block(f"head.layer2.{i}") for i in range(2)],
    }
    p: Dict = {
        "fcm": fcm,
        "tdnn_conv": _t_conv1d_w(sd, "xvector.tdnn.linear"),
        "tdnn_bn": _t_bn(sd, "xvector.tdnn.nonlinear.batchnorm"),
        "out_bn": _t_bn(sd, "xvector.out_nonlinear.batchnorm"),
        "dense_w": _t_conv1d_w(sd, "dense.linear"),
        "dense_bn": _t_bn(sd, "dense.nonlinear.batchnorm"),
    }
    for bi, n_layers in enumerate(cfg.block_layers):
        layers = []
        for li in range(n_layers):
            lp = f"xvector.block{bi+1}.tdnnd{li+1}"
            layers.append(
                {
                    "nl1": _t_bn(sd, f"{lp}.nonlinear1.batchnorm"),
                    "lin1_w": _t_conv1d_w(sd, f"{lp}.linear1"),
                    "nl2": _t_bn(sd, f"{lp}.nonlinear2.batchnorm"),
                    "cam": {
                        "local_w": _t_conv1d_w(sd, f"{lp}.cam_layer.linear_local"),
                        "fc1_w": _t_conv1d_w(sd, f"{lp}.cam_layer.linear1")[0],
                        "fc1_b": sd[f"{lp}.cam_layer.linear1.bias"],
                        "fc2_w": _t_conv1d_w(sd, f"{lp}.cam_layer.linear2")[0],
                        "fc2_b": sd[f"{lp}.cam_layer.linear2.bias"],
                    },
                }
            )
        p[f"block{bi+1}"] = layers
        p[f"transit{bi+1}"] = {
            "bn": _t_bn(sd, f"xvector.transit{bi+1}.nonlinear.batchnorm"),
            "w": _t_conv1d_w(sd, f"xvector.transit{bi+1}.linear"),
        }
    return jax.tree.map(jnp.asarray, p)
