"""ASR_eval: training a utility-evaluation speech recognizer natively.

Framework equivalent of the reference's ASR eval-model training
(`anon/evaluation/utility/asr/train_asr_eval.py` + the speechbrain
LibriSpeech recipes, SURVEY.md §2.3): the reference fine-tunes an external
wav2vec2/CRDNN speechbrain ASR on (anonymized) data and uses it to score
WER.  Here the eval recognizer is a compact char-level CTC model trained in
JAX — kaldi fbank front-end, conv subsampling, a non-causal transformer
encoder (eval models need no streaming), CTC loss — producing a
`transcriber(wav, sr) -> text` callable that plugs directly into
`evals.wer.evaluate_asr`.

Everything is jitted with static shapes (padded batches) and runs on the
'data' mesh axis unchanged; utterances are bucketed by length host-side.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from streamvoiceanon_tpu.audio import fbank as fbank_mod

BLANK = 0


@dataclasses.dataclass
class ASREvalConfig:
    feat_dim: int = 80
    dim: int = 128
    n_layers: int = 2
    n_heads: int = 4
    ffn_mult: int = 4
    subsample: int = 4           # two stride-2 convs
    steps: int = 400
    batch_size: int = 8
    lr: float = 1e-3
    max_frames: int = 512        # padded feature frames (pre-subsample)
    max_label_len: int = 128
    sample_rate: int = 16000
    seed: int = 0


def build_vocab(texts: Sequence[str]) -> Dict[str, int]:
    """Char vocab; id 0 is the CTC blank."""
    chars = sorted({c for t in texts for c in t})
    return {c: i + 1 for i, c in enumerate(chars)}


def encode_text(text: str, vocab: Dict[str, int]) -> List[int]:
    return [vocab[c] for c in text if c in vocab]


def decode_ids(ids: Sequence[int], vocab: Dict[str, int]) -> str:
    inv = {i: c for c, i in vocab.items()}
    return "".join(inv.get(i, "") for i in ids)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def init_params(key, cfg: ASREvalConfig, vocab_size: int) -> Dict:
    ks = jax.random.split(key, 4 + cfg.n_layers)

    def lin(k, din, dout):
        return {
            "w": jax.random.normal(k, (din, dout), jnp.float32)
            * np.sqrt(2.0 / din),
            "b": jnp.zeros((dout,), jnp.float32),
        }

    def layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "qkv": lin(k1, cfg.dim, 3 * cfg.dim),
            "out": lin(k2, cfg.dim, cfg.dim),
            "ff1": lin(k3, cfg.dim, cfg.ffn_mult * cfg.dim),
            "ff2": lin(k4, cfg.ffn_mult * cfg.dim, cfg.dim),
            "ln1": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
            "ln2": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
        }

    return {
        # two stride-2 1-D convs over time (kernel 3)
        "conv1": {
            "w": jax.random.normal(ks[0], (3, cfg.feat_dim, cfg.dim))
            * np.sqrt(2.0 / (3 * cfg.feat_dim)),
            "b": jnp.zeros((cfg.dim,)),
        },
        "conv2": {
            "w": jax.random.normal(ks[1], (3, cfg.dim, cfg.dim))
            * np.sqrt(2.0 / (3 * cfg.dim)),
            "b": jnp.zeros((cfg.dim,)),
        },
        "layers": [layer(k) for k in ks[2 : 2 + cfg.n_layers]],
        "out": lin(ks[-1], cfg.dim, vocab_size + 1),
    }


def _ln(p, x):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * p["g"] + p["b"]


def forward(params: Dict, cfg: ASREvalConfig, feat: jax.Array,
            feat_mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """feat (B, T, 80), mask (B, T) -> (logits (B, T//4, V+1), out_mask)."""
    x = feat
    for cname in ("conv1", "conv2"):
        w, b = params[cname]["w"], params[cname]["b"]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(2,), padding="SAME",
            dimension_numbers=("NTC", "TIO", "NTC"),
        ) + b
        x = jax.nn.relu(x)
        feat_mask = feat_mask[:, ::2]
    T = x.shape[1]
    # sinusoidal positions (non-causal encoder)
    pos = jnp.arange(T)[:, None] / (10000 ** (jnp.arange(0, cfg.dim, 2) / cfg.dim))
    pe = jnp.zeros((T, cfg.dim)).at[:, 0::2].set(jnp.sin(pos)).at[:, 1::2].set(jnp.cos(pos))
    x = x + pe[None]
    attn_bias = jnp.where(feat_mask[:, None, None, :], 0.0, -1e9)
    H = cfg.n_heads
    hd = cfg.dim // H
    for lp in params["layers"]:
        h = _ln(lp["ln1"], x)
        qkv = h @ lp["qkv"]["w"] + lp["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B = x.shape[0]
        q = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        a = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd) + attn_bias, -1)
        h = (a @ v).transpose(0, 2, 1, 3).reshape(B, T, cfg.dim)
        x = x + h @ lp["out"]["w"] + lp["out"]["b"]
        h = _ln(lp["ln2"], x)
        h = jax.nn.gelu(h @ lp["ff1"]["w"] + lp["ff1"]["b"])
        x = x + h @ lp["ff2"]["w"] + lp["ff2"]["b"]
    logits = x @ params["out"]["w"] + params["out"]["b"]
    return logits, feat_mask


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def _features(wavs: List[np.ndarray], cfg: ASREvalConfig,
              max_frames: Optional[int] = None):
    """Padded fbank batch (B, max_frames, 80) + mask.  `max_frames` defaults
    to the training window; inference callers pass a per-utterance bucket so
    long audio is never truncated."""
    if max_frames is None:
        max_frames = cfg.max_frames
    feats = []
    for w in wavs:
        f = np.asarray(fbank_mod.fbank(jnp.asarray(w, jnp.float32)[None]))[0]
        feats.append(f - f.mean(axis=0, keepdims=True))
    B = len(feats)
    out = np.zeros((B, max_frames, cfg.feat_dim), np.float32)
    mask = np.zeros((B, max_frames), bool)
    for i, f in enumerate(feats):
        n = min(len(f), max_frames)
        out[i, :n] = f[:n]
        mask[i, :n] = True
    return out, mask


def train_asr_eval(
    utterances: Sequence,            # evals.anonymize.Utterance with .wav @16k
    texts: Dict[str, str],           # utt_id -> transcript
    cfg: ASREvalConfig = ASREvalConfig(),
    utt_sample_rate: int = 16000,
    history: list | None = None,
) -> Tuple[Dict, Dict[str, int]]:
    """Trains the CTC eval recognizer; returns (params, vocab)."""
    from streamvoiceanon_tpu.audio.resample import resample

    wavs, labels = [], []
    vocab = build_vocab([texts[u.utt_id] for u in utterances])
    for u in utterances:
        w = np.asarray(
            resample(jnp.asarray(u.wav, jnp.float32)[None], utt_sample_rate,
                     cfg.sample_rate)
        )[0]
        wavs.append(w)
        labels.append(encode_text(texts[u.utt_id], vocab))

    key = jax.random.PRNGKey(cfg.seed)
    params = init_params(key, cfg, len(vocab))
    tx = optax.adamw(cfg.lr, weight_decay=1e-5)
    opt_state = tx.init(params)

    lab = np.zeros((len(labels), cfg.max_label_len), np.int32)
    lab_pad = np.ones((len(labels), cfg.max_label_len), np.float32)
    for i, l in enumerate(labels):
        n = min(len(l), cfg.max_label_len)
        lab[i, :n] = l[:n]
        lab_pad[i, :n] = 0.0

    feats, masks = _features(wavs, cfg)

    def loss_fn(p, f, m, y, ypad):
        logits, om = forward(p, cfg, f, m)
        logit_pad = 1.0 - om.astype(jnp.float32)
        per = optax.ctc_loss(logits, logit_pad, y, ypad, blank_id=BLANK)
        label_lens = jnp.maximum(jnp.sum(1.0 - ypad, axis=-1), 1.0)
        return jnp.mean(per / label_lens)

    @jax.jit
    def step(p, s, f, m, y, ypad):
        loss, g = jax.value_and_grad(loss_fn)(p, f, m, y, ypad)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    rng = np.random.default_rng(cfg.seed)
    n = len(wavs)
    for _ in range(cfg.steps):
        idx = rng.integers(n, size=min(cfg.batch_size, n))
        p_, s_, loss = step(
            params, opt_state, jnp.asarray(feats[idx]), jnp.asarray(masks[idx]),
            jnp.asarray(lab[idx]), jnp.asarray(lab_pad[idx]),
        )
        params, opt_state = p_, s_
        if history is not None:
            history.append(float(loss))
    return params, vocab


def greedy_ctc_decode(logits: np.ndarray, mask: np.ndarray,
                      vocab: Dict[str, int]) -> str:
    """Best-path decode: collapse repeats, drop blanks."""
    ids = np.argmax(logits, axis=-1)
    out = []
    prev = -1
    for i, t in zip(ids, mask):
        if not t:
            break
        if i != prev and i != BLANK:
            out.append(int(i))
        prev = i
    return decode_ids(out, vocab)


def make_transcriber(params: Dict, vocab: Dict[str, int],
                     cfg: ASREvalConfig = ASREvalConfig()) -> Callable:
    """Returns `transcriber(wav, sr) -> text` for evals.wer.evaluate_asr."""
    from streamvoiceanon_tpu.audio.resample import resample

    fwd = jax.jit(lambda p, f, m: forward(p, cfg, f, m))

    def transcriber(wav: np.ndarray, sr: int) -> str:
        w = np.asarray(
            resample(jnp.asarray(wav, jnp.float32)[None], sr, cfg.sample_rate)
        )[0]
        # no truncation at inference: pad to a 128-frame bucket (few compile
        # variants, full audio always seen; fbank ~100 frames/s)
        n_frames = max(len(w) // 160, 1)
        bucket = int(np.ceil(n_frames / 128)) * 128
        feats, mask = _features([w], cfg, max_frames=bucket)
        logits, om = fwd(params, jnp.asarray(feats), jnp.asarray(mask))
        return greedy_ctc_decode(np.asarray(logits)[0], np.asarray(om)[0], vocab)

    return transcriber
