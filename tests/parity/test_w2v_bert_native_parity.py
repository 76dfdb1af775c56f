"""Native w2v-BERT conformer encoder vs the HF torch implementation.

The HF model code is local (transformers is installed); a tiny
randomly-initialized Wav2Vec2BertModel is the golden reference, converted
through w2v_bert_native.convert (the same path the published
facebook/w2v-bert-2.0 state_dict takes)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from streamvoiceanon_tpu.models import w2v_bert_native as wn  # noqa: E402


def _tiny_pair():
    hf_cfg = transformers.Wav2Vec2BertConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, feature_projection_input_dim=16,
        conv_depthwise_kernel_size=7, left_max_position_embeddings=4,
        right_max_position_embeddings=2, position_embeddings_type="relative_key",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, conformer_conv_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0, mask_feature_prob=0.0,
    )
    torch.manual_seed(0)
    ref = transformers.Wav2Vec2BertModel(hf_cfg).eval()
    cfg = wn.W2VBertConfig(
        feat_dim=16, hidden=32, n_layers=3, n_heads=4, intermediate=64,
        conv_kernel=7, left_max_pos=4, right_max_pos=2,
    )
    params = wn.convert({k: v.detach().numpy() for k, v in ref.state_dict().items()}, cfg)
    return ref, cfg, params


def test_w2v_bert_full_forward_allclose():
    ref, cfg, params = _tiny_pair()
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 19, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref(input_features=torch.from_numpy(feats)).last_hidden_state.numpy()
    got = np.asarray(wn.apply(params, cfg, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_w2v_bert_masked_forward_allclose():
    ref, cfg, params = _tiny_pair()
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 17, 16)).astype(np.float32)
    mask = np.ones((2, 17), np.int64)
    mask[0, 11:] = 0
    mask[1, 14:] = 0
    with torch.no_grad():
        want = ref(
            input_features=torch.from_numpy(feats),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(wn.apply(params, cfg, jnp.asarray(feats), mask=jnp.asarray(mask)))
    # compare valid positions only (padded outputs are unspecified)
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :n], want[b, :n], atol=2e-4, rtol=1e-4)


def test_w2v_bert_layer_truncation_matches_hidden_states():
    """num_layers=n == HF output_hidden_states[n] (the teacher's layer-17
    truncation, w2v_bert2.py:23-24,79)."""
    ref, cfg, params = _tiny_pair()
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1, 13, 16)).astype(np.float32)
    with torch.no_grad():
        hs = ref(
            input_features=torch.from_numpy(feats), output_hidden_states=True
        ).hidden_states
    for n in (1, 2):
        got = np.asarray(wn.apply(params, cfg, jnp.asarray(feats), num_layers=n))
        np.testing.assert_allclose(got, hs[n].numpy(), atol=2e-4, rtol=1e-4)


def test_stacked_features_matches_seamless_extractor():
    """Native featurization == transformers SeamlessM4TFeatureExtractor
    (constructed locally, no checkpoint) on a ragged batch."""
    from transformers import SeamlessM4TFeatureExtractor

    fe = SeamlessM4TFeatureExtractor()
    rng = np.random.default_rng(0)
    lens = [4000, 3210]
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lens]
    want = fe(wavs, sampling_rate=16000, return_tensors="np")

    T = max(lens)
    batch = np.zeros((2, T), np.float32)
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
    feats, mask = wn.stacked_features(
        jnp.asarray(batch), x_lens=jnp.asarray(lens)
    )
    feats, mask = np.asarray(feats), np.asarray(mask)

    wf = want["input_features"]
    wm = np.asarray(want["attention_mask"])
    assert mask.shape == wm.shape and (mask == wm).all()
    for b in range(2):
        n = int(wm[b].sum())
        np.testing.assert_allclose(feats[b, :n], wf[b, :n], atol=2e-4, rtol=1e-4)
