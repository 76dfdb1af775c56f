"""Parity of the ASR decoder s2s loss against the PyTorch reference."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from streamvoiceanon_tpu.models import asr_decoder

ref_mod = pytest.importorskip("modules.asr.asr_decoder")


@pytest.mark.parity
def test_asr_s2s_loss_parity(rng):
    cfg = asr_decoder.ASRDecoderConfig(
        hidden_dim=64, num_heads=4, depth=2, block_size=256, in_channels=48,
        n_vocab=120, bos_id=100, eos_id=99,
    )
    torch.manual_seed(0)
    ref = ref_mod.ASRDecoder(
        hidden_dim=cfg.hidden_dim, num_heads=cfg.num_heads, depth=cfg.depth,
        block_size=cfg.block_size, in_channels=cfg.in_channels,
        n_vocab=cfg.n_vocab, bos_id=cfg.bos_id, eos_id=cfg.eos_id,
    ).eval()

    # convert
    from streamvoiceanon_tpu.runtime.convert import to_numpy, linear, norm
    from streamvoiceanon_tpu.models.dual_ar import stack_layers

    sd = to_numpy(ref.state_dict())
    layers = []
    for i in range(cfg.depth):
        lp = f"transformer.layers.{i}"
        layers.append(
            {
                "wqkv": linear(sd, f"{lp}.attention.wqkv"),
                "wo": linear(sd, f"{lp}.attention.wo"),
                # AdaptiveLayerNorm with no conditioning == its inner RMSNorm
                "attention_norm": norm(sd, f"{lp}.attention_norm.norm"),
                "ffn_norm": norm(sd, f"{lp}.ffn_norm.norm"),
                "w1": linear(sd, f"{lp}.feed_forward.w1"),
                "w2": linear(sd, f"{lp}.feed_forward.w2"),
                "w3": linear(sd, f"{lp}.feed_forward.w3"),
            }
        )
    params = {
        "layers": stack_layers(layers),
        "norm": norm(sd, "transformer.norm.norm"),
        "text_embedding": sd["text_embedding.weight"],
        "prediction_head": linear(sd, "prediction_head"),
        "audio_proj": linear(sd, "audio_feat_projection"),
    }
    params = jax.tree.map(jnp.asarray, params)

    B, Ta, Tt = 2, 10, 7
    feats = rng.standard_normal((B, Ta, cfg.in_channels)).astype(np.float32)
    audio_lens = np.array([10, 8])
    text = rng.integers(0, 90, (B, Tt))
    text_lens = np.array([7, 5])

    with torch.no_grad():
        loss_ref = ref(
            torch.from_numpy(feats), torch.from_numpy(audio_lens),
            torch.from_numpy(text.copy()), torch.from_numpy(text_lens),
        ).item()

    loss = asr_decoder.forward(
        params, cfg, jnp.asarray(feats), jnp.asarray(audio_lens),
        jnp.asarray(text), jnp.asarray(text_lens),
    )
    np.testing.assert_allclose(float(loss), loss_ref, atol=2e-4, rtol=1e-4)
