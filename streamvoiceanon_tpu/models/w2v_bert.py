"""Frozen w2v-BERT 2.0 teacher (tokenizer-training distillation target).

The reference wraps HF `facebook/w2v-bert-2.0` truncated at layer 17
(modules/wav2vec/w2v_bert2.py:10-84).  Three teacher paths here, by
preference: (1) precomputed features; (2) `native=True` — the checkpoint
converted once through `models/w2v_bert_native.convert` and run as a
TPU-resident scanned conformer (parity-tested vs HF); (3) the HF torch
module on the host.  Paths 2/3 need the published checkpoint (or cache).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class W2vBertTeacher:
    def __init__(self, layer: int = 17, model_name: str = "facebook/w2v-bert-2.0",
                 native: bool = False):
        self.layer = layer
        self.model_name = model_name
        self.native = native
        self._model = None
        self._processor = None
        self._native_params = None
        self._native_cfg = None

    def _load(self):
        if self._model is None:
            import torch  # noqa: F401
            from transformers import AutoFeatureExtractor, Wav2Vec2BertModel

            self._processor = AutoFeatureExtractor.from_pretrained(self.model_name)
            self._model = Wav2Vec2BertModel.from_pretrained(self.model_name).eval()

    def _load_native(self):
        if self._native_params is None:
            from transformers import Wav2Vec2BertModel

            from streamvoiceanon_tpu.models import w2v_bert_native as wn

            hf = Wav2Vec2BertModel.from_pretrained(self.model_name)
            self._native_cfg = wn.W2VBertConfig()
            self._native_params = wn.convert(
                {k: v.detach().numpy() for k, v in hf.state_dict().items()},
                self._native_cfg,
            )
            del hf

    def features(self, wav16k: np.ndarray) -> np.ndarray:
        """wav (B, T) @16 kHz -> layer-`layer` hidden states (B, T//320, 1024).

        Matches the reference's +-160-sample padding and feature rate
        (w2v_bert2.py:44-83)."""
        wav = np.pad(np.asarray(wav16k), ((0, 0), (160, 160)))
        if self.native:
            import jax.numpy as jnp

            from streamvoiceanon_tpu.models import w2v_bert_native as wn

            self._load_native()
            # native featurization (parity-tested vs SeamlessM4T extractor):
            # only the model weights come from the checkpoint
            feats, mask = wn.stacked_features(jnp.asarray(wav))
            out = wn.apply(
                self._native_params, self._native_cfg, feats, mask=mask,
                num_layers=self.layer,
            )
            return np.asarray(out)

        import torch

        self._load()
        inputs = self._processor(
            [w for w in wav], sampling_rate=16000, return_tensors="pt", padding=True
        )
        with torch.no_grad():
            out = self._model(
                **inputs, output_hidden_states=True
            ).hidden_states[self.layer]
        return out.numpy()
