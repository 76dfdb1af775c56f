"""Frozen w2v-BERT 2.0 teacher (tokenizer-training distillation target).

The reference wraps HF `facebook/w2v-bert-2.0` truncated at layer 17
(modules/wav2vec/w2v_bert2.py:10-84).  On TPU the teacher runs through
transformers' flax/torch model on the host or as precomputed features; this
wrapper prefers precomputed features and falls back to the HF model when the
checkpoint is available (needs network or a local cache).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class W2vBertTeacher:
    def __init__(self, layer: int = 17, model_name: str = "facebook/w2v-bert-2.0"):
        self.layer = layer
        self.model_name = model_name
        self._model = None
        self._processor = None

    def _load(self):
        if self._model is None:
            import torch  # noqa: F401
            from transformers import AutoFeatureExtractor, Wav2Vec2BertModel

            self._processor = AutoFeatureExtractor.from_pretrained(self.model_name)
            self._model = Wav2Vec2BertModel.from_pretrained(self.model_name).eval()

    def features(self, wav16k: np.ndarray) -> np.ndarray:
        """wav (B, T) @16 kHz -> layer-`layer` hidden states (B, T//320, 1024).

        Matches the reference's +-160-sample padding and feature rate
        (w2v_bert2.py:44-83)."""
        import torch

        self._load()
        wav = np.pad(np.asarray(wav16k), ((0, 0), (160, 160)))
        inputs = self._processor(
            [w for w in wav], sampling_rate=16000, return_tensors="pt", padding=True
        )
        with torch.no_grad():
            out = self._model(
                **inputs, output_hidden_states=True
            ).hidden_states[self.layer]
        return out.numpy()
