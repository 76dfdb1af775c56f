"""Typed configuration tree for the whole framework.

Replaces the reference's three-tier YAML/hydra config system
(`configs/config_firefly_arvcasr_8192_delay0_8.yaml`,
`configs/hydra_arcs/**`, argparse flags — SURVEY.md §LX) with frozen
dataclasses.  Default values reproduce the published model family
`config_firefly_arvcasr_8192_delay0_8`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _find_multiple(n: int, k: int) -> int:
    return n if n % k == 0 else n + k - (n % k)


# ---------------------------------------------------------------------------
# DSP front-end
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MelConfig:
    """Causal log-mel front end (cf. reference modules/vqgan/spectrogram.py:7-130)."""

    sample_rate: int = 44100
    n_fft: int = 2048
    win_length: int = 2048
    hop_length: int = 512
    n_mels: int = 160
    f_min: float = 0.0
    f_max: Optional[float] = None  # None -> sample_rate // 2

    @property
    def fmax(self) -> float:
        return float(self.sample_rate // 2) if self.f_max is None else self.f_max


# ---------------------------------------------------------------------------
# ConvNeXt backbone
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ConvNeXtConfig:
    """Causal ConvNeXt encoder (cf. reference modules/vqgan/modules/firefly.py:443-517)."""

    input_channels: int = 160
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (128, 256, 384, 512)
    kernel_size: int = 7
    mlp_ratio: float = 4.0
    layer_scale_init_value: float = 1e-6
    gin_channels: int = 0  # optional global conditioning (firefly.py:498)
    drop_path_rate: float = 0.0


# ---------------------------------------------------------------------------
# Transformers
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WindowedTransformerConfig:
    """Window-limited causal transformer used inside the tokenizer
    (cf. reference modules/vqgan/windowed_transformer.py:21-43,275-354)."""

    block_size: int = 2048
    n_layer: int = 8
    n_head: int = 8
    dim: int = 512
    intermediate_size: int = 1536
    head_dim: int = 64
    rope_base: float = 10000.0
    norm_eps: float = 1e-5
    layer_scale_init: float = 1e-2
    window_size: Optional[int] = 512
    causal: bool = True
    # depthwise-conv (LConv1d) branch between attention and FFN
    # (windowed_transformer.py:34-35,141,197-234; default off, matching the
    # deployed tokenizer config)
    dw_conv: bool = False
    conv_kernel_size: int = 5
    # Run the streaming ring step (one new token through all layers) in one
    # grid-pipelined Pallas kernel (ops/pallas_wt_stream.py).  Changes the
    # RingState layout to flat circular absolute-rope (L, B, W,
    # n_head*head_dim) rows.  Batch > 1 uses an XLA step with the same
    # circular semantics; dw_conv keeps the rotated-frame layout.
    use_pallas_stream: bool = False
    # rope-table rows for the circular layout: effective positions live in
    # [W, rope_table_rows); the ring is re-based (one elementwise rotation)
    # every rope_table_rows - window_size tokens.  Must be > 2 * window_size.
    rope_table_rows: int = 4096


@dataclass(frozen=True)
class DualARConfig:
    """Dual-autoregressive token LM (cf. reference modules/dual_ar_stream.py:24-129
    and configs/hydra_arcs/vc/firefly_arvc_bsq_8192_delay0_8.yaml)."""

    vocab_size: int = 8192  # semantic/content token vocab, no eos
    n_layer: int = 12
    n_head: int = 12
    dim: int = 768
    intermediate_size: int = 2304
    n_local_heads: int = -1
    head_dim: int = 64
    rope_base: float = 10000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 2048
    dropout: float = 0.1
    tie_word_embeddings: bool = False
    attention_qkv_bias: bool = False

    codebook_size: int = 1000
    num_codebooks: int = 8

    # fast (per-frame codebook) transformer
    n_fast_layer: int = 4
    fast_dim: int = 768
    fast_n_head: int = 12
    fast_n_local_heads: int = -1
    fast_head_dim: int = 64
    fast_intermediate_size: int = 2304

    # delay machinery: a tuple means the model was trained on a range of
    # delays and the runtime may pick any of them (dual_ar_stream.py:649-657)
    delay: Tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7, 8)

    cond_input_dim: int = 768
    style_input_dim: int = 192

    # Route the slow-stack frame-decode attention through the fused Pallas
    # update+attend kernel (ops/pallas_attention.py).  The KV caches are then
    # stored pre-padded to 128 lanes (Mosaic tile alignment), so this is a
    # state-layout choice, not just a code path.  Benchmark before enabling:
    # at head_dim 64 / MHA the XLA path is already near the HBM-bandwidth
    # floor and the kernel's full-block cache writeback doubles traffic
    # (BENCH.md "decode attention" section).
    use_pallas_decode: bool = False

    # Route the fast codebook loop through the VMEM-resident Pallas decoder
    # (ops/pallas_fast_decode.py): all 4 fast layers stay in VMEM across the
    # 8 AR steps, cutting the ~8x weight re-read that dominates the LM decode
    # stage (measured 1.5 -> 0.64 ms/frame on v5e).  Sampling inside the
    # kernel is the exact full-vocab nucleus filter (top_k_window=0
    # semantics).  Applies to single-stream decode (batch 1); larger batches
    # fall back to the XLA scan, whose matmuls already amortize over rows.
    use_pallas_fast_decode: bool = False

    # Unroll factor for the slow-transformer layer scan in decode_frame:
    # unrolling lets XLA overlap layer l+1's HBM weight streaming with layer
    # l's compute on the tiny 2-token decode step.  1 = rolled loop.
    # (Measured NEGATIVE on v5e — see BENCH.md; kept for experimentation.)
    decode_layer_unroll: int = 1

    # Run the whole 12-layer slow decode step in one grid-pipelined Pallas
    # kernel (ops/pallas_slow_decode.py): the layer index is the grid
    # dimension, so Mosaic double-buffers layer l+1's weights + cache behind
    # layer l's compute.  Changes the KV-cache layout to flat
    # (L, B, S, n_head*head_dim) rows — a state-layout choice like
    # use_pallas_decode, and mutually exclusive with it.  Batch-1 MHA decode
    # only; prefill and larger batches use the XLA path on the same layout.
    use_pallas_slow_decode: bool = False

    def __post_init__(self):
        if self.n_local_heads == -1:
            object.__setattr__(self, "n_local_heads", self.n_head)
        if self.fast_n_local_heads == -1:
            object.__setattr__(self, "fast_n_local_heads", self.fast_n_head)
        if self.use_pallas_slow_decode and self.use_pallas_decode:
            raise ValueError(
                "use_pallas_slow_decode and use_pallas_decode imply different "
                "KV-cache layouts; enable at most one")

    @property
    def cache_head_dim(self) -> int:
        """KV-cache head dim: 128-lane padded when the Pallas decode kernel
        owns the cache layout."""
        if self.use_pallas_decode and self.head_dim % 128 != 0:
            return self.head_dim + (128 - self.head_dim % 128)
        return self.head_dim

    @property
    def max_delay(self) -> int:
        return max(self.delay) if isinstance(self.delay, tuple) else int(self.delay)


@dataclass(frozen=True)
class ARVCConfig:
    """Composition wrapper around the dual-AR LM
    (cf. reference modules/arvc_wrapper.py:7-126)."""

    decoder: DualARConfig = field(default_factory=DualARConfig)
    context_dim: int = 128  # timbre latent dim
    style_dim: int = 192  # CAMPPlus style vector dim
    model_dim: int = 768
    spk_condition: bool = True
    spk_condition_len: int = 33  # 32 timbre latents + 1 style vec


# ---------------------------------------------------------------------------
# Quantizers
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BSQConfig:
    """Downsampling binary-spherical quantizer of the content tokenizer
    (cf. reference modules/vqgan/modules/bsq_no_upsample.py:20-112, bsq.py:128-496)."""

    input_dim: int = 512
    n_groups: int = 1
    codebook_size: int = 8192  # -> 13 bits
    downsample_factor: Tuple[int, ...] = (2, 2)

    @property
    def codebook_bits(self) -> int:
        b = self.codebook_size.bit_length() - 1
        assert (1 << b) == self.codebook_size, "codebook_size must be a power of 2"
        return b


@dataclass(frozen=True)
class FSQConfig:
    """Downsampling grouped-residual finite scalar quantizer of the vocoder
    (cf. reference modules/vqgan/modules/fsq.py:19-116 and the repo's own FSQ
    implementation modules/bicodec_speaker_encoder/fsq/finite_scalar_quantization.py)."""

    input_dim: int = 512
    n_groups: int = 8
    n_codebooks: int = 1  # residual quantizers per group
    levels: Tuple[int, ...] = (8, 5, 5, 5)  # prod = 1000 entries / codebook
    downsample_factor: Tuple[int, ...] = (2, 2)

    @property
    def codebook_size(self) -> int:
        out = 1
        for l in self.levels:
            out *= l
        return out


# ---------------------------------------------------------------------------
# Model-level configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HiFiGANConfig:
    """HiFiGAN vocoder head (cf. reference modules/vqgan/modules/firefly.py:222-301
    and configs/hydra_arcs/vocoders/firefly_gan_vq.yaml)."""

    num_mels: int = 512  # input channels (quantizer output dim)
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    upsample_initial_channel: int = 512
    pre_conv_kernel_size: int = 13
    post_conv_kernel_size: int = 13
    hop_length: int = 512
    # Run the whole streaming head (conv_pre + 5 upsample/resblock stages +
    # conv_post, ~100 convs) in one fused Pallas kernel
    # (ops/pallas_hifigan.py).  Changes the streaming-state layout to packed
    # per-stage tail buffers.  Batch-1 only; batched unpacks to the XLA path.
    use_pallas_stream: bool = False


@dataclass(frozen=True)
class VocoderConfig:
    """Firefly codec: mel->ConvNeXt->FSQ (encode) / FSQ->HiFiGAN (decode)
    (cf. reference modules/vqgan/modules/firefly.py:520-607)."""

    mel: MelConfig = field(default_factory=MelConfig)
    backbone: ConvNeXtConfig = field(default_factory=ConvNeXtConfig)
    quantizer: FSQConfig = field(default_factory=FSQConfig)
    head: HiFiGANConfig = field(default_factory=HiFiGANConfig)

    @property
    def downsample_factor(self) -> int:
        out = 1
        for f in self.quantizer.downsample_factor:
            out *= f
        return out

    @property
    def samples_per_frame(self) -> int:
        return self.mel.hop_length * self.downsample_factor  # 2048


@dataclass(frozen=True)
class TokenizerConfig:
    """Causal BSQ content tokenizer
    (cf. reference modules/vqgan/modules/firefly_encoder.py:510-598 and
    configs/hydra_arcs/speech_tokenizers/causal-encoder-lfq-8192.yaml)."""

    mel: MelConfig = field(default_factory=MelConfig)
    backbone: ConvNeXtConfig = field(default_factory=ConvNeXtConfig)
    quantizer: BSQConfig = field(default_factory=BSQConfig)
    transformer: WindowedTransformerConfig = field(
        default_factory=WindowedTransformerConfig
    )
    # Run the ConvNeXt front end (stem + stages + downsample) in one fused
    # Pallas kernel (ops/pallas_convnext_enc.py).  Changes the streaming
    # state's backbone/down fields to a PackedEncState.  Batch-1 only;
    # batched unpacks to the XLA path.
    use_pallas_encoder: bool = False

    # training-only distillation head predicting w2v-BERT features
    head: ConvNeXtConfig = field(
        default_factory=lambda: ConvNeXtConfig(
            input_channels=512,
            depths=(3, 3, 3, 3),
            dims=(640, 768, 896, 1024),
            kernel_size=7,
            gin_channels=192,
        )
    )

    @property
    def downsample_factor(self) -> int:
        out = 1
        for f in self.quantizer.downsample_factor:
            out *= f
        return out


@dataclass(frozen=True)
class CAMPPlusConfig:
    """CAM++ D-TDNN style encoder (cf. reference modules/campplus/DTDNN.py:50-138)."""

    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    block_layers: Tuple[int, ...] = (12, 24, 16)
    block_kernels: Tuple[int, ...] = (3, 3, 3)
    block_dilations: Tuple[int, ...] = (1, 2, 2)


@dataclass(frozen=True)
class SpeakerEncoderConfig:
    """SparkTTS/BiCodec timbre encoder
    (cf. reference modules/bicodec_speaker_encoder/speaker_encoder.py:34-153)."""

    sample_rate: int = 16000
    n_fft: int = 1024
    win_length: int = 640
    hop_length: int = 320
    n_mels: int = 128
    mel_fmin: float = 10.0
    mel_fmax: Optional[float] = None
    input_dim: int = 128  # mel bins fed to ECAPA
    out_dim: int = 512
    latent_dim: int = 128
    token_num: int = 32
    fsq_levels: Tuple[int, ...] = (4, 4, 4, 4, 4, 4)
    fsq_num_quantizers: int = 1
    ecapa_channels: int = 512


# ---------------------------------------------------------------------------
# Runtime / streaming
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SamplingConfig:
    """Sampling defaults follow reference dual_ar_stream.py:1099-1106."""

    temperature: float = 0.7
    top_p: float = 0.7
    repetition_penalty: float = 1.0  # penalty disabled on the runtime path
    greedy: bool = False  # argmax decoding (parity/testing mode)
    # nucleus filter runs over the top-k logits only (exact whenever the
    # nucleus fits in k; far cheaper than a full-vocab sort on TPU);
    # 0 = exact full-vocab sort
    top_k_window: int = 64


@dataclass(frozen=True)
class StreamConfig:
    """Streaming state-machine geometry
    (cf. reference evaluations/infer_arvc.py:443-596 defaults)."""

    encode_window_frames: int = 128
    decode_window_frames: int = 64
    max_prompt_frames: int = 256
    max_seq_frames: int = 768
    buffer_frames: int = 32
    decode_chunk_frames: int = 1
    delay: int = 2
    alpha: float = 1.0  # speaker-embedding noise-mixing coefficient
    # incremental-mode refill strategy: stash the post-prompt LM state once
    # and run a small fixed-shape history prefill (buffer_frames pairs) at
    # each refill boundary instead of re-running the full padded-prompt
    # prefill on the hot path (arvc.prefill_history; exact-equal by
    # construction — tests/test_streaming_integration.py)
    fast_refill: bool = True
    # spread the refill over the window BEFORE the boundary: rebuild the
    # recycled LM state incrementally (one small history-append program per
    # chunk for the last buffer_frames frames, exploiting prefill_history's
    # chaining property) and swap at the boundary — the hot path never runs
    # a multi-frame prefill.  Exact-equal to the monolithic refill
    # (tests/test_streaming_integration.py); requires fast_refill and
    # buffer_frames % decode_chunk_frames == 0 (else falls back per boundary)
    background_refill: bool = True


@dataclass(frozen=True)
class PipelineConfig:
    """Top-level bundle for the full conversion pipeline."""

    sample_rate: int = 44100
    resample_rate: int = 16000  # speaker-encoder branch rate
    tokenizer: TokenizerConfig = field(default_factory=TokenizerConfig)
    vocoder: VocoderConfig = field(default_factory=VocoderConfig)
    arvc: ARVCConfig = field(default_factory=ARVCConfig)
    campplus: CAMPPlusConfig = field(default_factory=CAMPPlusConfig)
    speaker: SpeakerEncoderConfig = field(default_factory=SpeakerEncoderConfig)
    stream: StreamConfig = field(default_factory=StreamConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)

    @property
    def samples_per_frame(self) -> int:
        return self.vocoder.samples_per_frame  # 2048


# Named operating presets (cf. reference configs/presets.json:1-26).
PRESETS = {
    "max_privacy": StreamConfig(alpha=0.0, delay=2),
    "balanced": StreamConfig(alpha=0.5, delay=2),
    "max_quality": StreamConfig(alpha=1.0, delay=4),
    "low_latency": StreamConfig(alpha=0.7, delay=1),
}


def preset(name: str) -> StreamConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
    return PRESETS[name]


def replace(cfg, **kwargs):
    """dataclasses.replace that works through frozen configs."""
    return dataclasses.replace(cfg, **kwargs)


def tpu_optimized(cfg: PipelineConfig) -> PipelineConfig:
    """Program-selection flags measured fastest on real TPU v5e hardware.

    Round-3 paired on-chip adjudication (benchmarks/results/
    r3_floor_paired.log — every variant measured in ONE process so the
    ~0.2 ms cross-session relay drift cancels; full_chunk ms, null 0.225):

      fast+slow           2.025      (XLA-only baseline: 2.968, r3_floor_xla)
      fast+slow+wt        1.784      wt ring kernel      -0.24 -> ON
      fast+slow+voc       1.893      HiFiGAN head kernel -0.13 -> ON
      fast+slow+enc       2.046      ConvNeXt front end  +0.02 -> OFF
      all five            1.750

    Enabled: the VMEM-resident fast-codebook decoder + grid-pipelined
    slow-step kernel (LM stage 2.14 -> 0.98 ms/frame), the circular
    absolute-RoPE WT ring kernel, and the fused HiFiGAN-head kernel.
    use_pallas_encoder stays off (the fused ConvNeXt front end measured
    slightly slower than XLA's fusion of the same ops) and use_pallas_decode
    stays off (round 2: XLA decode attention faster at this geometry); both
    remain available behind their flags.  The slow/wt kernels change state
    layouts (flat KV rows / flat ring); StreamSession.transfer migrates
    live state between layouts, so converters/sessions built either way
    interoperate."""
    return replace(
        cfg,
        arvc=replace(cfg.arvc, decoder=replace(
            cfg.arvc.decoder,
            use_pallas_fast_decode=True,
            use_pallas_slow_decode=True)),
        tokenizer=replace(cfg.tokenizer, transformer=replace(
            cfg.tokenizer.transformer, use_pallas_stream=True)),
        vocoder=replace(cfg.vocoder, head=replace(
            cfg.vocoder.head, use_pallas_stream=True)),
    )
