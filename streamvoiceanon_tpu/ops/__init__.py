from streamvoiceanon_tpu.ops import conv, norm, rope, stft, quantizers, sampling  # noqa: F401
