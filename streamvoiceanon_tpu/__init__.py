"""streamvoiceanon_tpu — TPU-native streaming voice-anonymization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Plachtaa/StreamVoiceAnon (see SURVEY.md): causal BSQ speech tokenizer,
dual-autoregressive token LM, Firefly/HiFiGAN codec vocoder, CAMPPlus and
SparkTTS speaker encoders, streaming runtime, trainers and privacy evaluation.

Everything on the compute path is pure-functional JAX: models are (params
pytree, apply fn) pairs, streaming state is explicit pytrees threaded through
jitted step functions, and parallelism is expressed with jax.sharding.
"""

__version__ = "0.1.0"

from streamvoiceanon_tpu import config  # noqa: F401
