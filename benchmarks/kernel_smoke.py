"""TPU smoke-compile for the fused Pallas kernels at FULL deployed geometry.

Compiles + runs each kernel once on the real chip (no timing).  Catches
Mosaic lowering gaps (erf, dynamic_update_slice, SMEM/VMEM store ranks, …)
in ~1 min instead of a full stage_floor CPU-prep cycle.  Usage:

    python benchmarks/kernel_smoke.py [enc] [voc] [wt] [slow] [fast]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    which = set(sys.argv[1:]) or {"enc", "voc", "wt", "slow", "fast"}
    from dataclasses import replace

    from streamvoiceanon_tpu.config import PipelineConfig, SamplingConfig
    from streamvoiceanon_tpu.utils import randparams as rp

    cfg = PipelineConfig()
    spf = cfg.samples_per_frame
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    def smoke(name, fn, *a):
        t0 = time.time()
        out = jax.tree_util.tree_map(np.asarray, fn(*a))
        del out
        print(f"{name:6s} OK  (compile+run {time.time() - t0:.1f}s)")

    if "enc" in which:
        from streamvoiceanon_tpu.models import tokenizer_stream as ts
        from streamvoiceanon_tpu.ops import pallas_convnext_enc as pce

        tcfg = replace(cfg.tokenizer, use_pallas_encoder=True)
        tok_p = jax.device_put(rp.tokenizer_params_np(cfg.tokenizer, 1), dev)
        tok_p = dict(tok_p)
        tok_p["enc_packed"] = pce.packed_weights(tok_p, tcfg)
        st = jax.device_put(ts.init_stream_state(tok_p, tcfg), dev)
        chunk = jax.device_put(
            jnp.asarray(rng.standard_normal((1, spf)) * 0.1, jnp.float32), dev)
        smoke("enc", lambda: ts.encode_stream(tok_p, tcfg, st, chunk))

    if "voc" in which:
        from streamvoiceanon_tpu.models import vocoder
        from streamvoiceanon_tpu.ops import pallas_hifigan as ph

        vcfg = replace(cfg.vocoder, head=replace(
            cfg.vocoder.head, use_pallas_stream=True))
        voc_p = jax.device_put(rp.vocoder_params_np(cfg.vocoder, 2), dev)
        voc_p = dict(voc_p)
        voc_p["head_packed"] = ph.packed_weights(voc_p["head"], vcfg.head)
        vst = jax.device_put(vocoder.init_stream_state(voc_p, vcfg), dev)
        codes = jax.device_put(jnp.zeros(
            (1, cfg.arvc.decoder.num_codebooks, 1), jnp.int32), dev)
        smoke("voc", lambda: vocoder.decode_stream(voc_p, vcfg, vst, codes))

    if which & {"wt", "slow", "fast"}:
        from streamvoiceanon_tpu.models import arvc, dual_ar
        from streamvoiceanon_tpu.models import tokenizer_stream as ts

        if "wt" in which:
            tcfg = replace(cfg.tokenizer, transformer=replace(
                cfg.tokenizer.transformer, use_pallas_stream=True))
            tok_p = jax.device_put(rp.tokenizer_params_np(cfg.tokenizer, 1), dev)
            st = jax.device_put(ts.init_stream_state(tok_p, tcfg), dev)
            z1 = jax.device_put(jnp.asarray(rng.standard_normal(
                (1, 1, cfg.tokenizer.transformer.dim)), jnp.float32), dev)
            smoke("wt", lambda: ts.transformer_stream_step(
                tok_p["pre_module"], tcfg.transformer, st.ring, z1))

        for nm, fast, slow in (("slow", False, True), ("fast", True, False)):
            if nm not in which:
                continue
            acfg = replace(cfg.arvc, decoder=replace(
                cfg.arvc.decoder,
                use_pallas_fast_decode=fast, use_pallas_slow_decode=slow))
            arvc_p = jax.device_put(
                rp.arvc_params_np(cfg.arvc, 3, jnp.bfloat16), dev)
            dim = acfg.decoder.dim
            lm = jax.device_put(arvc.ARVCState(
                decode=dual_ar.init_state(acfg.decoder, 1),
                audio_emb=jnp.zeros((1, 1, dim), jnp.bfloat16),
                ref_tail_emb=jnp.zeros((1, 2, dim), jnp.bfloat16)), dev)
            tok = jax.device_put(jnp.zeros((1, 1), jnp.int32), dev)
            smoke(nm, lambda acfg=acfg, lm=lm: arvc.decode_one(
                arvc_p, acfg, lm, tok, jax.random.PRNGKey(0),
                SamplingConfig()))


if __name__ == "__main__":
    main()
