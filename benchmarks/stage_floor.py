"""Per-stage device-time floor: split bench.py's device-floor number
(K chunks chained in one lax.scan dispatch) into its three pipeline stages —
incremental content encode, LM frame decode (2-token slow step + 8-step
codebook loop + sampling), incremental vocoder — so optimization effort
lands on the fattest stage.

Same one-time-prep-on-CPU + transfer design as bench.py: the TPU only
compiles the three scan programs.
"""

import argparse
import sys
import time

import jax


import jax.numpy as jnp
import numpy as np

FRAME_SECONDS = 2048 / 44100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=128, help="chunks per scan dispatch")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dsp-dtype", default="float32",
                    help="tokenizer/vocoder param+compute dtype "
                         "(bfloat16 halves the DSP weight traffic)")
    ap.add_argument("--state-dtype", default="float32",
                    help="serving state dtype (LM KV cache + stream tails); "
                         "bfloat16 halves the slow-step cache read")
    ap.add_argument("--pallas-fast", action="store_true",
                    help="route the codebook loop through the VMEM-resident "
                         "Pallas fast decoder")
    ap.add_argument("--pallas-slow", action="store_true",
                    help="route the 12-layer slow decode step through the "
                         "grid-pipelined Pallas kernel (flat cache layout)")
    ap.add_argument("--pallas-wt", action="store_true",
                    help="route the tokenizer's windowed-transformer ring "
                         "step through the grid-pipelined Pallas kernel")
    ap.add_argument("--pallas-voc", action="store_true",
                    help="route the HiFiGAN head through the fused "
                         "single-invocation Pallas kernel (packed tails)")
    ap.add_argument("--pallas-enc", action="store_true",
                    help="route the ConvNeXt front end through the fused "
                         "single-invocation Pallas kernel (packed tails)")
    ap.add_argument("--unroll", default="1",
                    help="slow-transformer decode layer-scan unroll factor(s);"
                         " comma list sweeps the LM stage per factor")
    ap.add_argument("--stages", default="",
                    help="comma list of stages to run (default: all)")
    ap.add_argument("--greedy", action="store_true",
                    help="argmax decoding instead of nucleus sampling — "
                         "isolates the in-kernel top-p bisection cost")
    ap.add_argument("--paired-state-bf16", action="store_true",
                    help="ALSO re-measure encode/lm_decode/vocoder/"
                         "full_chunk (+ kernel sub-stages) with the live "
                         "stream state cast to bf16 in the SAME process — "
                         "drift-free measurement of the serving-state "
                         "precision lever (bench._state_dtype)")
    ap.add_argument("--compare", default="",
                    help="comma list of kernel-flag variants (each a "
                         "'+'-joined subset of fast,slow,wt,voc,enc, or "
                         "'xla' for none) to ALSO measure in this process: "
                         "same session, same chip — paired numbers free of "
                         "the ~0.2 ms cross-session relay drift")
    args = ap.parse_args()
    unrolls = [int(u) for u in str(args.unroll).split(",")]

    sys.path.insert(0, "/root/repo")
    from bench import build_converter
    from streamvoiceanon_tpu.config import PipelineConfig, SamplingConfig
    from streamvoiceanon_tpu.models import arvc, vocoder
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.runtime.streaming import (
        StreamSession,
        _decode_vocode_inc,
        _encode_inc,
    )
    from streamvoiceanon_tpu.utils import randparams as rp

    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print(f"devices: tpu={tpu}", file=sys.stderr)

    from dataclasses import replace

    def with_decode_opts(base, unroll):
        out = replace(base, arvc=replace(
            base.arvc, decoder=replace(
                base.arvc.decoder,
                use_pallas_fast_decode=args.pallas_fast,
                use_pallas_slow_decode=args.pallas_slow,
                decode_layer_unroll=unroll)))
        if args.pallas_wt:
            out = replace(out, tokenizer=replace(
                out.tokenizer, transformer=replace(
                    out.tokenizer.transformer, use_pallas_stream=True)))
        if args.pallas_voc:
            out = replace(out, vocoder=replace(
                out.vocoder, head=replace(
                    out.vocoder.head, use_pallas_stream=True)))
        if args.pallas_enc:
            out = replace(out, tokenizer=replace(
                out.tokenizer, use_pallas_encoder=True))
        return out

    def flags_cfg(names):
        """PipelineConfig with exactly the kernel flags in `names` set."""
        base = PipelineConfig()
        out = replace(base, arvc=replace(base.arvc, decoder=replace(
            base.arvc.decoder,
            use_pallas_fast_decode="fast" in names,
            use_pallas_slow_decode="slow" in names)))
        if "wt" in names:
            out = replace(out, tokenizer=replace(
                out.tokenizer, transformer=replace(
                    out.tokenizer.transformer, use_pallas_stream=True)))
        if "voc" in names:
            out = replace(out, vocoder=replace(
                out.vocoder, head=replace(
                    out.vocoder.head, use_pallas_stream=True)))
        if "enc" in names:
            out = replace(out, tokenizer=replace(
                out.tokenizer, use_pallas_encoder=True))
        return out

    cfg = PipelineConfig()
    if (args.pallas_fast or args.pallas_slow or args.pallas_wt
            or args.pallas_voc or args.pallas_enc or unrolls[0] != 1):
        cfg = with_decode_opts(cfg, unrolls[0])
    spf = cfg.samples_per_frame
    rng = np.random.default_rng(0)
    dsp_dtype = np.dtype(args.dsp_dtype) if args.dsp_dtype == "float32" else jnp.bfloat16
    state_dtype = jnp.float32 if args.state_dtype == "float32" else jnp.bfloat16
    tok_np = rp.tokenizer_params_np(cfg.tokenizer, 1, dtype=dsp_dtype)
    voc_np = rp.vocoder_params_np(cfg.vocoder, 2, dtype=dsp_dtype)
    arvc_np = rp.arvc_params_np(cfg.arvc, 3, jnp.bfloat16)

    ref_wav = (rng.standard_normal(64 * spf) * 0.1).astype(np.float32)
    src_wav = (rng.standard_normal(64 * spf) * 0.1).astype(np.float32)
    with jax.default_device(cpu):
        cv_cpu = VoiceConverter(
            cfg=cfg,
            tokenizer_params=jax.device_put(tok_np, cpu),
            vocoder_params=jax.device_put(voc_np, cpu),
            arvc_params=jax.device_put(arvc_np, cpu),
        )
        ref = jax.device_put(jnp.asarray(ref_wav)[None], cpu)
        sess = StreamSession(
            cv_cpu, cfg.stream, key=jax.random.PRNGKey(1),
            sampling=SamplingConfig(greedy=args.greedy),
            style=jax.device_put(jnp.asarray(
                rng.standard_normal((1, 192)), jnp.bfloat16), cpu),
            timbre=jax.device_put(jnp.asarray(
                rng.standard_normal((1, 32, 128)), jnp.bfloat16), cpu),
            ref_tokens=cv_cpu.content_tokens(ref),
            ref_codes=cv_cpu.audio_codes(ref),
            state_dtype=state_dtype,
        )
        for i in range(cfg.stream.delay + 3):
            sess.process_chunk(src_wav[i * spf : (i + 1) * spf])
    print("CPU prep done", file=sys.stderr)

    # persistent compile cache for the TPU phase ONLY: enabling it over
    # the CPU prep would read/write CPU executables into the shared dir,
    # which can be AOT artifacts from a different machine type
    # (cpu_aot_loader machine-feature mismatch -> SIGILL/abort)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


    cv = VoiceConverter(
        cfg=cfg,
        tokenizer_params=jax.device_put(tok_np, tpu),
        vocoder_params=jax.device_put(voc_np, tpu),
        arvc_params=jax.device_put(arvc_np, tpu),
    )
    sess = sess.transfer(cv, tpu)
    jax.block_until_ready(sess.fstate)

    K = args.k
    fs = sess.fstate
    chunks = jax.device_put(
        jnp.asarray(rng.standard_normal((K, 1, spf)) * 0.1, jnp.float32), tpu)
    toks = jax.device_put(jnp.zeros((K, 1, 1), jnp.int32), tpu)
    codes = jax.device_put(
        jnp.zeros((K, 1, cfg.arvc.decoder.num_codebooks, 1), jnp.int32), tpu)

    def scan_encode(tok_p, tstate, ring, xs):
        def body(carry, chunk):
            ts, rg = carry
            ts, rg, t = _encode_inc(tok_p, cfg, ts, rg, chunk, sess._mel_consts)
            return (ts, rg), t
        return jax.lax.scan(body, (tstate, ring), xs)

    def make_scan_lm(cfg_u):
        def scan_lm(arvc_p, lm, key, xs):
            def body(carry, tok):
                st, kk = carry
                kk, sub = jax.random.split(kk)
                st, c = arvc.decode_one(arvc_p, cfg_u.arvc, st, tok, sub,
                                        sess.sampling)
                return (st, kk), c
            return jax.lax.scan(body, (lm, key), xs)
        return scan_lm

    def scan_voc(voc_p, vstate, xs):
        def body(carry, c):
            vs, wav = vocoder.decode_stream(voc_p, cfg.vocoder, carry, c)
            return vs, wav
        return jax.lax.scan(body, vstate, xs)

    # vocoder sub-stages: front (FSQ decode + upsample/ConvNeXt glue, XLA)
    # vs head (the ~100-conv HiFiGAN stack, kernel or XLA) — splits the
    # vocode stage so floor-chasing effort lands on the fatter half
    from streamvoiceanon_tpu.models import hifigan
    from streamvoiceanon_tpu.models.convnext import convnext_block_apply_stream
    from streamvoiceanon_tpu.ops import conv as convops

    vq = cfg.vocoder.quantizer
    _head0 = fs.voc["head"]
    head_dtype = (_head0.pre.dtype if hasattr(_head0, "pre")
                  else _head0["conv_pre"].tail.dtype)

    def scan_voc_front(voc_p, upstate, xs):
        from streamvoiceanon_tpu.ops import quantizers as Qz

        def body(carry, c):
            idx = jnp.swapaxes(c, 1, 2)
            z = Qz.grouped_residual_fsq_decode(
                voc_p["fsq"], idx, vq.n_groups, vq.levels, vq.n_codebooks,
            ).astype(head_dtype)
            new_up = []
            for stage, st, f in zip(voc_p["upsample"], carry,
                                    reversed(vq.downsample_factor)):
                cs, z = convops.fish_trans_conv1d_stream(
                    st["conv"], z, stage["conv"]["w"], stage["conv"]["b"],
                    stride=f)
                bs, z = convnext_block_apply_stream(stage["block"],
                                                    st["block"], z)
                new_up.append({"conv": cs, "block": bs})
            return new_up, jnp.sum(z)
        return jax.lax.scan(body, upstate, xs)

    def scan_voc_head(voc_p, hstate, xs):
        def body(hs, z):
            hs, wav = hifigan.hifigan_apply_stream(
                voc_p["head"], cfg.vocoder.head, hs, z,
                packed_w=voc_p.get("head_packed"))
            return hs, jnp.sum(wav)
        return jax.lax.scan(body, hstate, xs)

    head_cin = cv.vocoder_params["head"]["conv_pre"]["w"].shape[1]
    z_head = jax.device_put(jnp.asarray(
        rng.standard_normal((K, 1, 4, head_cin)) * 0.1, head_dtype), tpu)

    def scan_full(ps, fstate, key, xs):
        tok_p, arvc_p, voc_p = ps
        def body(carry, chunk):
            f, kk = carry
            ts, rg, t = _encode_inc(tok_p, cfg, f.tok, f.tok_ring, chunk,
                                    sess._mel_consts)
            kk, sub = jax.random.split(kk)
            lm, cr, vs, wav, _k = _decode_vocode_inc(
                arvc_p, voc_p, cfg, f.lm, f.code_ring, f.voc, t,
                sess.sampling, sub)
            f = f._replace(tok=ts, tok_ring=rg, lm=lm, code_ring=cr, voc=vs)
            return (f, kk), wav
        return jax.lax.scan(body, (fstate, key), xs)

    # each job returns ONE scalar: a single ~25 ms relay fetch per dispatch,
    # so the measured time is device time, not fetch count
    from streamvoiceanon_tpu.utils.jitopts import scoped_vmem_jit

    def scalarize(fn, reduce):
        def run(*a):
            out = fn(*a)
            return reduce(out)
        return scoped_vmem_jit(run)

    # encode sub-stages: front = mel + ConvNeXt backbone + downsample convs;
    # wt = windowed-transformer ring step + LFQ.  Splits the encode stage so
    # kernel effort lands on the fatter half.
    from streamvoiceanon_tpu.models import tokenizer_stream as ts
    from streamvoiceanon_tpu.ops import quantizers as Q

    def scan_enc_front(tok_p, mel_st, bb_st, down_st, xs):
        from streamvoiceanon_tpu.ops import pallas_convnext_enc as pce
        packed = isinstance(bb_st, pce.PackedEncState)
        if packed:
            pw = tok_p.get("enc_packed") or pce.packed_weights(
                tok_p, cfg.tokenizer)

        def body(carry, chunk):
            m, b, d = carry
            m, mel = ts.mel_stream(m, chunk, cfg.tokenizer.mel, sess._mel_consts)
            if packed:  # fused kernel: backbone + downsamples in one call
                b, z = pce.encoder_front_step(pw, b, mel, cfg.tokenizer)
                return (m, b, d), jnp.sum(z)
            b, feat = ts.convnext_encoder_apply_stream(
                tok_p["backbone"], cfg.tokenizer.backbone, b, mel)
            z = feat
            nd = []
            from streamvoiceanon_tpu.models import convnext as cnx
            from streamvoiceanon_tpu.ops import conv as convops
            for stage, st, f in zip(tok_p["downsample"], d,
                                    cfg.tokenizer.quantizer.downsample_factor):
                cs, z = convops.causal_conv1d_stream(
                    st["conv"], z, stage["conv"]["w"], stage["conv"]["b"], stride=f)
                bs, z = cnx.convnext_block_apply_stream(stage["block"], st["block"], z)
                nd.append({"conv": cs, "block": bs})
            return (m, b, tuple(nd)), jnp.sum(z)
        return jax.lax.scan(body, (mel_st, bb_st, down_st), xs)

    def scan_enc_wt(tok_p, ring, xs):
        def body(rg, z1):
            rg, h = ts.transformer_stream_step(
                tok_p["pre_module"], cfg.tokenizer.transformer, rg, z1)
            toks = Q.lfq_encode(tok_p["lfq"], h,
                                cfg.tokenizer.quantizer.codebook_bits)
            return rg, jnp.sum(toks)
        return jax.lax.scan(body, ring, xs)

    def scan_wt_step_only(tok_p, ring, xs):
        # transformer step alone (no LFQ/final-norm glue) — isolates the
        # ring-step cost from the per-token XLA epilogue
        def body(rg, z1):
            rg, h = ts.transformer_stream_step(
                tok_p["pre_module"], cfg.tokenizer.transformer, rg, z1)
            return rg, jnp.sum(h)
        return jax.lax.scan(body, ring, xs)

    def scan_wt_kernel_only(tok_p, ring, xs):
        # raw pallas kernel in a scan (flat ring required)
        from streamvoiceanon_tpu.models.tokenizer_stream import _stack_wt_layers
        from streamvoiceanon_tpu.ops.pallas_wt_stream import wt_stream_step
        tcfg = cfg.tokenizer.transformer
        stacked = _stack_wt_layers(tok_p["pre_module"])

        def body(carry, z1):
            kr, vr, cnt = carry
            h, kr, vr = wt_stream_step(
                stacked, z1[:, 0], kr, vr, cnt,
                n_head=tcfg.n_head, head_dim=tcfg.head_dim,
                rope_base=tcfg.rope_base, norm_eps=tcfg.norm_eps)
            return (kr, vr, cnt + 1), jnp.sum(h)
        init = (ring.k_ring[:, 0], ring.v_ring[:, 0], ring.count)
        return jax.lax.scan(body, init, xs)

    def scan_mel_only(mel_st, xs):
        # the 4-hop matmul-DFT mel front alone — front minus this is the
        # ConvNeXt backbone + downsample convs (r5: encode sub-split one
        # level deeper, VERDICT r4 next #8)
        def body(m, chunk):
            m, mel = ts.mel_stream(m, chunk, cfg.tokenizer.mel,
                                   sess._mel_consts)
            return m, jnp.sum(mel)
        return jax.lax.scan(body, mel_st, xs)

    zdim = cfg.tokenizer.transformer.dim
    z_feed = jax.device_put(jnp.asarray(
        rng.standard_normal((K, 1, 1, zdim)), fs.tok.ring.k_ring.dtype), tpu)

    jobs = {
        "null": (jax.jit(lambda xs: jnp.sum(xs) * 1.0), (chunks,)),
        "enc_mel": (scalarize(scan_mel_only,
                              lambda o: o[1][-1].astype(jnp.float32)),
                    (fs.tok.mel, chunks)),
        "enc_front": (scalarize(scan_enc_front,
                                lambda o: o[1][-1].astype(jnp.float32)),
                      (cv.tokenizer_params, fs.tok.mel, fs.tok.backbone,
                       fs.tok.down, chunks)),
        "enc_wt": (scalarize(scan_enc_wt,
                             lambda o: o[1][-1].astype(jnp.float32)),
                   (cv.tokenizer_params, fs.tok.ring, z_feed)),
        "wt_step": (scalarize(scan_wt_step_only,
                              lambda o: o[1][-1].astype(jnp.float32)),
                    (cv.tokenizer_params, fs.tok.ring, z_feed)),
        "wt_kern": (scalarize(scan_wt_kernel_only,
                              lambda o: o[1][-1].astype(jnp.float32)),
                    (cv.tokenizer_params, fs.tok.ring, z_feed)),
        "encode": (scalarize(scan_encode,
                             lambda o: jnp.sum(o[1]).astype(jnp.float32)),
                   (cv.tokenizer_params, fs.tok, fs.tok_ring, chunks)),
        "lm_decode": (scalarize(make_scan_lm(cfg),
                                lambda o: jnp.sum(o[1]).astype(jnp.float32)),
                      (cv.arvc_params, fs.lm, jax.random.PRNGKey(5), toks)),
        "vocoder": (scalarize(scan_voc,
                              lambda o: jnp.sum(o[1]).astype(jnp.float32)),
                    (cv.vocoder_params, fs.voc, codes)),
        "voc_front": (scalarize(scan_voc_front,
                                lambda o: o[1][-1].astype(jnp.float32)),
                      (cv.vocoder_params, fs.voc["upsample"], codes)),
        "voc_head": (scalarize(scan_voc_head,
                               lambda o: o[1][-1].astype(jnp.float32)),
                     (cv.vocoder_params, fs.voc["head"], z_head)),
        "full_chunk": (scalarize(scan_full,
                                 lambda o: jnp.sum(o[1]).astype(jnp.float32)),
                       ((cv.tokenizer_params, cv.arvc_params, cv.vocoder_params),
                        fs, jax.random.PRNGKey(6), chunks)),
    }
    # LM sub-stages: the two Pallas kernels alone; lm_decode minus their sum
    # is the per-frame XLA glue (embeds, logits head, sampling, interleave)
    if args.pallas_slow:
        from streamvoiceanon_tpu.ops.pallas_slow_decode import slow_decode_step
        dcfg = cfg.arvc.decoder
        lm_params = cv.arvc_params["model"]

        def scan_slow_kern(layers, onorm, ohead, kc, vc, xs):
            def body(carry, x2):
                kc_, vc_, pos, kk = carry
                kk, sub = jax.random.split(kk)
                x, kr, vr, tok = slow_decode_step(
                    layers, x2, kc_, vc_, pos, onorm, ohead, sub,
                    n_head=dcfg.n_head, head_dim=dcfg.head_dim,
                    max_seq_len=dcfg.max_seq_len, rope_base=dcfg.rope_base,
                    norm_eps=dcfg.norm_eps,
                    temperature=sess.sampling.temperature,
                    top_p=sess.sampling.top_p, greedy=sess.sampling.greedy)
                kc_ = jax.lax.dynamic_update_slice(
                    kc_, kr.astype(kc_.dtype), (0, pos, 0))
                vc_ = jax.lax.dynamic_update_slice(
                    vc_, vr.astype(vc_.dtype), (0, pos, 0))
                return (kc_, vc_, pos + 2, kk), jnp.sum(x) + tok[0]
            return jax.lax.scan(
                body, (kc, vc, jnp.int32(64), jax.random.PRNGKey(8)), xs)

        lmst = fs.lm.decode
        if lmst.k_cache.ndim == 4:  # flat (L, B, S, H*D)
            x2_feed = jax.device_put(jnp.asarray(
                rng.standard_normal((K, 2, cfg.arvc.decoder.dim)),
                jnp.bfloat16), tpu)
            jobs["lm_slow_kern"] = (
                scalarize(scan_slow_kern,
                          lambda o: o[1][-1].astype(jnp.float32)),
                (lm_params["layers"], lm_params["norm"]["w"],
                 lm_params["output"]["w"], lmst.k_cache[:, 0],
                 lmst.v_cache[:, 0], x2_feed))
    if args.pallas_fast:
        from streamvoiceanon_tpu.ops.pallas_fast_decode import fast_decode
        dcfg = cfg.arvc.decoder
        lm_params = cv.arvc_params["model"]

        def scan_fast_kern(fl, fn, fo, fe, cbe, xs):
            def body(kk, hid):
                kk, sub = jax.random.split(kk)
                codes, _ = fast_decode(
                    fl, fn, fo, fe, cbe, hid, sub,
                    nq=dcfg.num_codebooks, n_head=dcfg.fast_n_head,
                    head_dim=dcfg.fast_head_dim, vocab=dcfg.codebook_size,
                    rope_base=dcfg.rope_base, norm_eps=dcfg.norm_eps,
                    temperature=sess.sampling.temperature,
                    top_p=sess.sampling.top_p, greedy=sess.sampling.greedy)
                return kk, jnp.sum(codes)
            return jax.lax.scan(body, jax.random.PRNGKey(9), xs)

        hid_feed = jax.device_put(jnp.asarray(
            rng.standard_normal((K, 1, dcfg.fast_dim)), jnp.bfloat16), tpu)
        jobs["lm_fast_kern"] = (
            scalarize(scan_fast_kern, lambda o: o[1][-1].astype(jnp.float32)),
            (lm_params["fast_layers"], lm_params["fast_norm"]["w"],
             lm_params["fast_output"]["w"], lm_params["fast_embeddings"],
             lm_params["codebook_embeddings"], hid_feed))
    if not args.pallas_wt:
        jobs.pop("wt_kern", None)  # needs the flat ring layout
    for u in unrolls[1:]:
        jobs[f"lm_unroll{u}"] = (
            scalarize(make_scan_lm(with_decode_opts(cfg, u)),
                      lambda o: jnp.sum(o[1]).astype(jnp.float32)),
            (cv.arvc_params, fs.lm, jax.random.PRNGKey(5), toks))
    if args.stages:
        keep = set(args.stages.split(","))
        jobs = {k: v for k, v in jobs.items()
                if k in keep or k.startswith("lm_unroll")}
    total = 0.0
    measured = {}
    for name, (fn, a) in jobs.items():
        t0 = time.time()
        np.asarray(fn(*a))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            best = min(best, (time.perf_counter() - t0) / K)
        if name not in ("full_chunk", "null"):
            total += best
        measured[name] = best
        print(f"{name:11s} {best*1e3:6.3f} ms/chunk  RTF {best/FRAME_SECONDS:5.3f}"
              f"  (compile+1st {compile_s:.1f}s)")
    print(f"{'sum':11s} {total*1e3:6.3f} ms/chunk (stages measured separately)")

    # ---- roofline: measured vs HBM-bandwidth floor per stage ---------------
    # (the utilization denominator — VERDICT r2 weak #6)
    from streamvoiceanon_tpu.utils.roofline import (
        chunk_roofline, device_peaks, format_report,
    )
    null = measured.get("null", 0.0)
    full = measured.get("full_chunk")
    rf = chunk_roofline(
        cfg, cv.tokenizer_params, cv.arvc_params, cv.vocoder_params,
        fstate=fs, compute_s=(max(full - null, 1e-9) if full else None),
        peaks=device_peaks(tpu))
    print(format_report(rf))
    floors = rf.get("stage_bw_floor_ms")
    if floors:
        pairs = [("encode", floors["encode"]),
                 ("lm_decode", floors["lm_slow"] + floors["lm_fast"]),
                 # individual LM halves (VERDICT r3 next #3): the standalone
                 # kernel scans vs their own bandwidth floors
                 ("lm_slow_kern", floors["lm_slow"]),
                 ("lm_fast_kern", floors["lm_fast"]),
                 ("vocoder", floors["vocode"])]
        for name, floor in pairs:
            if name in measured:
                ms = (measured[name] - null) * 1e3
                print(f"  {name:11s} measured {ms:6.3f} ms vs bw-floor "
                      f"{floor:6.3f} ms -> {ms/max(floor,1e-9):5.2f}x floor, "
                      f"{100.0*floor/max(ms,1e-9):5.1f}% of peak BW")

    # ---- paired serving-state precision (same process, same session) -------
    # Cast the live stream state to bf16 and re-measure: the LM KV cache is
    # the largest single HBM term (151 MB at f32), so this is the direct
    # measurement of bench._state_dtype's effect, free of cross-session
    # relay drift.
    if args.paired_state_bf16:
        def cast16(t):
            return jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) and a.dtype != jnp.bfloat16
                else a, t)

        fs16 = cast16(fs)
        # settle the dtype fixed-point: encoder activations promote to f32
        # (f32 mel consts), so conv TAILS are f32 in steady state even under
        # bf16 weights — exactly what a live bf16-state session converges to
        # after its first chunk.  One body application settles every leaf;
        # the big arrays (LM KV cache, WT ring, vocoder head tails) stay bf16
        # because their updates cast to the stored dtype.
        ts_, rg_, t_ = _encode_inc(cv.tokenizer_params, cfg, fs16.tok,
                                   fs16.tok_ring, chunks[0], sess._mel_consts)
        lm_, cr_, vs_, _w, _k = _decode_vocode_inc(
            cv.arvc_params, cv.vocoder_params, cfg, fs16.lm, fs16.code_ring,
            fs16.voc, t_, sess.sampling, jax.random.PRNGKey(0))
        fs16 = fs16._replace(tok=ts_, tok_ring=rg_, lm=lm_, code_ring=cr_,
                             voc=vs_)
        _h16 = fs16.voc["head"]
        z_head16 = z_head.astype(
            _h16.pre.dtype if hasattr(_h16, "pre")
            else _h16["conv_pre"].tail.dtype)
        cand16 = {
            "encode": (cv.tokenizer_params, fs16.tok, fs16.tok_ring, chunks),
            "lm_decode": (cv.arvc_params, fs16.lm, jax.random.PRNGKey(5),
                          toks),
            "vocoder": (cv.vocoder_params, fs16.voc, codes),
            "voc_head": (cv.vocoder_params, fs16.voc["head"], z_head16),
            "full_chunk": ((cv.tokenizer_params, cv.arvc_params,
                            cv.vocoder_params), fs16,
                           jax.random.PRNGKey(6), chunks),
        }
        jobs16 = {name: (jobs[name][0], a) for name, a in cand16.items()
                  if name in jobs}
        if "lm_slow_kern" in jobs:
            lmst16 = fs16.lm.decode
            lm_params = cv.arvc_params["model"]
            jobs16["lm_slow_kern"] = (
                jobs["lm_slow_kern"][0],
                (lm_params["layers"], lm_params["norm"]["w"],
                 lm_params["output"]["w"], lmst16.k_cache[:, 0],
                 lmst16.v_cache[:, 0],
                 jobs["lm_slow_kern"][1][-1]))
        if args.stages:
            keep = set(args.stages.split(","))
            jobs16 = {k: v for k, v in jobs16.items() if k in keep}
        measured16 = {}
        for name, (fn, a) in jobs16.items():
            t0 = time.time()
            np.asarray(fn(*a))
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                np.asarray(fn(*a))
                best = min(best, (time.perf_counter() - t0) / K)
            measured16[name] = best
            label = f"{name}[state-bf16]"
            print(f"{label:22s} {best*1e3:6.3f} ms/chunk  "
                  f"RTF {best/FRAME_SECONDS:5.3f}  (compile+1st {compile_s:.1f}s)")
        full16 = measured16.get("full_chunk")
        rf16 = chunk_roofline(
            cfg, cv.tokenizer_params, cv.arvc_params, cv.vocoder_params,
            fstate=fs16,
            compute_s=(max(full16 - null, 1e-9) if full16 else None),
            peaks=device_peaks(tpu))
        print("state-bf16 " + format_report(rf16))
        floors16 = rf16.get("stage_bw_floor_ms")
        if floors16:
            pairs16 = [("encode", floors16["encode"]),
                       ("lm_decode", floors16["lm_slow"] + floors16["lm_fast"]),
                       ("lm_slow_kern", floors16["lm_slow"]),
                       ("vocoder", floors16["vocode"])]
            for name, floor in pairs16:
                if name in measured16:
                    ms = (measured16[name] - null) * 1e3
                    print(f"  {name}[state-bf16] measured {ms:6.3f} ms vs "
                          f"bw-floor {floor:6.3f} ms -> "
                          f"{ms/max(floor,1e-9):5.2f}x floor, "
                          f"{100.0*floor/max(ms,1e-9):5.1f}% of peak BW")

    # ---- paired kernel-flag variants (same process, same session) ----------
    # cross-session relay drift is ~0.2 ms/chunk — same order as the DSP
    # kernels' individual effects — so adjudication numbers must be paired.
    for tag in filter(None, args.compare.split(",")):
        names = set() if tag == "xla" else set(tag.split("+"))
        cfg_v = flags_cfg(names)
        cv_v = VoiceConverter(
            cfg=cfg_v, tokenizer_params=cv.tokenizer_params,
            vocoder_params=cv.vocoder_params, arvc_params=cv.arvc_params)
        sess_v = sess.transfer(cv_v, tpu)
        jax.block_until_ready(sess_v.fstate)
        fsv = sess_v.fstate

        def sc_enc(tok_p, tstate, ring, xs, cfg_b=cfg_v, mc=sess_v._mel_consts):
            def body(carry, chunk):
                ts, rg = carry
                ts, rg, t = _encode_inc(tok_p, cfg_b, ts, rg, chunk, mc)
                return (ts, rg), t
            return jax.lax.scan(body, (tstate, ring), xs)

        def sc_lm(arvc_p, lm, key, xs, cfg_b=cfg_v, smp=sess_v.sampling):
            def body(carry, tok):
                st, kk = carry
                kk, sub = jax.random.split(kk)
                st, c = arvc.decode_one(arvc_p, cfg_b.arvc, st, tok, sub, smp)
                return (st, kk), c
            return jax.lax.scan(body, (lm, key), xs)

        def sc_voc(voc_p, vstate, xs, cfg_b=cfg_v):
            def body(carry, c):
                return vocoder.decode_stream(voc_p, cfg_b.vocoder, carry, c)
            return jax.lax.scan(body, vstate, xs)

        def sc_full(ps, fstate, key, xs, cfg_b=cfg_v, sess_b=None):
            tok_p, arvc_p, voc_p = ps
            mc, smp = sess_v._mel_consts, sess_v.sampling
            def body(carry, chunk):
                f, kk = carry
                ts, rg, t = _encode_inc(tok_p, cfg_b, f.tok, f.tok_ring,
                                        chunk, mc)
                kk, sub = jax.random.split(kk)
                lm, cr, vs, wav, _k = _decode_vocode_inc(
                    arvc_p, voc_p, cfg_b, f.lm, f.code_ring, f.voc, t,
                    smp, sub)
                f = f._replace(tok=ts, tok_ring=rg, lm=lm, code_ring=cr,
                               voc=vs)
                return (f, kk), wav
            return jax.lax.scan(body, (fstate, key), xs)

        vjobs = {
            "encode": (scalarize(sc_enc,
                                 lambda o: jnp.sum(o[1]).astype(jnp.float32)),
                       (cv_v.tokenizer_params, fsv.tok, fsv.tok_ring, chunks)),
            "lm_decode": (scalarize(sc_lm,
                                    lambda o: jnp.sum(o[1]).astype(jnp.float32)),
                          (cv_v.arvc_params, fsv.lm, jax.random.PRNGKey(5),
                           toks)),
            "vocoder": (scalarize(sc_voc,
                                  lambda o: jnp.sum(o[1]).astype(jnp.float32)),
                        (cv_v.vocoder_params, fsv.voc, codes)),
            "full_chunk": (scalarize(sc_full,
                                     lambda o: jnp.sum(o[1]).astype(jnp.float32)),
                           ((cv_v.tokenizer_params, cv_v.arvc_params,
                             cv_v.vocoder_params), fsv,
                            jax.random.PRNGKey(6), chunks)),
        }
        if args.stages:
            keep = set(args.stages.split(","))
            vjobs = {k: v for k, v in vjobs.items() if k in keep}
        for name, (fn, a) in vjobs.items():
            t0 = time.time()
            np.asarray(fn(*a))
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                np.asarray(fn(*a))
                best = min(best, (time.perf_counter() - t0) / K)
            label = f"{name}[{tag}]"
            print(f"{label:22s} {best*1e3:6.3f} ms/chunk  "
                  f"RTF {best/FRAME_SECONDS:5.3f}  (compile+1st {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
