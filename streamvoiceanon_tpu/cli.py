"""Command-line interface.

    python -m streamvoiceanon_tpu.cli convert --src S.wav --ref R.wav [R2.wav ...]
        [--out out.wav] [--delay 2] [--alpha 1.0] [--simulate-streaming]
        [--ckpt-dir DIR] [--preset balanced] [--seed 0]

The torch-checkpoint equivalent of the reference CLI
(evaluations/infer_arvc.py:691-743).  Checkpoints: --ckpt-dir must contain
the five published state_dicts (SURVEY.md §2.5); without it the pipeline
runs with random weights (smoke/demo mode).
"""

from __future__ import annotations

import argparse
import sys
import time


def build_converter_from_ckpts(ckpt_dir: str | None, seed: int = 0,
                               lenient: bool = False):
    import jax
    import jax.numpy as jnp

    from streamvoiceanon_tpu.config import PipelineConfig, tpu_optimized
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter

    cfg = PipelineConfig()
    if jax.default_backend() == "tpu":
        cfg = tpu_optimized(cfg)
    if ckpt_dir is None:
        from streamvoiceanon_tpu.utils import randparams as rp

        print("[warn] no --ckpt-dir: running with RANDOM weights", file=sys.stderr)
        dev = jax.devices()[0]
        return VoiceConverter(
            cfg=cfg,
            tokenizer_params=jax.device_put(rp.tokenizer_params_np(cfg.tokenizer, seed), dev),
            vocoder_params=jax.device_put(rp.vocoder_params_np(cfg.vocoder, seed + 1), dev),
            arvc_params=jax.device_put(
                jax.tree.map(jnp.asarray, rp.arvc_params_np(cfg.arvc, seed + 2)), dev
            ),
            campplus_params=jax.device_put(
                rp.campplus_params_np(cfg.campplus, seed + 3), dev
            ),
            speaker_params=jax.device_put(
                rp.speaker_encoder_params_np(cfg.speaker, seed + 4), dev
            ),
        )

    import os

    import torch

    from streamvoiceanon_tpu.models import arvc as arvc_mod
    from streamvoiceanon_tpu.models import campplus as campplus_mod
    from streamvoiceanon_tpu.models import speaker_encoder as spk_mod
    from streamvoiceanon_tpu.runtime import convert

    def load(name):
        path = os.path.join(ckpt_dir, name)
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "net" in sd:
            sd = sd["net"]
        return {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}

    # Strict key coverage: every checkpoint key must be consumed by its
    # converter (the reference load path drops orphans silently via
    # strict=False, infer_arvc.py:70-83 — ours refuses and lists them;
    # lenient=True downgrades to a printed report)
    def strict(fn, name, ccfg):
        params, leftover = convert.convert_with_coverage(fn, load(name), ccfg)
        if leftover:
            msg = (f"[ckpt] {name}: {len(leftover)} unconsumed key(s): "
                   f"{', '.join(leftover[:12])}{' ...' if len(leftover) > 12 else ''}")
            if lenient:
                print(msg, file=sys.stderr)
            else:
                raise KeyError(msg + "  (pass --lenient-ckpt to load anyway)")
        return params

    tok = strict(convert.tokenizer, "asr_s2s_bsq_8192_causal_down_whisper.pth",
                 cfg.tokenizer)
    voc = strict(convert.vocoder, "firefly-gan-vq-fsq-8x1024-21hz-generator.pth",
                 cfg.vocoder)
    arvc_p = arvc_mod.prepare_params(
        strict(convert.arvc, "dual_ar_delay_0_8.pth", cfg.arvc))
    camp = strict(campplus_mod.convert, "campplus_cn_common.bin", cfg.campplus)
    spk = strict(spk_mod.convert, "spark_speaker_encoder.pth", cfg.speaker)
    import jax

    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter

    jmap = lambda t: jax.tree.map(jax.numpy.asarray, t)  # noqa: E731
    return VoiceConverter(
        cfg=cfg, tokenizer_params=jmap(tok), vocoder_params=jmap(voc),
        arvc_params=arvc_p, campplus_params=jmap(camp), speaker_params=jmap(spk),
    )


def cmd_convert(args):
    import jax
    import numpy as np

    from streamvoiceanon_tpu.audio.io import read_wav, write_wav
    from streamvoiceanon_tpu.config import SamplingConfig, preset

    cv = build_converter_from_ckpts(args.ckpt_dir, args.seed,
                                lenient=getattr(args, 'lenient_ckpt', False))
    src, sr = read_wav(args.src, target_sr=cv.cfg.sample_rate)
    refs = [read_wav(p, target_sr=cv.cfg.sample_rate)[0] for p in args.ref]
    key = jax.random.PRNGKey(args.seed)
    sampling = SamplingConfig(temperature=args.temperature, top_p=args.top_p)

    scfg = preset(args.preset) if args.preset else cv.cfg.stream
    delay = args.delay if args.delay is not None else scfg.delay
    alpha = args.alpha if args.alpha is not None else scfg.alpha

    t0 = time.time()
    if args.simulate_streaming:
        from streamvoiceanon_tpu.config import replace
        from streamvoiceanon_tpu.runtime.streaming import StreamSession

        scfg = replace(scfg, delay=delay, alpha=alpha,
                       decode_chunk_frames=args.decode_chunk_frames)
        sess = StreamSession(cv, scfg, refs, key=key, sampling=sampling,
                             incremental=not args.window_mode)
        out = sess.stream_file(src)
    else:
        out = cv.infer(src, refs, delay=delay, alpha=alpha, key=key,
                       sampling=sampling, ref_crop_lengths=args.ref_crop_lengths)
    dur = len(out) / cv.cfg.sample_rate
    wall = time.time() - t0
    print(f"converted {dur:.1f}s of audio in {wall:.1f}s (RTF {wall/max(dur,1e-9):.2f})")
    out_path = args.out or "converted.wav"
    write_wav(out_path, out, cv.cfg.sample_rate)
    print(f"wrote {out_path}")


def cmd_batch(args):
    """SeedTTS-style testset runner (evaluations/infer_seedtts_testset.py:5-48):
    meta.lst lines `name|prompt_wav|source_wav` -> converted wavs in out dir."""
    import os

    import jax

    from streamvoiceanon_tpu.audio.io import read_wav, write_wav
    from streamvoiceanon_tpu.config import SamplingConfig

    cv = build_converter_from_ckpts(args.ckpt_dir, args.seed,
                                lenient=getattr(args, 'lenient_ckpt', False))
    sampling = SamplingConfig(temperature=args.temperature, top_p=args.top_p)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(args.meta) as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) < 3:
                continue
            name, prompt_path, src_path = parts[0], parts[1], parts[2]
            src, _ = read_wav(src_path, target_sr=cv.cfg.sample_rate)
            ref, _ = read_wav(prompt_path, target_sr=cv.cfg.sample_rate)
            out = cv.infer(src, [ref], delay=args.delay, alpha=args.alpha,
                           key=jax.random.PRNGKey(args.seed), sampling=sampling)
            write_wav(os.path.join(args.out_dir, f"{name}.wav"), out,
                      cv.cfg.sample_rate)
            print(f"wrote {name}.wav")


def cmd_anonymize(args):
    """Dataset anonymization (anon/run_anonymization.py equivalent): every
    utterance of a kaldi dir is converted against per-speaker target
    references with noise-mixed embeddings; writes `<out-dir>` with wavs +
    kaldi tables."""
    from streamvoiceanon_tpu.audio.io import read_wav
    from streamvoiceanon_tpu.evals.anonymize import anonymize_kaldi_dir

    cv = build_converter_from_ckpts(args.ckpt_dir, args.seed,
                                lenient=getattr(args, 'lenient_ckpt', False))
    targets = [read_wav(p, target_sr=cv.cfg.sample_rate)[0] for p in args.target_refs]
    anonymize_kaldi_dir(
        cv, args.data_dir, args.out_dir, targets,
        alpha=args.alpha, delay=args.delay, seed=args.seed,
        sample_rate=cv.cfg.sample_rate,
    )
    print(f"anonymized {args.data_dir} -> {args.out_dir}")


def cmd_evaluate(args):
    """Privacy/utility evaluation (anon/run_evaluation.py equivalent) over
    kaldi dirs laid out as `<name>` + `<name><anon-suffix>`.  ASR WER uses
    hypotheses cached under `<results-dir>/asr/<set>/text` (transcribe with
    any backend, e.g. `evals.wer` + the framework ASR decoder)."""
    from pathlib import Path

    from streamvoiceanon_tpu.evals.harness import (
        ASRStep,
        ASVStep,
        EvalConfig,
        SERStep,
        run_evaluation,
    )

    if args.ckpt_dir:
        cv = build_converter_from_ckpts(args.ckpt_dir, args.seed,
                                lenient=getattr(args, 'lenient_ckpt', False))
        cp_params, cp_cfg = cv.campplus_params, cv.cfg.campplus
    else:
        from streamvoiceanon_tpu.config import PipelineConfig
        from streamvoiceanon_tpu.utils import randparams as rp

        cp_cfg = PipelineConfig().campplus
        cp_params = rp.campplus_params_np(cp_cfg, args.seed)
        print("[warn] no --ckpt-dir: ASV scoring with RANDOM weights", file=sys.stderr)

    cfg = EvalConfig(
        data_dir=Path(args.data_dir), results_dir=Path(args.results_dir),
        anon_data_suffix=args.anon_suffix,
        asv=ASVStep(
            enrolls=args.asv_enrolls, trials=args.asv_trials,
            train_asv_on_anon=args.train_asv_on_anon,
            train_dirs=args.train_dirs or (),
            distance=args.asv_distance,
            anon_backbone=args.asv_anon_backbone,
        ) if args.asv_enrolls else None,
        asr=ASRStep(datasets=args.asr_datasets) if args.asr_datasets else None,
        ser=SERStep(datasets=args.ser_datasets, emotions=tuple(args.ser_emotions))
        if args.ser_datasets else None,
        sample_rate=args.sample_rate,
    )
    transcriber = None
    if args.asr_datasets:
        from streamvoiceanon_tpu.evals.kaldi import read_kaldi_format

        sets = list(args.asr_datasets) + [d + args.anon_suffix for d in args.asr_datasets]
        cached = all(
            (Path(args.results_dir) / "asr" / s / "text").exists() for s in sets
        )
        if not cached and not args.asr_train_dirs:
            sys.exit(
                "evaluate: --asr-datasets given but hypotheses are not cached "
                "under results-dir/asr and no --asr-train-dirs to fit the "
                "native ASR_eval recognizer (evals/asr_eval_train.py)"
            )
        if not cached:
            from streamvoiceanon_tpu.evals.anonymize import load_kaldi_dir

            utts, texts = [], {}
            for d in args.asr_train_dirs:
                path = str(Path(args.data_dir) / d)
                utts.extend(load_kaldi_dir(path, sample_rate=args.sample_rate))
                texts.update(read_kaldi_format(Path(path) / "text"))
            if args.asr_model == "w2v":
                from streamvoiceanon_tpu.evals import asr_eval_w2v as aw

                print(f"[asr_eval] training w2v-BERT conformer recognizer on "
                      f"{len(utts)} utts", file=sys.stderr)
                params, vocab = aw.train_asr_eval_w2v(
                    utts, texts, utt_sample_rate=args.sample_rate
                )
                transcriber = aw.make_transcriber_w2v(params, vocab)
            else:
                from streamvoiceanon_tpu.evals import asr_eval_train as aet

                print(f"[asr_eval] training compact CTC recognizer on "
                      f"{len(utts)} utts", file=sys.stderr)
                params, vocab = aet.train_asr_eval(
                    utts, texts, utt_sample_rate=args.sample_rate
                )
                transcriber = aet.make_transcriber(params, vocab)

    results = run_evaluation(cfg, campplus_params=cp_params, cp_cfg=cp_cfg,
                             transcriber=transcriber)
    for name, df in results.items():
        print(f"== {name} ==")
        print(df.to_string())
    print(f"summary: {Path(args.results_dir) / 'results_summary.txt'}")


def cmd_live(args):
    """Operator live app (real-time-gui.py headless equivalent): duplex
    stream + status monitor, preset/reference hot-switching on a schedule."""
    import numpy as np

    from streamvoiceanon_tpu.audio.io import read_wav
    from streamvoiceanon_tpu.runtime import live as live_mod

    if args.list_devices:
        devs = live_mod.list_audio_devices(args.hostapi)
        if not devs:
            print("sounddevice not installed — no hardware devices "
                  "(synthetic duplex only)")
        else:
            print(f"hostapis: {devs['hostapis']}")
            print(f"inputs ({devs['hostapi']}): {devs['inputs']}")
            print(f"outputs ({devs['hostapi']}): {devs['outputs']}")
        return

    if not args.ref:
        raise SystemExit("live: --ref is required (unless --list-devices)")
    cv = build_converter_from_ckpts(args.ckpt_dir, args.seed,
                                lenient=getattr(args, 'lenient_ckpt', False))
    app = live_mod.LiveApp(cv, args.preset, seed=args.seed)

    refs = [read_wav(p, target_sr=cv.cfg.sample_rate)[0] for p in args.ref]
    print(f"prefilling reference {args.ref[0]} ...", file=sys.stderr)
    app.set_reference(refs, args.ref[0])
    app.warm_up(progress=lambda i, n: print(
        f"\rcompiling chunk phase {i}/{n}", end="", file=sys.stderr, flush=True))
    print(file=sys.stderr)

    if args.src == "noise":
        rng = np.random.default_rng(args.seed)
        src = (rng.standard_normal(cv.cfg.sample_rate * 8) * 0.05).astype(np.float32)
    else:
        src, _ = read_wav(args.src, target_sr=cv.cfg.sample_rate)

    if args.use_device and live_mod.have_sounddevice():
        duplex = live_mod.SoundDeviceDuplex(
            app.engine, block_frames=args.block,
            input_device=args.device_in, output_device=args.device_out)
    else:
        duplex = live_mod.SyntheticDuplex(
            app.engine, src, block_frames=args.block, sink=False)

    switches = []  # (t_seconds, kind, value)
    for spec in args.switch_preset or []:
        name, t = spec.rsplit("@", 1)
        switches.append((float(t), "preset", name))
    switches.sort()

    app.start()
    duplex.start()
    t0 = __import__("time").perf_counter()
    try:
        remaining = list(switches)
        elapsed = 0.0
        while elapsed < args.duration:
            step = min(0.5, args.duration - elapsed)
            live_mod.monitor(app, step, interval_s=step, out=sys.stderr)
            elapsed = __import__("time").perf_counter() - t0
            while remaining and elapsed >= remaining[0][0]:
                _, kind, val = remaining.pop(0)
                if kind == "preset":
                    print(f"\n[switch] preset -> {val}", file=sys.stderr)
                    duplex.stop()
                    app.set_preset(val)
                    duplex = live_mod.SyntheticDuplex(
                        app.engine, src, block_frames=args.block, sink=False)
                    duplex.start()
    finally:
        duplex.stop()
        app.stop()
    st = app.status()
    print(st.line())


def main(argv=None):
    p = argparse.ArgumentParser(prog="streamvoiceanon_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("batch", help="meta.lst testset conversion (SeedTTS style)")
    b.add_argument("--meta", required=True)
    b.add_argument("--out-dir", default="audio_outputs")
    b.add_argument("--ckpt-dir")
    b.add_argument("--lenient-ckpt", action="store_true",
                    help="warn (instead of error) on checkpoint keys the "
                         "converters did not consume")
    b.add_argument("--delay", type=int, default=2)
    b.add_argument("--alpha", type=float, default=1.0)
    b.add_argument("--temperature", type=float, default=0.7)
    b.add_argument("--top-p", type=float, default=0.7)
    b.add_argument("--seed", type=int, default=0)
    b.set_defaults(fn=cmd_batch)

    c = sub.add_parser("convert", help="voice conversion / anonymization")
    c.add_argument("--src", required=True)
    c.add_argument("--ref", required=True, nargs="+")
    c.add_argument("--out")
    c.add_argument("--ckpt-dir")
    c.add_argument("--lenient-ckpt", action="store_true",
                    help="warn (instead of error) on checkpoint keys the "
                         "converters did not consume")
    c.add_argument("--delay", type=int, default=None)
    c.add_argument("--alpha", type=float, default=None)
    c.add_argument("--preset", choices=["max_privacy", "balanced", "max_quality", "low_latency"])
    c.add_argument("--temperature", type=float, default=0.7)
    c.add_argument("--top-p", type=float, default=0.7)
    c.add_argument("--seed", type=int, default=0)
    c.add_argument("--simulate-streaming", action="store_true")
    c.add_argument("--window-mode", action="store_true",
                   help="reference-faithful window-recompute streaming")
    c.add_argument("--decode-chunk-frames", type=int, default=1)
    c.add_argument("--ref-crop-lengths", type=float, nargs="+", default=None)
    c.set_defaults(fn=cmd_convert)

    a = sub.add_parser("anonymize", help="anonymize a kaldi-format dataset dir")
    a.add_argument("--data-dir", required=True)
    a.add_argument("--out-dir", required=True)
    a.add_argument("--target-refs", required=True, nargs="+",
                   help="target-speaker reference wavs (pseudo-speaker pool)")
    a.add_argument("--ckpt-dir")
    a.add_argument("--lenient-ckpt", action="store_true",
                    help="warn (instead of error) on checkpoint keys the "
                         "converters did not consume")
    a.add_argument("--delay", type=int, default=2)
    a.add_argument("--alpha", type=float, default=0.7)
    a.add_argument("--seed", type=int, default=0)
    a.set_defaults(fn=cmd_anonymize)

    e = sub.add_parser("evaluate", help="privacy/utility evaluation over kaldi dirs")
    e.add_argument("--data-dir", required=True)
    e.add_argument("--results-dir", required=True)
    e.add_argument("--anon-suffix", default="_anon")
    e.add_argument("--asv-enrolls", nargs="*", default=[])
    e.add_argument("--asv-trials", nargs="*", default=[])
    e.add_argument("--train-asv-on-anon", action="store_true",
                   help="eval_post: retrain ASV on anonymized --train-dirs")
    e.add_argument("--train-dirs", nargs="*", default=[])
    e.add_argument("--asv-distance", choices=["cosine", "plda"], default="cosine")
    e.add_argument("--asv-anon-backbone", choices=["campplus", "ecapa"],
                   default="campplus",
                   help="ASV_eval^anon attacker: fine-tuned CAMPPlus head or "
                        "ECAPA-TDNN trained from random init (VPC protocol, "
                        "evals/ecapa_asv.py)")
    e.add_argument("--asr-datasets", nargs="*", default=[],
                   help="WER sets (hypotheses cached under results-dir/asr)")
    e.add_argument("--asr-train-dirs", nargs="*", default=[],
                   help="kaldi dirs (wav.scp+text) to fit the native "
                        "ASR_eval when hypotheses are not cached")
    e.add_argument("--asr-model", choices=["w2v", "compact"], default="w2v",
                   help="ASR_eval family: w2v-BERT conformer CTC "
                        "(evals/asr_eval_w2v.py, the VPC-protocol-grade "
                        "attacker) or the compact char-CTC transformer")
    e.add_argument("--ser-datasets", nargs="*", default=[],
                   help="SER sets (fold heads trained in place on originals)")
    e.add_argument("--ser-emotions", nargs="*",
                   default=["neu", "hap", "sad", "ang"])
    e.add_argument("--sample-rate", type=int, default=44100)
    e.add_argument("--ckpt-dir")
    e.add_argument("--lenient-ckpt", action="store_true",
                    help="warn (instead of error) on checkpoint keys the "
                         "converters did not consume")
    e.add_argument("--seed", type=int, default=0)
    e.set_defaults(fn=cmd_evaluate)

    lv = sub.add_parser("live", help="real-time operator app (headless GUI)")
    lv.add_argument("--ref", nargs="+", default=[],
                    help="reference wav(s) for the target voice")
    lv.add_argument("--src", default="noise",
                    help="synthetic capture source: wav path or 'noise'")
    lv.add_argument("--preset", default="balanced",
                    choices=["max_privacy", "balanced", "max_quality", "low_latency"])
    lv.add_argument("--duration", type=float, default=10.0)
    lv.add_argument("--block", type=int, default=1536,
                    help="capture block size in samples")
    lv.add_argument("--switch-preset", nargs="*", metavar="NAME@SECONDS",
                    help="hot-switch preset at a time, e.g. low_latency@5")
    lv.add_argument("--use-device", action="store_true",
                    help="use sounddevice hardware duplex when installed")
    lv.add_argument("--device-in")
    lv.add_argument("--device-out")
    lv.add_argument("--hostapi")
    lv.add_argument("--list-devices", action="store_true")
    lv.add_argument("--ckpt-dir")
    lv.add_argument("--lenient-ckpt", action="store_true",
                    help="warn (instead of error) on checkpoint keys the "
                         "converters did not consume")
    lv.add_argument("--seed", type=int, default=0)
    lv.set_defaults(fn=cmd_live)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
