"""Streaming voice-conversion benchmark (real hardware), deadline-aware.

Measures the per-chunk latency of the full-size streaming pipeline at
decode_chunk_frames=1 — the reference's real-time operating point
(infer_arvc.py:492-596: content encode + one 2-token AR frame step + vocode)
— and reports RTF against the 46.44 ms frame budget.  Prints ONE JSON line
on stdout.

Robustness design (two rounds of postmortems):

* round 1 (rc=124, no output): one-time prep paid ~540 s of axon
  remote-compile work.  Fix: ALL one-time prep (param build, reference
  encoding, prompt prefill, delay prefill, warm-up chunks) runs on a CPU
  backend; the TPU only ever compiles the two small per-chunk programs,
  AOT-compiled in parallel threads.  A measurement exists within the first
  ~2 minutes, and the result line is emitted from a SIGTERM/SIGALRM handler.
* round 2 (rc=1, parsed=null): the relay was DOWN and the first backend
  touch hung ~25 min, then raised — and even `jax.devices("cpu")` blocks,
  because backend discovery initializes every platform the sitecustomize
  pins (axon first).  Fix: the main process touches NO jax backend until a
  SUBPROCESS probe confirms the TPU answers (poll with timeout until
  budget - 600 s); CPU prep runs concurrently in a JAX_PLATFORMS=cpu child
  (immune to the tunnel) and crosses back via StreamSession.snapshot().
  If the backend never appears we still print a JSON line with an explicit
  "skipped" marker and exit 0 — the failure mode is machine-readable, never
  an empty artifact.

vs_baseline: the reference needs torch.compile to reach RTF < 1.0 on a
consumer GPU (README.md:53-59); vs_baseline = 1.0 / RTF_measured.
"""

import json
import os
import pickle
import signal
import subprocess
import sys
import threading
import time

import jax


def _enable_compile_cache():
    """Reuse the persistent compilation cache regardless of launcher env.
    Called from __main__ (both parent and prep child), NOT at import: a test
    process importing bench must not leak the cache config — jaxlib's CPU
    thunk-executor aborts deserializing cached multi-device CPU programs
    (observed SIGABRT in xla::cpu::ThunkExecutor under the 8-device dryrun)."""
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import jax.numpy as jnp
import numpy as np

FRAME_SECONDS = 2048 / 44100
T_START = time.time()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "2400"))
# budget reserved AFTER the TPU first answers: converter build + AOT
# compiles (~60-120 s warm cache) + at least the M=1 and M=8 measurements
RESERVE_S = float(os.environ.get("BENCH_RESERVE_S", "600"))

_best_lock = threading.Lock()
_best = None  # latest/best result dict, emitted exactly once
_emitted = False


def log(*a):
    print(f"[{time.time()-T_START:6.1f}s]", *a, file=sys.stderr, flush=True)


def _emit(rc=0, fail_reason=None):
    """Print the single JSON result line (best-so-far) and hard-exit.

    If NOTHING was measured (e.g. the backend aborted after the probe but
    before the first measurement — observed once as a mid-run relay
    `ABORTED`), still print an explicit machine-readable marker and exit 0:
    the artifact must never be empty (round-2 postmortem)."""
    global _best, _emitted
    with _best_lock:
        if _emitted:
            os._exit(rc)
        _emitted = True
        if _best is None:
            reason = fail_reason or "no measurement completed"
            _best = {
                "metric": "streaming_rtf_chunk1",
                "value": None,
                "unit": f"skipped: {reason}",
                "vs_baseline": None,
                "skipped": reason,
            }
            _best.update(_extras)
        print(json.dumps(_best), flush=True)
    os._exit(0)


def _on_signal(signum, frame):
    log(f"signal {signum} received — emitting best-so-far result")
    _emit(0)


def _arm_signals():
    """Install the emit-on-signal path and the deadline alarm.  Called only
    from __main__ — importing bench (benchmarks/, tests) must not schedule
    an alarm that would kill a long-lived host process."""
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGALRM, _on_signal)
    # leave ~15 s of slack before an external `timeout` would SIGKILL us
    signal.alarm(max(30, int(DEADLINE_S - 15)))


def budget_left():
    return DEADLINE_S - (time.time() - T_START)


def _dsp_dtype():
    """DSP (tokenizer/vocoder) serving precision: bf16 halves the dominant
    weight-streaming traffic of the encode/vocode stages (BENCH.md); the
    reference's live GUI likewise serves in fp16 (real-time-gui.py fp16
    inference).  Override with BENCH_DSP_DTYPE=float32."""
    return (jnp.float32 if os.environ.get("BENCH_DSP_DTYPE") == "float32"
            else jnp.bfloat16)


def _state_dtype():
    """Serving state precision (LM KV cache + DSP stream tails): bf16 halves
    the largest single per-chunk HBM term — the slow-step KV-cache read
    (151 MB at f32, roofline `lm_slow`) — plus the WT ring.  Accuracy of the
    full serving config is quantified by benchmarks/bf16_accuracy.py and
    recorded in BENCH.md next to this default; override with
    BENCH_STATE_DTYPE=float32."""
    return (jnp.float32 if os.environ.get("BENCH_STATE_DTYPE") == "float32"
            else jnp.bfloat16)


# ---------------------------------------------------------------------------
# TPU availability probe — subprocess, so a hung tunnel can be timed out
# ---------------------------------------------------------------------------

_PROBE_SRC = """
import os
import sys
import jax
# the sandbox sitecustomize pins jax_platforms via config, which BEATS the
# env var — re-assert the env so an explicit JAX_PLATFORMS is honored (and
# so a cpu-only test env deterministically probes cpu-only)
plats = os.environ.get("JAX_PLATFORMS")
if plats:
    jax.config.update("jax_platforms", plats)
if not any(d.platform != "cpu" for d in jax.devices()):
    sys.exit(1)
import jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
jax.block_until_ready(x @ x)
sys.exit(0)
"""


def probe_tpu(probe_timeout=180.0, sleep_s=20.0) -> bool:
    """Poll for a usable accelerator backend until it answers or the budget
    drops to RESERVE_S.  Each probe is a subprocess: a relay outage makes
    backend init HANG (not raise), and only a subprocess can be timed out.
    An outage consumes waiting time instead of the round's artifact."""
    attempt = 0
    while budget_left() > RESERVE_S:
        attempt += 1
        t0 = time.time()
        limit = max(5.0, min(probe_timeout, budget_left() - RESERVE_S))
        try:
            rc = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                timeout=limit, capture_output=True,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        took = time.time() - t0
        log(f"tpu probe #{attempt}: "
            f"{'OK' if rc == 0 else f'unavailable ({rc})'} "
            f"[{took:.0f}s, budget {budget_left():.0f}s]")
        if rc == 0:
            return True
        if took < 10.0:  # fast failure — back off; a timed-out probe IS the wait
            time.sleep(min(sleep_s, max(0.0, budget_left() - RESERVE_S)))
    return False


# ---------------------------------------------------------------------------
# one-time prep (runs in a JAX_PLATFORMS=cpu child; fallback: in-process)
# ---------------------------------------------------------------------------


def _source_wavs(cfg):
    """Deterministic ref/src material — parent and child must agree."""
    spf = cfg.samples_per_frame
    rng = np.random.default_rng(0)
    ref_wav = (rng.standard_normal(64 * spf) * 0.1).astype(np.float32)
    src_wav = (rng.standard_normal(64 * spf) * 0.1).astype(np.float32)
    return rng, ref_wav, src_wav


def build_converter(key, lm_dtype=jnp.bfloat16, device=None):
    """Random full-size params built host-side with numpy (one device_put per
    tree beats hundreds of tiny RNG dispatches through the TPU tunnel).
    Shared with benchmarks/{throughput,multistream}.py."""
    from streamvoiceanon_tpu.config import PipelineConfig
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.utils import randparams as rp

    cfg = PipelineConfig()
    dev = device or jax.devices()[0]
    return VoiceConverter(
        cfg=cfg,
        tokenizer_params=jax.device_put(rp.tokenizer_params_np(cfg.tokenizer, 1), dev),
        vocoder_params=jax.device_put(rp.vocoder_params_np(cfg.vocoder, 2), dev),
        arvc_params=jax.device_put(rp.arvc_params_np(cfg.arvc, 3, lm_dtype), dev),
    )


def cpu_prep_snapshot():
    """Phases 1+2 on the CPU backend: params, reference encoding, prompt
    prefill, delay prefill, warm-up chunks.  Returns (snapshot, n_warm).

    Runs inside the prep child only — jax_platforms is pinned to cpu there,
    so `jax.devices("cpu")` / default_device resolve without ever touching
    the axon tunnel."""
    from streamvoiceanon_tpu.config import PipelineConfig, SamplingConfig
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.runtime.streaming import StreamSession
    from streamvoiceanon_tpu.utils import randparams as rp

    cfg = PipelineConfig()
    dsp_dtype = _dsp_dtype()
    t0 = time.time()
    tok_np = rp.tokenizer_params_np(cfg.tokenizer, 1, dtype=dsp_dtype)
    voc_np = rp.vocoder_params_np(cfg.vocoder, 2, dtype=dsp_dtype)
    arvc_np = rp.arvc_params_np(cfg.arvc, 3, jnp.bfloat16)
    log(f"prep: numpy params {time.time()-t0:.1f}s "
        f"(dsp dtype {jnp.dtype(dsp_dtype).name})")

    t0 = time.time()
    spf = cfg.samples_per_frame
    rng, ref_wav, src_wav = _source_wavs(cfg)
    cpu_dev = jax.devices("cpu")[0]
    with jax.default_device(cpu_dev):
        cv_cpu = VoiceConverter(
            cfg=cfg,
            tokenizer_params=jax.device_put(tok_np, cpu_dev),
            vocoder_params=jax.device_put(voc_np, cpu_dev),
            arvc_params=jax.device_put(arvc_np, cpu_dev),
        )
        ref = jax.device_put(jnp.asarray(ref_wav)[None], cpu_dev)
        ref_tokens = cv_cpu.content_tokens(ref)
        ref_codes = cv_cpu.audio_codes(ref)
        style = jax.device_put(
            jnp.asarray(rng.standard_normal((1, 192)), jnp.bfloat16), cpu_dev)
        timbre = jax.device_put(
            jnp.asarray(rng.standard_normal((1, 32, 128)), jnp.bfloat16), cpu_dev)
        sess = StreamSession(
            cv_cpu, cfg.stream, key=jax.random.PRNGKey(1),
            sampling=SamplingConfig(),
            style=style, timbre=timbre, ref_tokens=ref_tokens, ref_codes=ref_codes,
            state_dtype=_state_dtype(),
        )
        # warm through all host-side phase transitions (delay fill + delay
        # prefill + first decodes) so the TPU session starts in steady state
        n_warm = cfg.stream.delay + 3
        for i in range(n_warm):
            sess.process_chunk(src_wav[i * spf : (i + 1) * spf])
        snap = sess.snapshot()
    log(f"prep: CPU ref enc + prefill + {n_warm} warm chunks "
        f"{time.time()-t0:.1f}s")
    return snap, n_warm


def prep_child_main(out_path):
    """Entry for `bench.py --prep-child OUT`: CPU-only prep process."""
    # the env var alone is NOT enough — the sandbox sitecustomize pins
    # jax_platforms via jax.config, which beats JAX_PLATFORMS; re-pin to cpu
    # before the first backend touch.  NO persistent compile cache here:
    # local CPU compiles are cheap (~30 s total), and the shared cache dir
    # can serve CPU executables AOT-compiled on a different machine type
    # (cpu_aot_loader "machine features don't match ... SIGILL" — observed
    # crashing the 8-device dryrun program).
    jax.config.update("jax_platforms", "cpu")
    snap, n_warm = cpu_prep_snapshot()
    with open(out_path, "wb") as f:
        pickle.dump({"snapshot": snap, "n_warm": n_warm}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    log(f"prep child: wrote {out_path} "
        f"({os.path.getsize(out_path)/1e6:.0f} MB)")


# ---------------------------------------------------------------------------
# result bookkeeping
# ---------------------------------------------------------------------------


_extras = {}  # named sections (device_floor, roofline, refill, pipelined)


def add_section(name, payload):
    """Attach a named result section; survives later update_best calls."""
    global _best
    with _best_lock:
        _extras[name] = payload
        if _best is not None:
            _best[name] = payload


def update_best(results, scan_results=None, pipelined=None):
    """results: {M: (period_s, p50_latency_s)} per-chunk-dispatch fetch
    groups; scan_results: {G: (period_s, group_latency_s)} scan-dispatch
    groups (one program dispatch + one fetch per G chunks); pipelined:
    {"period_s", "p50_latency_s"} from the RealtimeEngine run.

    Headline semantics (VERDICT r3 next #7 — no ambiguity between
    group-throughput and live latency):
    * `value` / `realtime_*` — the REALTIME-VIABLE operating point: lowest
      sustained period among modes whose per-chunk delivery latency fits
      the 46.44 ms frame budget (real-time-gui.py:219-229's constraint).
    * `throughput_*` — lowest sustained period across ALL modes regardless
      of delivery latency (batch/relay-amortized streaming)."""
    global _best
    cands = []  # (period_s, latency_s, mode description)
    for m, (period, lat) in results.items():
        desc = ("M=1 per-chunk fetch" if m == 1 else
                f"device-concat fetch M={m}")
        cands.append((period, lat, desc))
    for g, (period, lat) in (scan_results or {}).items():
        cands.append((period, lat,
                      f"scan-dispatch group G={g} (one dispatch+fetch per {g} chunks)"))
    if pipelined:
        cands.append((pipelined["period_s"], pipelined["p50_latency_s"],
                      "pipelined RealtimeEngine (dispatch + fetch threads)"))
    if not cands:
        return
    t_period, t_lat, t_desc = min(cands, key=lambda c: c[0])
    t_rtf = t_period / FRAME_SECONDS
    entry = {
        "metric": "streaming_rtf_chunk1",
        "throughput_rtf": round(t_rtf, 4),
        "throughput_mode": t_desc,
        "throughput_latency_ms": round(t_lat * 1e3, 1),
    }
    rt = [c for c in cands if c[1] <= FRAME_SECONDS]
    if rt:
        p_rt, l_rt, d_rt = min(rt, key=lambda c: c[0])
        rt_rtf = p_rt / FRAME_SECONDS
        entry["realtime_rtf"] = round(rt_rtf, 4)
        entry["realtime_latency_ms"] = round(l_rt * 1e3, 1)
        entry["realtime_mode"] = d_rt
        entry["value"] = round(rt_rtf, 4)
        entry["unit"] = (
            f"realtime-viable sustained RTF: chunk period / 46.44ms frame, "
            f"delivery latency {l_rt*1e3:.0f}ms <= frame budget ({d_rt}); "
            f"best throughput RTF {t_rtf:.3f} ({t_desc})")
        entry["vs_baseline"] = round(1.0 / rt_rtf, 2) if rt_rtf > 0 else None
    else:
        entry["realtime_rtf"] = None
        entry["realtime_mode"] = ("none: no mode delivered within the "
                                  "46.44ms frame budget")
        entry["value"] = round(t_rtf, 4)
        entry["unit"] = (
            f"sustained chunk period / 46.44ms frame ({t_desc}, delivery "
            f"latency {t_lat*1e3:.0f}ms — NOT latency-fit; no realtime mode)")
        entry["vs_baseline"] = round(1.0 / t_rtf, 2) if t_rtf > 0 else None
    m1 = results.get(1)
    if m1:
        entry["unit"] += (f"; M=1: RTF {m1[0]/FRAME_SECONDS:.2f} "
                          f"at {m1[1]*1e3:.0f}ms")
    with _best_lock:
        entry.update(_extras)
        _best = entry


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------


def main():
    from dataclasses import replace as _rep

    from streamvoiceanon_tpu.config import PipelineConfig, tpu_optimized
    from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter
    from streamvoiceanon_tpu.runtime.streaming import (
        StreamSession, _decode_vocode_inc, _encode_inc,
    )
    from streamvoiceanon_tpu.utils import randparams as rp
    from streamvoiceanon_tpu.utils.jitopts import scoped_vmem_jit

    global _best
    cfg = PipelineConfig()
    dsp_dtype = _dsp_dtype()
    add_section("precision", {
        "dsp_dtype": jnp.dtype(dsp_dtype).name,
        "state_dtype": jnp.dtype(_state_dtype()).name,
        "lm_dtype": "bfloat16",
        "accuracy_evidence": "benchmarks/bf16_accuracy.py (BENCH.md)",
    })
    spf = cfg.samples_per_frame
    rng, ref_wav, src_wav = _source_wavs(cfg)

    # ---- phase 0: CPU prep child + TPU probe, concurrently ----------------
    # NO jax backend touch in this process until the probe says OK: during a
    # relay outage the first touch blocks for ~25 min (round-2 postmortem).
    prep_path = f"/tmp/bench_prep_{os.getpid()}.pkl"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--prep-child", prep_path],
        env=env, stdout=sys.stderr, stderr=sys.stderr,
    )
    log(f"prep child spawned (pid {child.pid}); probing TPU")

    # parent's own param copies (pure numpy, no backend) for the TPU-side
    # converter — same seeds/dtypes as the child, so state and params agree
    t0 = time.time()
    tok_np = rp.tokenizer_params_np(cfg.tokenizer, 1, dtype=dsp_dtype)
    voc_np = rp.vocoder_params_np(cfg.vocoder, 2, dtype=dsp_dtype)
    arvc_np = rp.arvc_params_np(cfg.arvc, 3, jnp.bfloat16)
    log(f"numpy params: {time.time()-t0:.1f}s (dsp dtype {jnp.dtype(dsp_dtype).name})")

    if not probe_tpu():
        try:
            child.kill()
        except Exception:  # noqa: BLE001
            pass
        with _best_lock:
            _best = {
                "metric": "streaming_rtf_chunk1",
                "value": None,
                "unit": "skipped: tpu backend unavailable for the whole run",
                "vs_baseline": None,
                "skipped": (f"tpu backend unavailable after "
                            f"{time.time()-T_START:.0f}s of subprocess probes"),
            }
        log("TPU never became available — emitting explicit skip marker")
        _emit(0)

    # backend confirmed up — first in-process touch is now safe
    tpu_dev = jax.devices()[0]
    log(f"devices: tpu={tpu_dev}")

    # ---- phase 2: collect the prep snapshot --------------------------------
    # The fallback is a child RETRY, not in-process prep: the parent's
    # jax_platforms may be pinned to the accelerator only (no cpu platform),
    # and post-init it cannot be re-pinned.
    snap = n_warm = None
    for round_no in (1, 2):
        try:
            child.wait(timeout=max(60.0, budget_left() - 240.0))
            if child.returncode == 0:
                with open(prep_path, "rb") as f:
                    blob = pickle.load(f)
                snap, n_warm = blob["snapshot"], blob["n_warm"]
                log("prep snapshot loaded from child")
        except subprocess.TimeoutExpired:
            child.kill()
            log("prep child timed out — killed")
        except Exception as e:  # noqa: BLE001
            log(f"prep snapshot load failed ({type(e).__name__}: {e})")
        finally:
            try:
                os.unlink(prep_path)
            except OSError:
                pass
        if snap is not None or round_no == 2 or budget_left() < 300:
            break
        log("retrying prep child once")
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--prep-child", prep_path],
            env=env, stdout=sys.stderr, stderr=sys.stderr,
        )
    if snap is None:
        with _best_lock:
            _best = {
                "metric": "streaming_rtf_chunk1",
                "value": None,
                "unit": "skipped: cpu prep failed twice",
                "vs_baseline": None,
                "skipped": "cpu prep child failed twice — see stderr",
            }
        log("prep failed twice — emitting explicit skip marker")
        _emit(0)

    # ---- phase 3+4: restore onto TPU + AOT compiles, with flag fallback ----
    # The tpu_optimized program set routes the LM hot loops through the
    # Pallas kernels; if a kernel fails to compile on this backend (new
    # kernels land every round), fall back to a reduced flag set rather than
    # losing the round's artifact.
    chunk_dev = jax.device_put(jnp.zeros((1, spf), jnp.float32), tpu_dev)
    toks_dev = jax.device_put(jnp.zeros((1, 1), jnp.int32), tpu_dev)

    def fast_only(c):
        return _rep(c, arvc=_rep(c.arvc, decoder=_rep(
            c.arvc.decoder, use_pallas_fast_decode=True)))

    def fast_slow(c):
        return _rep(c, arvc=_rep(c.arvc, decoder=_rep(
            c.arvc.decoder, use_pallas_fast_decode=True,
            use_pallas_slow_decode=True)))

    cv_tpu = sess = cfg_tpu = None
    for label, cfg_try in (("tpu_optimized", tpu_optimized(cfg)),
                           ("pallas fast+slow", fast_slow(cfg)),
                           ("pallas_fast only", fast_only(cfg)),
                           ("plain XLA", cfg)):
        t0 = time.time()
        try:
            cv_try = VoiceConverter(
                cfg=cfg_try,
                tokenizer_params=jax.device_put(tok_np, tpu_dev),
                vocoder_params=jax.device_put(voc_np, tpu_dev),
                arvc_params=jax.device_put(arvc_np, tpu_dev),
            )
            s_try = StreamSession.restore(cv_try, snap, tpu_dev)
            jax.block_until_ready(s_try.fstate)
            fs = s_try.fstate
            # AOT-compile the two per-chunk programs in parallel threads —
            # compile is C++/IO-bound so threads overlap the remote round
            # trips; exceptions propagate so the fallback can engage
            comp = {
                "encode_inc": lambda: _encode_inc.lower(
                    cv_try.tokenizer_params, cfg_try, fs.tok, fs.tok_ring,
                    chunk_dev, s_try._mel_consts).compile(),
                "decode_vocode_inc": lambda: _decode_vocode_inc.lower(
                    cv_try.arvc_params, cv_try.vocoder_params, cfg_try, fs.lm,
                    fs.code_ring, fs.voc, toks_dev, s_try.sampling,
                    s_try.key).compile(),
            }
            errs = []
            ths = []
            for name, job in comp.items():
                def run(name=name, job=job):
                    ti = time.time()
                    try:
                        job()
                        log(f"  AOT compile {name}: {time.time()-ti:.1f}s")
                    except Exception as e:  # noqa: BLE001
                        errs.append(e)
                th = threading.Thread(target=run, daemon=True)
                th.start()
                ths.append(th)
            for th in ths:
                th.join()
            if errs:
                raise errs[0]
            cv_tpu, sess, cfg_tpu = cv_try, s_try, cfg_try
            log(f"program set '{label}' compiled: {time.time()-t0:.1f}s")
            break
        except Exception as e:  # noqa: BLE001
            log(f"program set '{label}' FAILED ({type(e).__name__}: "
                f"{str(e)[:200]}) — falling back")
    if sess is None:
        raise RuntimeError("no program set compiled")
    fs = sess.fstate

    # the concat program's FIRST touch of a relay session can stall behind
    # queued work — warm it before measurements
    t0 = time.time()
    cat = jax.jit(lambda xs: jnp.concatenate(xs, axis=-1))
    np.asarray(cat([chunk_dev, chunk_dev]))
    log(f"concat warm: {time.time()-t0:.1f}s")

    # warm-up: first real calls hit the (now-warm) compile caches
    t0 = time.time()
    for i in range(2):
        np.asarray(sess.process_chunk_async(
            src_wav[(n_warm + i) * spf:(n_warm + i + 1) * spf]))
    log(f"TPU warm-up chunks: {time.time()-t0:.1f}s")

    # warm the REFILL programs (one-shot fast refill + background per-chunk
    # history append + delay prefill) with throwaway state: measurements may
    # now legitimately cross refill boundaries (phase 5c measures them)
    t0 = time.time()
    try:
        sess.warm_refill_programs()
        log(f"refill programs warm: {time.time()-t0:.1f}s")
    except Exception as e:  # noqa: BLE001
        log(f"refill warm failed ({type(e).__name__}: {e}) — "
            f"refill-crossing phases may pay a compile")

    # ---- phase 5: measurements, cheapest-first, deadline-guarded -----------
    # The axon relay executes chained programs lazily and charges ~20-25 ms
    # per host fetch (size-independent), ~1-3 ms per drained program.  M>1
    # groups M chunks' outputs with one on-device concat + one fetch, adding
    # M-1 frames of delivery latency; the LM still decodes per 46.44 ms frame.
    chunk_count = n_warm + 2

    def run_mode(M, n_bench):
        nonlocal chunk_count
        group, lats = [], []
        t_start = time.perf_counter()
        for i in range(n_bench):
            t0 = time.perf_counter()
            wav = sess.process_chunk_async(
                src_wav[(chunk_count % 60) * spf : (chunk_count % 60 + 1) * spf])
            chunk_count += 1
            group.append((t0, wav))
            if len(group) == M:
                np.asarray(cat([w for _, w in group]) if M > 1 else group[0][1])
                lats.extend(time.perf_counter() - t for t, _ in group)
                group = []
        if group:
            np.asarray(cat([w for _, w in group]) if len(group) > 1 else group[0][1])
            lats.extend(time.perf_counter() - t for t, _ in group)
        wall = time.perf_counter() - t_start
        return wall / n_bench, float(np.median(lats))

    # refill boundaries are fair game now: the fast refill (stashed-prompt +
    # history prefill, streaming.py) is pre-compiled above, so a crossing
    # costs one extra small dispatch instead of a giant prefill compile
    results = {}
    plan = [(1, 32), (8, 96), (16, 96), (4, 64), (1, 32), (8, 96)]
    for M, n in plan:
        if budget_left() < 45:
            log(f"deadline near ({budget_left():.0f}s left) — stopping refinement")
            break
        period, lat = run_mode(M, n)
        if M not in results or period < results[M][0]:
            results[M] = (period, lat)
        update_best(results)
        log(f"fetch group M={M}: period={period*1e3:.2f}ms "
            f"RTF={period/FRAME_SECONDS:.3f} p50 delivery latency={lat*1e3:.1f}ms")

    # ---- phase 5b: pipelined RealtimeEngine (the live headline) -------------
    # Dispatch thread + fetcher thread over SPSC rings (runtime/realtime.py):
    # per-chunk host fetches overlap the next dispatches, so the sustained
    # period is dispatch-bound while every chunk is still delivered
    # individually (true live operation, robust to relay fetch cost — unlike
    # the grouped M modes whose latency grows with M).
    #
    # COMPOSITE claim (VERDICT r4 next #2): the whole phase runs with
    # max_seq_frames=128 so both the flat-out and the paced windows cross
    # several prompt-refill boundaries with background refill ON (its extra
    # per-chunk shadow dispatch is therefore INCLUDED in every number), and
    # the paced delivery is judged against an explicitly stated latency
    # budget (below) rather than a bare xrun count.
    #
    # Delivered-latency budget (reference analogue real-time-gui.py:1285-1287
    # displays stream latency + block + inference): a player with a J-frame
    # jitter buffer underruns iff delivery latency exceeds J frame periods.
    # We state J=2 (92.88 ms delivery budget) and report end-to-end
    # mouth-to-ear latency = 1 block frame + algorithmic delay + jitter
    # buffer explicitly in the JSON.
    JITTER_FRAMES = 2
    DELIVERY_BUDGET_S = JITTER_FRAMES * FRAME_SECONDS
    pipelined = None
    if budget_left() > 180:
        from streamvoiceanon_tpu.runtime.realtime import RealtimeEngine

        saved_scfg_5b = sess.scfg
        sess.scfg = _rep(sess.scfg, max_seq_frames=128)
        eng = RealtimeEngine(sess, ring_seconds=8.0)
        eng.start()
        try:
            def feed(i):
                eng.push_input(src_wav[(i % 60) * spf : (i % 60 + 1) * spf])

            # flat-out: push everything, wait for drain -> sustained period
            N_FLAT = 128
            base = eng.chunks_processed
            refills_flat0 = sess.refill_count
            t0 = time.perf_counter()
            for i in range(N_FLAT):
                feed(i)
            deadline = t0 + min(60.0, max(10.0, budget_left() - 120))
            while (eng.chunks_processed - base < N_FLAT
                   and time.perf_counter() < deadline):
                time.sleep(0.005)
            done = eng.chunks_processed - base
            flat_period = (time.perf_counter() - t0) / max(done, 1)
            refills_flat = sess.refill_count - refills_flat0
            log(f"pipelined flat-out: {done}/{N_FLAT} chunks, "
                f"period={flat_period*1e3:.2f}ms "
                f"RTF={flat_period/FRAME_SECONDS:.3f} "
                f"({refills_flat} refill boundaries crossed)")

            # paced at the frame rate: per-chunk delivery latency vs the
            # stated budget.  The paced log aligns entry i with push i, so
            # leftover flat-out chunks must fully drain first — skip the
            # paced phase rather than misattribute them.
            lats = []
            N_PACED = 96
            refills_paced = 0
            if done < N_FLAT:
                log(f"flat-out drain incomplete ({done}/{N_FLAT}) — "
                    f"skipping the paced measurement")
            else:
                eng.latency_log.clear()
                refills_paced0 = sess.refill_count
                push_times = []
                next_t = time.perf_counter()
                for i in range(N_PACED):
                    now = time.perf_counter()
                    if now < next_t:
                        time.sleep(next_t - now)
                    push_times.append(time.perf_counter())
                    feed(i)
                    next_t += FRAME_SECONDS
                deadline = time.perf_counter() + 10.0
                while (len(eng.latency_log) < N_PACED
                       and time.perf_counter() < deadline):
                    time.sleep(0.005)
                lats = [t1 - push_times[i]
                        for i, (_, t1) in enumerate(eng.latency_log)]
                refills_paced = sess.refill_count - refills_paced0
            if len(lats) >= N_PACED // 2:
                p50 = float(np.percentile(lats, 50))
                p99 = float(np.percentile(lats, 99))
                xruns = int(sum(l > DELIVERY_BUDGET_S for l in lats))
                xruns += N_PACED - len(lats)
                pipelined = {"period_s": flat_period, "p50_latency_s": p50}
                delay_frames = sess.delay
                add_section("pipelined", {
                    "period_ms": round(flat_period * 1e3, 3),
                    "rtf": round(flat_period / FRAME_SECONDS, 4),
                    "paced_p50_latency_ms": round(p50 * 1e3, 1),
                    "paced_p99_latency_ms": round(p99 * 1e3, 1),
                    "paced_xruns": xruns,
                    "paced_chunks": N_PACED,
                    "refills_crossed_flat": int(refills_flat),
                    "refills_crossed_paced": int(refills_paced),
                    "max_seq_frames": 128,
                    "latency_budget": {
                        "jitter_buffer_frames": JITTER_FRAMES,
                        "delivery_budget_ms": round(DELIVERY_BUDGET_S * 1e3, 1),
                        "p99_within_budget": bool(p99 <= DELIVERY_BUDGET_S),
                        "block_ms": round(FRAME_SECONDS * 1e3, 1),
                        "algorithmic_delay_ms": round(
                            delay_frames * FRAME_SECONDS * 1e3, 1),
                        "end_to_end_ms": round(
                            (1 + delay_frames + JITTER_FRAMES)
                            * FRAME_SECONDS * 1e3, 1),
                    },
                    "max_fetch_batch": int(eng.max_fetch_batch),
                    "mode": ("dispatch + fetch threads over SPSC rings "
                             "(runtime/realtime.py), fed at the 46.44ms "
                             "frame rate; adaptive batched fetch; "
                             "max_seq_frames=128 with background refill ON "
                             "so the run crosses prompt-refill boundaries"),
                })
                update_best(results, None, pipelined)
                log(f"pipelined paced: p50={p50*1e3:.1f}ms p99={p99*1e3:.1f}ms "
                    f"xruns={xruns}/{N_PACED} (budget "
                    f"{DELIVERY_BUDGET_S*1e3:.0f}ms) refills={refills_paced}")
            else:
                log(f"pipelined run incomplete (flat {done}/{N_FLAT}, "
                    f"paced {len(lats)}/{N_PACED}) — discarding")
        except Exception as e:  # noqa: BLE001
            log(f"pipelined phase failed ({type(e).__name__}: {e})")
        finally:
            eng.stop()
            sess.scfg = saved_scfg_5b

    # ---- phase 5m: batched multi-stream live serving (TPU economics) -------
    # N concurrent live streams through ONE batched session
    # (StreamSession.fanout + MultiStreamEngine): every per-chunk program
    # amortizes the serial-latency-bound stages (8-step fast loop, vocoder
    # conv chain — docs/KERNELS.md) across the batch.  The reference serves
    # exactly ONE stream per GPU (real-time-gui.py:1316-1359).  Composite
    # discipline as 5b: max_seq_frames=128 + background refill, per-tick
    # delivery judged against the same stated budget.
    if budget_left() > 240:
        from streamvoiceanon_tpu.runtime.realtime import MultiStreamEngine

        ms_all = {}
        for B in (16, 32, 8):
            if budget_left() < (200 if not ms_all else 150):
                log(f"deadline near — stopping multistream sweep at {list(ms_all)}")
                break
            try:
                import copy as _copy

                t0 = time.time()
                # serving geometry: the msf=128 operating point never moves
                # the LM position past ~260 rows, while the reference-geometry
                # cache (2048 rows) is read IN FULL every frame by EVERY
                # stream — right-size it (StreamSession.with_cache_rows) so
                # per-stream state traffic drops 2048/384 = 5.3x; weights
                # amortize across the batch, state does not.
                CACHE_ROWS = 384
                s1 = _copy.copy(sess)
                s1.scfg = _rep(sess.scfg, max_seq_frames=128)
                if s1._lm_pos_host + 2 * 32 + 8 > CACHE_ROWS:
                    s1._refill_incremental()  # bring the position back down
                s1 = s1.with_cache_rows(CACHE_ROWS)
                sess_b = s1.fanout(B)
                cfg_b, cv_b = sess_b.cfg, sess_b.cv
                jax.block_until_ready(sess_b.fstate.lm.decode.k_cache)
                log(f"multistream B={B}: fanout+cache-rows {time.time()-t0:.1f}s")
                t0 = time.time()
                fsb = sess_b.fstate
                chunk_b = jax.device_put(
                    jnp.zeros((B, spf), jnp.float32), tpu_dev)
                toks_b = jax.device_put(jnp.zeros((B, 1), jnp.int32), tpu_dev)
                jobs = [
                    lambda: _encode_inc.lower(
                        cv_b.tokenizer_params, cfg_b, fsb.tok,
                        fsb.tok_ring, chunk_b, sess_b._mel_consts).compile(),
                    lambda: _decode_vocode_inc.lower(
                        cv_b.arvc_params, cv_b.vocoder_params, cfg_b,
                        fsb.lm, fsb.code_ring, fsb.voc, toks_b,
                        sess_b.sampling, sess_b.key).compile(),
                ]
                errs, ths = [], []
                for job in jobs:
                    def run(job=job):
                        try:
                            job()
                        except Exception as e:  # noqa: BLE001
                            errs.append(e)
                    th = threading.Thread(target=run, daemon=True)
                    th.start()
                    ths.append(th)
                for th in ths:
                    th.join()
                if errs:
                    raise errs[0]
                log(f"multistream B={B}: AOT compiles {time.time()-t0:.1f}s")
                t0 = time.time()
                try:
                    sess_b.warm_refill_programs()
                except Exception as e:  # noqa: BLE001
                    log(f"B={B} refill warm failed ({e}) — boundaries may "
                        f"pay a compile")
                # slack=3 frames: the single bench feeder thread pushes all B
                # streams in a loop; a transient feeder stall must not fire a
                # silence-padded tick that would misalign the latency log
                eng = MultiStreamEngine(sess_b, ring_seconds=8.0, slack=3.0)
                eng.warm_up()
                log(f"multistream B={B}: warm-up {time.time()-t0:.1f}s")

                eng.start()
                try:
                    def feed_all(i):
                        blk = src_wav[(i % 60) * spf : (i % 60 + 1) * spf]
                        for s in range(B):
                            eng.push_input(s, blk)

                    # flat-out capacity
                    N_FLAT = 48
                    base = eng.ticks_processed
                    t0 = time.perf_counter()
                    for i in range(N_FLAT):
                        feed_all(i)
                    deadline = t0 + min(45.0, max(10.0, budget_left() - 90))
                    while (eng.ticks_processed - base < N_FLAT
                           and time.perf_counter() < deadline):
                        time.sleep(0.005)
                    done = eng.ticks_processed - base
                    period = (time.perf_counter() - t0) / max(done, 1)
                    cap_audio = B * FRAME_SECONDS / period
                    log(f"multistream B={B} flat-out: {done}/{N_FLAT} ticks, "
                        f"period={period*1e3:.2f}ms -> {cap_audio:.1f} "
                        f"audio-s/s capacity")

                    # paced at the frame rate: per-tick delivery latency
                    lats = []
                    N_PACED = 96
                    refills0 = sess_b.refill_count
                    if done == N_FLAT:
                        eng.latency_log.clear()
                        push_times = []
                        next_t = time.perf_counter()
                        for i in range(N_PACED):
                            now = time.perf_counter()
                            if now < next_t:
                                time.sleep(next_t - now)
                            push_times.append(time.perf_counter())
                            feed_all(i)
                            next_t += FRAME_SECONDS
                        deadline = time.perf_counter() + 10.0
                        while (len(eng.latency_log) < N_PACED
                               and time.perf_counter() < deadline):
                            time.sleep(0.005)
                        lats = [t1 - push_times[i]
                                for i, (_, t1) in enumerate(eng.latency_log)
                                if i < len(push_times)]
                finally:
                    eng.stop()
                # device capacity at batch B: K ticks chained in ONE lax.scan
                # dispatch (inputs pre-uploaded, null dispatch+fetch
                # subtracted) — the audio-s/s/chip a local-PJRT deployment of
                # this batch size sustains, net of the relay transport that
                # dominates the engine numbers above
                dev_cap = None
                if budget_left() > 150:
                    try:
                        K_MS = 48

                        def scan_ticks(tok_p, arvc_p, voc_p, fstate, chunks,
                                       key):
                            def body(carry, chunk):
                                fs2, kk = carry
                                ts, rg, toks = _encode_inc(
                                    tok_p, cfg_b, fs2.tok, fs2.tok_ring,
                                    chunk, sess_b._mel_consts)
                                kk, sub = jax.random.split(kk)
                                lm, cr, vc, wav, _k = _decode_vocode_inc(
                                    arvc_p, voc_p, cfg_b, fs2.lm,
                                    fs2.code_ring, fs2.voc, toks,
                                    sess_b.sampling, sub)
                                fs2 = fs2._replace(tok=ts, tok_ring=rg, lm=lm,
                                                   code_ring=cr, voc=vc)
                                return (fs2, kk), wav[:, :8]

                            (_, _), wavs = jax.lax.scan(
                                body, (fstate, key), chunks)
                            return wavs

                        ms_scan = scoped_vmem_jit(scan_ticks)
                        chunks_ms = jax.device_put(jnp.asarray(
                            rng.standard_normal((K_MS, B, spf)) * 0.1,
                            jnp.float32), tpu_dev)
                        argsb = (cv_b.tokenizer_params, cv_b.arvc_params,
                                 cv_b.vocoder_params, sess_b.fstate,
                                 chunks_ms, jax.random.PRNGKey(13))
                        t0 = time.time()
                        np.asarray(ms_scan(*argsb))
                        log(f"multistream B={B} device scan: compile+first "
                            f"{time.time()-t0:.1f}s")
                        nullb = jax.jit(lambda xs: jnp.sum(xs) * 1.0)
                        np.asarray(nullb(chunks_ms))
                        fl, nl = [], []
                        for _ in range(3):
                            t0 = time.perf_counter()
                            np.asarray(ms_scan(*argsb))
                            fl.append((time.perf_counter() - t0) / K_MS)
                            t0 = time.perf_counter()
                            np.asarray(nullb(chunks_ms))
                            nl.append((time.perf_counter() - t0) / K_MS)
                        tick_s = max(float(np.median(np.asarray(fl))
                                           - np.median(np.asarray(nl))),
                                     1e-6)
                        dev_cap = {
                            "tick_compute_ms": round(tick_s * 1e3, 3),
                            "audio_s_per_s": round(
                                B * FRAME_SECONDS / tick_s, 1),
                            "n": 3,
                            "method": (f"lax.scan x{K_MS} at batch {B}, one "
                                       f"dispatch; null subtracted"),
                        }
                        log(f"multistream B={B} device capacity: "
                            f"{tick_s*1e3:.2f} ms/tick = "
                            f"{B*FRAME_SECONDS/tick_s:.0f} audio-s/s")
                        del chunks_ms
                    except Exception as e:  # noqa: BLE001
                        log(f"B={B} device scan failed "
                            f"({type(e).__name__}: {str(e)[:160]})")
                if len(lats) >= N_PACED // 2:
                    p50 = float(np.percentile(lats, 50))
                    p99 = float(np.percentile(lats, 99))
                    xr = int(sum(l > DELIVERY_BUDGET_S for l in lats))
                    xr += max(0, N_PACED - len(lats))
                    ms_all[B] = {
                        "streams": B,
                        "flat_period_ms": round(period * 1e3, 2),
                        "audio_s_per_s": round(cap_audio, 1),
                        "device_capacity": dev_cap,
                        "paced_p50_latency_ms": round(p50 * 1e3, 1),
                        "paced_p99_latency_ms": round(p99 * 1e3, 1),
                        "paced_xruns": xr,
                        "paced_chunks": N_PACED,
                        "p50_within_frame_budget": bool(p50 <= FRAME_SECONDS),
                        "p99_within_delivery_budget": bool(
                            p99 <= DELIVERY_BUDGET_S),
                        "refills_crossed_paced": int(
                            sess_b.refill_count - refills0),
                        "missed_chunks": int(sum(eng.missed)),
                        "max_fetch_batch": int(eng.max_fetch_batch),
                    }
                    log(f"multistream B={B} paced: p50={p50*1e3:.1f}ms "
                        f"p99={p99*1e3:.1f}ms xruns={xr}/{N_PACED} "
                        f"refills={ms_all[B]['refills_crossed_paced']}")
                elif dev_cap is not None or done == N_FLAT:
                    # paced run incomplete (degraded relay) — keep the
                    # capacity evidence with paced fields marked absent
                    ms_all[B] = {
                        "streams": B,
                        "flat_period_ms": round(period * 1e3, 2),
                        "audio_s_per_s": round(cap_audio, 1),
                        "device_capacity": dev_cap,
                        "paced_p50_latency_ms": None,
                        "paced_p99_latency_ms": None,
                        "paced_xruns": None,
                        "paced_chunks": 0,
                        "p50_within_frame_budget": False,
                        "p99_within_delivery_budget": False,
                        "refills_crossed_paced": None,
                        "missed_chunks": int(sum(eng.missed)),
                        "max_fetch_batch": int(eng.max_fetch_batch),
                    }
                    log(f"multistream B={B}: paced incomplete "
                        f"(flat {done}/{N_FLAT}, paced {len(lats)}) — "
                        f"capacity-only entry")
                else:
                    log(f"multistream B={B}: incomplete "
                        f"(flat {done}/{N_FLAT}, paced {len(lats)}) — skipped")
                del sess_b, eng
            except Exception as e:  # noqa: BLE001
                log(f"multistream B={B} failed ({type(e).__name__}: "
                    f"{str(e)[:200]})")
                # drop the failed batch's device state before the next B —
                # a lingering B=32 cache after RESOURCE_EXHAUSTED poisons
                # every later allocation (r5c postmortem)
                sess_b = eng = s1 = None  # noqa: F841
                import gc
                gc.collect()
        if ms_all:
            # headline = best capacity among B whose paced p50 fits the
            # 46.44 ms frame budget (every stream live)
            fit = [v for v in ms_all.values() if v["p50_within_frame_budget"]]
            best = max(fit or list(ms_all.values()),
                       key=lambda v: v["audio_s_per_s"])
            caps = [v for v in ms_all.values()
                    if v.get("device_capacity")]
            best_cap = (max(caps, key=lambda v:
                            v["device_capacity"]["audio_s_per_s"])
                        if caps else None)
            add_section("multistream", {
                "best": best,
                "best_device_capacity": (
                    None if best_cap is None else {
                        "streams": best_cap["streams"],
                        **best_cap["device_capacity"]}),
                "per_streams": {str(k): v for k, v in sorted(ms_all.items())},
                "latency_budget_ms": round(DELIVERY_BUDGET_S * 1e3, 1),
                "mode": ("B live streams through ONE batched session "
                         "(StreamSession.fanout -> MultiStreamEngine: "
                         "per-stream SPSC rings, batched dispatch, ordered "
                         "adaptive batched fetch); shared reference speaker "
                         "(state tiled on-device), distinct per-stream "
                         "source audio; per-stream references cost identical "
                         "compute (tests/test_multistream.py); "
                         "max_seq_frames=128 + background refill ON; LM KV "
                         "cache right-sized to 384 rows for this serving "
                         "point (with_cache_rows — per-stream state traffic "
                         "/5.3, exact continuation tested)"),
            })
            with _best_lock:
                if _best is not None:
                    _best["unit"] += (
                        f"; multistream: {best['audio_s_per_s']} audio-s/s "
                        f"at B={best['streams']} (p50 "
                        f"{best['paced_p50_latency_ms']}ms)")

    # ---- phase 5c: refill-inclusive per-chunk percentiles --------------------
    # Shrink max_seq_frames so the measured window crosses several refill
    # boundaries (the refill cadence is deterministic; at the default 768 a
    # real unbounded stream refills every ~35.7 s — VERDICT r3 weak #1) and
    # report p50/p99/max chunk period INCLUDING the refill chunks.
    if budget_left() > 120:
        try:
            saved_scfg = sess.scfg
            sess.scfg = _rep(sess.scfg, max_seq_frames=128)
            N_REF = 96
            periods, refill_idx = [], []
            for i in range(N_REF):
                pos_before = sess._lm_pos_host
                t0 = time.perf_counter()
                np.asarray(sess.process_chunk_async(
                    src_wav[(i % 60) * spf : (i % 60 + 1) * spf]))
                periods.append(time.perf_counter() - t0)
                if sess._lm_pos_host < pos_before:
                    refill_idx.append(i)
            sess.scfg = saved_scfg
            pr = np.asarray(periods)
            ref_p = pr[refill_idx] if refill_idx else np.asarray([])
            add_section("refill", {
                "n_chunks": N_REF,
                "n_refills": len(refill_idx),
                "p50_ms": round(float(np.percentile(pr, 50)) * 1e3, 2),
                "p99_ms": round(float(np.percentile(pr, 99)) * 1e3, 2),
                "max_ms": round(float(pr.max()) * 1e3, 2),
                "refill_chunk_mean_ms": (
                    round(float(ref_p.mean()) * 1e3, 2) if len(ref_p) else None),
                "refill_chunk_max_ms": (
                    round(float(ref_p.max()) * 1e3, 2) if len(ref_p) else None),
                "mode": ("per-chunk sync fetch, max_seq_frames=128 so the "
                         "window crosses refill boundaries; fast refill "
                         "(stashed-prompt history prefill) pre-compiled"),
            })
            log(f"refill-inclusive: {len(refill_idx)} refills in {N_REF} "
                f"chunks, p50={np.percentile(pr,50)*1e3:.1f}ms "
                f"p99={np.percentile(pr,99)*1e3:.1f}ms "
                f"max={pr.max()*1e3:.1f}ms")
        except Exception as e:  # noqa: BLE001
            log(f"refill phase failed ({type(e).__name__}: {e})")

    # ---- phase 5d: scan-dispatch streaming groups ---------------------------
    # One lax.scan program dispatch + one fetch per G chunks: the stream is
    # processed in G-chunk groups with the session state carried across
    # groups (genuine continuous streaming at G x 46.44 ms group latency).
    # Strips the relay's ~3 ms per-program dispatch cost that the per-chunk
    # M modes pay, at the price of added group latency — the same trade the
    # reference's extra_frames/delay buffering makes (infer_arvc.py:443-470).
    scan_results = {}
    if budget_left() > 240:
        try:
            def scan_group(tok_p, arvc_p, voc_p, fstate, chunks, key):
                def body(carry, chunk):
                    fs, kk = carry
                    tstate, ring, toks = _encode_inc(
                        tok_p, cfg_tpu, fs.tok, fs.tok_ring, chunk,
                        sess._mel_consts)
                    kk, sub = jax.random.split(kk)
                    lm, cring, voc, wav, _k = _decode_vocode_inc(
                        arvc_p, voc_p, cfg_tpu, fs.lm, fs.code_ring, fs.voc,
                        toks, sess.sampling, sub)
                    fs = fs._replace(tok=tstate, tok_ring=ring, lm=lm,
                                     code_ring=cring, voc=voc)
                    return (fs, kk), wav

                (fs2, _), wavs = jax.lax.scan(body, (fstate, key), chunks)
                return fs2, wavs

            group_jit = scoped_vmem_jit(scan_group)
            pp = (cv_tpu.tokenizer_params, cv_tpu.arvc_params,
                  cv_tpu.vocoder_params)
            # G sweep: each step amortizes the fixed ~23-26 ms per-group
            # dispatch+fetch over more chunks (period -> the device floor as
            # G grows) at the cost of G x 46.44 ms of group latency — the
            # JSON reports both, update_best keeps the latency-fit M-mode as
            # the separate realtime_* headline.
            for G in (16, 64):
                if budget_left() < 180:
                    break
                groups_dev = [
                    jax.device_put(jnp.asarray(
                        rng.standard_normal((G, 1, spf)) * 0.1, jnp.float32),
                        tpu_dev)
                    for _ in range(4)
                ]
                t0 = time.time()
                fs_c, wavs = group_jit(*pp, sess.fstate, groups_dev[0],
                                       jax.random.PRNGKey(11))
                np.asarray(wavs)
                log(f"scan-group x{G}: compile+first run {time.time()-t0:.1f}s")
                best_p = float("inf")
                for _pass in range(2):
                    if budget_left() < 60:
                        break
                    fs_c = sess.fstate
                    t0 = time.perf_counter()
                    for g, chunks_g in enumerate(groups_dev):
                        fs_c, wavs = group_jit(
                            *pp, fs_c, chunks_g, jax.random.fold_in(
                                jax.random.PRNGKey(11), g))
                        np.asarray(wavs)  # deliver the group
                    wall = time.perf_counter() - t0
                    best_p = min(best_p, wall / (len(groups_dev) * G))
                group_lat = best_p * G + (G - 1) * FRAME_SECONDS
                scan_results[G] = (best_p, group_lat)
                update_best(results, scan_results, pipelined)
                log(f"scan group G={G}: period={best_p*1e3:.2f}ms "
                    f"RTF={best_p/FRAME_SECONDS:.3f} group latency="
                    f"{group_lat*1e3:.0f}ms")
        except Exception as e:  # noqa: BLE001
            log(f"scan-group phase failed ({type(e).__name__}: {e}) — "
                f"keeping M-mode result")

    # ---- phase 6: device-bound floor (relay-free evidence) -----------------
    # K chunks chained inside ONE jitted lax.scan: a single dispatch + fetch
    # amortized over K chunks strips the relay's per-program and per-fetch
    # costs, recording the on-device per-chunk time — the RTF a local-PJRT
    # deployment of this exact pipeline would sustain.
    if budget_left() > 150:
        try:
            K = 96  # big enough that the fixed ~26 ms relay fetch adds <0.3 ms/chunk

            def scan_chunks(tok_p, arvc_p, voc_p, fstate, chunks, key):
                def body(carry, chunk):
                    fs, kk = carry
                    tstate, ring, toks = _encode_inc(
                        tok_p, cfg_tpu, fs.tok, fs.tok_ring, chunk,
                        sess._mel_consts)
                    kk, sub = jax.random.split(kk)
                    lm, cring, voc, wav, _k = _decode_vocode_inc(
                        arvc_p, voc_p, cfg_tpu, fs.lm, fs.code_ring, fs.voc,
                        toks, sess.sampling, sub)
                    fs = fs._replace(tok=tstate, tok_ring=ring, lm=lm,
                                     code_ring=cring, voc=voc)
                    return (fs, kk), wav

                (_, _), wavs = jax.lax.scan(body, (fstate, key), chunks)
                return wavs

            scan_jit = scoped_vmem_jit(scan_chunks)
            chunks_dev = jax.device_put(
                jnp.asarray(rng.standard_normal((K, 1, spf)) * 0.1,
                            jnp.float32), tpu_dev)
            args = (cv_tpu.tokenizer_params, cv_tpu.arvc_params,
                    cv_tpu.vocoder_params, sess.fstate, chunks_dev,
                    jax.random.PRNGKey(9))
            t0 = time.time()
            np.asarray(scan_jit(*args))
            log(f"device-floor scan x{K}: compile+first run {time.time()-t0:.1f}s")
            # null job: same dispatch+fetch pattern with ~zero device work —
            # subtracting it isolates pure on-device compute per chunk
            null_jit = jax.jit(lambda xs: jnp.sum(xs) * 1.0)
            np.asarray(null_jit(chunks_dev))
            # repeat-and-spread protocol (VERDICT r4 next #5): N paired
            # passes; report median + spread so cross-session deltas can be
            # judged against measurement noise instead of single shots
            floors, nulls = [], []
            N_FLOOR = 6
            for _ in range(N_FLOOR):
                if budget_left() < 45:
                    break
                t0 = time.perf_counter()
                np.asarray(scan_jit(*args))
                floors.append((time.perf_counter() - t0) / K)
                t0 = time.perf_counter()
                np.asarray(null_jit(chunks_dev))
                nulls.append((time.perf_counter() - t0) / K)
            floors_a, nulls_a = np.asarray(floors), np.asarray(nulls)
            floor = float(np.median(floors_a))
            null = float(np.median(nulls_a))
            computes = np.maximum(floors_a - nulls_a, 0.0)
            compute = float(np.median(computes))
            # static roofline model for the composite per-chunk program:
            # achieved HBM bandwidth = modeled moved-bytes / measured compute
            roofline = None
            try:
                from streamvoiceanon_tpu.utils.roofline import (
                    chunk_roofline, device_peaks,
                )
                roofline = chunk_roofline(
                    cfg_tpu, cv_tpu.tokenizer_params, cv_tpu.arvc_params,
                    cv_tpu.vocoder_params, fstate=sess.fstate,
                    compute_s=compute, peaks=device_peaks(tpu_dev),
                )
            except Exception as e:  # noqa: BLE001
                log(f"roofline model failed ({type(e).__name__}: {e})")
            add_section("device_floor", {
                "ms_per_chunk": round(floor * 1e3, 3),
                "rtf": round(floor / FRAME_SECONDS, 4),
                "pure_compute_ms": round(compute * 1e3, 3),
                "n": int(len(floors)),
                "ms_per_chunk_spread": [
                    round(float(floors_a.min()) * 1e3, 3),
                    round(float(floors_a.max()) * 1e3, 3)],
                "pure_compute_ms_spread": [
                    round(float(computes.min()) * 1e3, 3),
                    round(float(computes.max()) * 1e3, 3)],
                "method": (f"lax.scan x{K}, one dispatch+fetch; null-"
                           f"program dispatch+fetch subtracted; median of "
                           f"{len(floors)} paired passes, spread=[min,max]"),
            })
            if roofline is not None:
                add_section("roofline", roofline)
            with _best_lock:
                if _best is not None:
                    _best["unit"] += (
                        f"; device floor {floor*1e3:.2f} ms/chunk = RTF "
                        f"{floor/FRAME_SECONDS:.3f} ({compute*1e3:.2f} ms pure "
                        f"device compute)")
            log(f"device floor: {floor*1e3:.2f} ms/chunk "
                f"RTF={floor/FRAME_SECONDS:.3f} "
                f"(pure compute {compute*1e3:.2f} ms)")
            if roofline is not None:
                log(f"roofline: {json.dumps(roofline)}")
        except Exception as e:  # noqa: BLE001
            log(f"device-floor phase failed ({type(e).__name__}: {e}) — "
                f"keeping M-mode result")

    # ---- phase 6b: device floor at the SERVING geometry ---------------------
    # Same scan, but with the LM KV cache right-sized to the msf=128
    # operating point (StreamSession.with_cache_rows, 384 rows): the decode
    # step reads the whole cache every frame, so the default-geometry floor
    # above carries 5.3x more lm_slow state traffic than this serving point
    # needs.  Kept as a separate row — the phase-6 number stays comparable
    # across rounds.
    if budget_left() > 240:
        try:
            import copy as _copy2

            s1 = _copy2.copy(sess)
            s1.scfg = _rep(sess.scfg, max_seq_frames=128)
            if s1._lm_pos_host + 2 * 32 + 8 > 384:
                s1._refill_incremental()
            s1 = s1.with_cache_rows(384)
            cfg_s, cv_s = s1.cfg, s1.cv
            K2 = 96

            def scan_small(tok_p, arvc_p, voc_p, fstate, chunks, key):
                def body(carry, chunk):
                    fs2, kk = carry
                    ts, rg, toks = _encode_inc(
                        tok_p, cfg_s, fs2.tok, fs2.tok_ring, chunk,
                        s1._mel_consts)
                    kk, sub = jax.random.split(kk)
                    lm, cr, vc, wav, _k = _decode_vocode_inc(
                        arvc_p, voc_p, cfg_s, fs2.lm, fs2.code_ring,
                        fs2.voc, toks, s1.sampling, sub)
                    fs2 = fs2._replace(tok=ts, tok_ring=rg, lm=lm,
                                       code_ring=cr, voc=vc)
                    return (fs2, kk), wav[:, :8]
                (_, _), wavs = jax.lax.scan(body, (fstate, key), chunks)
                return wavs

            small_jit = scoped_vmem_jit(scan_small)
            chunks2 = jax.device_put(jnp.asarray(
                rng.standard_normal((K2, 1, spf)) * 0.1, jnp.float32),
                tpu_dev)
            args2 = (cv_s.tokenizer_params, cv_s.arvc_params,
                     cv_s.vocoder_params, s1.fstate, chunks2,
                     jax.random.PRNGKey(17))
            t0 = time.time()
            np.asarray(small_jit(*args2))
            log(f"serving-geometry scan x{K2}: compile+first "
                f"{time.time()-t0:.1f}s")
            null2 = jax.jit(lambda xs: jnp.sum(xs) * 2.0)
            np.asarray(null2(chunks2))
            fl2, nl2 = [], []
            for _ in range(5):
                if budget_left() < 60:
                    break
                t0 = time.perf_counter()
                np.asarray(small_jit(*args2))
                fl2.append((time.perf_counter() - t0) / K2)
                t0 = time.perf_counter()
                np.asarray(null2(chunks2))
                nl2.append((time.perf_counter() - t0) / K2)
            if fl2:
                fl2a, nl2a = np.asarray(fl2), np.asarray(nl2)
                floor2 = float(np.median(fl2a))
                comp2 = float(np.median(np.maximum(fl2a - nl2a, 0.0)))
                add_section("device_floor_serving", {
                    "ms_per_chunk": round(floor2 * 1e3, 3),
                    "rtf": round(floor2 / FRAME_SECONDS, 4),
                    "pure_compute_ms": round(comp2 * 1e3, 3),
                    "n": len(fl2),
                    "ms_per_chunk_spread": [
                        round(float(fl2a.min()) * 1e3, 3),
                        round(float(fl2a.max()) * 1e3, 3)],
                    "cache_rows": 384,
                    "max_seq_frames": 128,
                    "method": ("same K-chunk scan as device_floor, LM KV "
                               "cache right-sized to the msf=128 serving "
                               "point (with_cache_rows; exact continuation "
                               "tested)"),
                })
                log(f"serving-geometry floor: {floor2*1e3:.2f} ms/chunk "
                    f"RTF={floor2/FRAME_SECONDS:.4f} "
                    f"(pure compute {comp2*1e3:.2f} ms)")
            del s1, chunks2, args2
        except Exception as e:  # noqa: BLE001
            log(f"serving-floor phase failed ({type(e).__name__}: "
                f"{str(e)[:200]})")

    # ---- phase 7: on-chip training step (VERDICT r4 next #4) ----------------
    # Full-geometry dual-AR train step (forward+backward+MuonAdamW) over a
    # synthetic frozen-feature batch — the reference's per-batch workload
    # (trainers/arvc_trainer.py:335-410) minus the frozen feature extractors.
    # Single chip here; the sharded mesh path is exercised by
    # __graft_entry__.dryrun_multichip.
    if budget_left() > 300:
        try:
            from streamvoiceanon_tpu.train import muon as muon_mod
            from streamvoiceanon_tpu.train.step import TrainState, train_step
            from streamvoiceanon_tpu.utils.roofline import device_peaks

            B_TR, T_TR, N_STEPS = 16, 256, 3
            d = cfg.arvc.decoder
            trng = np.random.default_rng(0)
            batch = jax.device_put({
                "content": jnp.asarray(
                    trng.integers(0, d.vocab_size, (B_TR, T_TR)), jnp.int32),
                "base_target": jnp.asarray(
                    trng.integers(0, d.vocab_size, (B_TR, T_TR)), jnp.int32),
                "target": jnp.asarray(
                    trng.integers(0, d.codebook_size,
                                  (B_TR, d.num_codebooks, T_TR)), jnp.int32),
                "x_lens": jnp.full((B_TR,), T_TR, jnp.int32),
                "style": jnp.asarray(
                    trng.standard_normal((B_TR, 192)), jnp.bfloat16),
                "timbre": jnp.asarray(
                    trng.standard_normal((B_TR, 32, 128)), jnp.bfloat16),
            }, tpu_dev)
            # fresh param copy: train_step donates its state — the serving
            # params must not be clobbered
            tr_params = jax.device_put(arvc_np, tpu_dev)
            opt = muon_mod.muon_adamw(lr=1e-4)
            st_tr = TrainState(tr_params, opt.init(tr_params),
                               jnp.zeros((), jnp.int32))
            # sync the relay cannot ack early: HOST-FETCH the loss and a
            # slice of an updated param leaf (both data-depend on the full
            # fwd+bwd+optimizer chain; block_until_ready on relay arrays
            # can return before the update materializes)
            def _tr_sync(st, aux):
                leaf = jax.tree.leaves(st.params)[0]
                return float(aux["loss"]), np.asarray(leaf.ravel()[:8])

            t0 = time.time()
            st_tr, aux = train_step(st_tr, batch, cfg.arvc, opt, 2)
            _tr_sync(st_tr, aux)
            compile_tr = time.time() - t0
            log(f"train-step compile+first: {compile_tr:.1f}s")
            # time K-step chains ending in a fetch: each step's input
            # depends on the previous update, so the chain cannot pipeline
            # past itself; per-step = total / K
            K_TR = 4
            times = []
            for _ in range(N_STEPS):
                if budget_left() < 60:
                    break
                t0 = time.perf_counter()
                for _ in range(K_TR):
                    st_tr, aux = train_step(st_tr, batch, cfg.arvc, opt, 2)
                _tr_sync(st_tr, aux)
                times.append((time.perf_counter() - t0) / K_TR)
            if times:
                step_s = float(np.median(times))
                n_p = int(sum(int(np.prod(x.shape))
                              for x in jax.tree.leaves(tr_params)))
                slow_p = sum(int(np.prod(x.shape))
                             for k, v in tr_params["model"].items()
                             if not k.startswith("fast_")
                             for x in jax.tree.leaves(v))
                fast_p = sum(int(np.prod(x.shape))
                             for k, v in tr_params["model"].items()
                             if k.startswith("fast_")
                             for x in jax.tree.leaves(v))
                flops = 6.0 * (slow_p * B_TR * (2 * T_TR + 37)
                               + fast_p * B_TR * T_TR
                               * (d.num_codebooks + 1))
                peaks = device_peaks(tpu_dev)
                mfu = (flops / step_s / peaks["bf16_flops"] * 100.0
                       if peaks else None)
                add_section("training", {
                    "batch": B_TR,
                    "frames": T_TR,
                    "step_ms": round(step_s * 1e3, 1),
                    "step_ms_spread": [round(min(times) * 1e3, 1),
                                       round(max(times) * 1e3, 1)],
                    "n_steps": len(times),
                    "protocol": "median of K-step chains, fetch-synced",
                    "frames_per_s": round(B_TR * T_TR / step_s, 0),
                    "audio_s_per_s": round(
                        B_TR * T_TR * FRAME_SECONDS / step_s, 1),
                    "mfu_pct": None if mfu is None else round(mfu, 1),
                    "optimizer": "muon_adamw",
                    "param_dtype": "bfloat16",
                    "n_params": n_p,
                    "compile_s": round(compile_tr, 1),
                    "loss": float(aux["loss"]),
                })
                log(f"train step: {step_s*1e3:.1f} ms (B={B_TR}, T={T_TR}) "
                    f"= {B_TR*T_TR/step_s:.0f} frames/s, MFU "
                    f"{mfu and round(mfu,1)}%")
            del st_tr, batch, tr_params
        except Exception as e:  # noqa: BLE001
            log(f"training phase failed ({type(e).__name__}: {str(e)[:200]})")

    _emit(0)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--prep-child":
        # no alarm: the parent owns the deadline and kills us if needed
        try:
            prep_child_main(sys.argv[2])
            os._exit(0)
        except Exception:  # noqa: BLE001
            import traceback
            traceback.print_exc(file=sys.stderr)
            os._exit(1)
    _arm_signals()
    _enable_compile_cache()
    try:
        main()
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc(file=sys.stderr)
        log(f"bench failed ({type(e).__name__}: {e}) — emitting best-so-far if any")
        _emit(0, fail_reason=f"{type(e).__name__}: {e}")
