"""Pallas TPU kernel: the whole streaming HiFiGAN head in ONE invocation.

Per 46.44 ms frame the vocoder head (models/hifigan.hifigan_apply_stream,
reference firefly.py:149-301) runs ~100 small causal convs: conv_pre, five
[transposed-conv upsample + 3 ResBlocks x 3 dilations x 2 convs] stages, and
conv_post.  The arithmetic is tiny (~1.3 GFLOP, ~30 us of MXU time) but as
~120 XLA ops the stage measures ~0.5 ms — per-op scheduling latency, the
same disease as the LM/tokenizer stacks (docs/KERNELS.md).

This kernel unrolls the ENTIRE head into one pallas_call (no grid — the
working set is small enough for VMEM):

* every causal dilated conv is ONE matmul: the (T, k*C) im2col block is
  built from k static slices of [tail; x] (lane-axis concat), against the
  conv weight reshaped (k*C, C) — tap-major packing matches the concat;
* every FishTransConv upsample (k = 2*stride in the deployed config) is TWO
  matmuls: out[t*s + p] = in[t] @ W[s+p] + in[t+1] @ W[p], phases packed
  into (C_in, s*C_out) so the (T, s*C_out) result reshapes row-major to
  (T*s, C_out);
* SiLU/tanh run in f32 on the VPU between matmuls;
* conv input tails live in PACKED per-stage buffers ((rows, C) slots at
  8-aligned offsets) — `HiFiGANConfig.use_pallas_stream` switches the
  streaming state to this `PackedHeadState` layout; `pack_head_state` /
  `unpack_head_state` convert to/from the dict-of-tails layout (used by the
  batched XLA fallback and by StreamSession.transfer migration);
* weights are re-packed once per params identity (id-cached, outside jit)
  into the matmul-ready shapes.

Scope: batch 1 (the live-stream hot path); batch > 1 unpacks to the dict
layout and runs the XLA op-by-op path.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from streamvoiceanon_tpu.ops.pallas_common import (  # shared kernel helpers
    NEG_INF as _NEG_INF,
    SMEM as _SMEM,
    VMEM as _MEM,
    dot as _dot,
    dotf as _dotf,
    pltpu,
    rms as _rms,
    splice_rows as _splice_rows,
)

from streamvoiceanon_tpu.config import HiFiGANConfig


def _pad8(n: int) -> int:
    return (n + 7) // 8 * 8


def _silu(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf / (1.0 + jnp.exp(-xf))).astype(x.dtype)


# ---------------------------------------------------------------------------
# Geometry: traversal order and packed-tail offsets
# ---------------------------------------------------------------------------


def _res_slots(cfg: HiFiGANConfig) -> List[Tuple[int, int, int, int]]:
    """Per-stage resblock conv slots in traversal order
    [(k, d, rows, offset), ...] — conv1 then conv2 per dilation, dilations
    inner, kernel sizes outer (models/hifigan.resblock_apply_stream)."""
    if any(tuple(d) != tuple(cfg.resblock_dilation_sizes[0])
           for d in cfg.resblock_dilation_sizes):
        raise NotImplementedError(
            "pallas hifigan head requires uniform resblock_dilation_sizes")
    slots = []
    off = 0
    for k in cfg.resblock_kernel_sizes:
        for d in cfg.resblock_dilation_sizes[0]:
            for _ in range(2):  # convs1[di], convs2[di]
                rows = (k - 1) * d
                slots.append((k, d, rows, off))
                off += _pad8(rows)
    return slots


def _res_rows(cfg: HiFiGANConfig) -> int:
    s = _res_slots(cfg)
    k, d, rows, off = s[-1]
    return off + _pad8(rows)


def _stage_channels(cfg: HiFiGANConfig) -> List[Tuple[int, int]]:
    """(C_in, C_out) per upsample stage."""
    out = []
    for i in range(len(cfg.upsample_rates)):
        out.append((cfg.upsample_initial_channel // (2 ** i),
                    cfg.upsample_initial_channel // (2 ** (i + 1))))
    return out


class PackedHeadState(NamedTuple):
    """Packed streaming state for the kernel path (B leading on every leaf)."""

    pre: jax.Array  # (B, pad8(k_pre-1), num_mels)
    ups: Tuple[jax.Array, ...]  # per stage (B, 8, C_in) — row 0 used
    res: Tuple[jax.Array, ...]  # per stage (B, RES_ROWS, C_out)
    post: jax.Array  # (B, pad8(k_post-1), C_last)


def init_packed_state(cfg: HiFiGANConfig, batch: int = 1,
                      dtype=jnp.float32) -> PackedHeadState:
    chans = _stage_channels(cfg)
    rows = _res_rows(cfg)
    return PackedHeadState(
        pre=jnp.zeros((batch, _pad8(cfg.pre_conv_kernel_size - 1), cfg.num_mels), dtype),
        ups=tuple(jnp.zeros((batch, 8, ci), dtype) for ci, _ in chans),
        res=tuple(jnp.zeros((batch, rows, co), dtype) for _, co in chans),
        post=jnp.zeros((batch, _pad8(cfg.post_conv_kernel_size - 1), chans[-1][1]), dtype),
    )


def pack_head_state(state: Dict, cfg: HiFiGANConfig) -> PackedHeadState:
    """dict-of-tails (models/hifigan.hifigan_init_stream layout) -> packed."""
    B = state["conv_pre"].tail.shape[0]
    dtype = state["conv_pre"].tail.dtype
    chans = _stage_channels(cfg)
    slots = _res_slots(cfg)
    rows_total = _res_rows(cfg)

    def pad_rows(t, target):
        return jnp.pad(t, ((0, 0), (0, target - t.shape[1]), (0, 0)))

    ups, res = [], []
    for i, (ci, co) in enumerate(chans):
        ups.append(pad_rows(state["ups"][i].tail, 8))
        buf = jnp.zeros((B, rows_total, co), dtype)
        si = iter(slots)
        for blk, rd in zip(state["res"][i], cfg.resblock_dilation_sizes):
            for di in range(len(rd)):
                for cs in (blk["convs1"][di], blk["convs2"][di]):
                    k, d, rows, off = next(si)
                    if rows:
                        buf = jax.lax.dynamic_update_slice(
                            buf, cs.tail.astype(dtype), (0, off, 0))
        res.append(buf)
    return PackedHeadState(
        pre=pad_rows(state["conv_pre"].tail, _pad8(cfg.pre_conv_kernel_size - 1)),
        ups=tuple(ups), res=tuple(res),
        post=pad_rows(state["conv_post"].tail, _pad8(cfg.post_conv_kernel_size - 1)),
    )


def unpack_head_state(packed: PackedHeadState, cfg: HiFiGANConfig) -> Dict:
    """packed -> dict-of-tails (ConvState/TransConvState leaves)."""
    from streamvoiceanon_tpu.ops.conv import ConvState, TransConvState

    chans = _stage_channels(cfg)
    slots = _res_slots(cfg)
    state: Dict = {
        "conv_pre": ConvState(packed.pre[:, : cfg.pre_conv_kernel_size - 1]),
        "ups": [], "res": [],
    }
    for i, (ci, co) in enumerate(chans):
        state["ups"].append(TransConvState(packed.ups[i][:, :1]))
        si = iter(slots)
        blocks = []
        for k, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            blk = {"convs1": [], "convs2": []}
            for di in range(len(rd)):
                for name in ("convs1", "convs2"):
                    kk, d, rows, off = next(si)
                    blk[name].append(ConvState(packed.res[i][:, off:off + rows]))
            blocks.append(blk)
        state["res"].append(blocks)
    state["conv_post"] = ConvState(packed.post[:, : cfg.post_conv_kernel_size - 1])
    return state


# ---------------------------------------------------------------------------
# Weight packing (id-cached, eager — one-time per params tree)
# ---------------------------------------------------------------------------

_WCACHE: Dict[int, Dict] = {}


def packed_weights(p: Dict, cfg: HiFiGANConfig) -> Dict:
    key = id(p)
    hit = _WCACHE.get(key)
    if hit is not None:
        return hit[1]

    def conv_w(cp):  # (k, Cin, Cout) -> (k*Cin, Cout), tap-major rows
        k, ci, co = cp["w"].shape
        return cp["w"].reshape(k * ci, co)

    stages = []
    for i, (s, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        up = p["ups"][i]
        if k != 2 * s:
            raise NotImplementedError("pallas hifigan head requires k == 2*stride")
        w = up["w"]  # (2s, Cin, Cout)
        wa = jnp.transpose(w[s:], (1, 0, 2)).reshape(w.shape[1], s * w.shape[2])
        wb = jnp.transpose(w[:s], (1, 0, 2)).reshape(w.shape[1], s * w.shape[2])
        rws, rbs = [], []
        for blk, rd in zip(p["resblocks"][i], cfg.resblock_dilation_sizes):
            for di in range(len(rd)):
                for cp in (blk["convs1"][di], blk["convs2"][di]):
                    rws.append(conv_w(cp))
                    rbs.append(cp["b"][None])
        stages.append({
            "wa": wa, "wb": wb, "ub": up["b"][None],
            "rw": jnp.concatenate(rws, axis=0),
            "rb": jnp.concatenate(rbs, axis=0),
        })
    out = {
        "pre_w": conv_w(p["conv_pre"]), "pre_b": p["conv_pre"]["b"][None],
        "stages": stages,
        "post_w": conv_w(p["conv_post"]), "post_b": p["conv_post"]["b"][None],
    }
    out = jax.tree.map(jnp.asarray, out)
    # pin the params object alongside the packed tree: the cache is keyed by
    # id(), and a garbage-collected dict's address can be reused by a
    # different model's params — keeping a strong reference prevents that
    _WCACHE[key] = (p, out)
    return out


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _make_kernel(cfg: HiFiGANConfig, T0: int):
    ks = cfg.resblock_kernel_sizes
    dils = cfg.resblock_dilation_sizes[0]
    rates = cfg.upsample_rates
    n_stage = len(rates)
    slots = _res_slots(cfg)
    k_pre = cfg.pre_conv_kernel_size
    k_post = cfg.post_conv_kernel_size

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        pre_w = next(it); pre_b = next(it); pre_tail = next(it)
        stage_refs = [
            tuple(next(it) for _ in range(7))  # wa wb ub up_tail rw rb res_tail
            for _ in range(n_stage)
        ]
        post_w = next(it); post_b = next(it); post_tail = next(it)
        wav_ref = next(it)
        pre_out = next(it)
        stage_outs = [tuple(next(it) for _ in range(2)) for _ in range(n_stage)]
        post_out = next(it)

        def conv(full, T, k, d, w_rows, b_row):
            # full: ((k-1)*d + T, C); k per-tap matmuls against row-slices of
            # the tap-major (k*C, Cout) weight.  The single-matmul im2col form
            # lane-concatenates shifted slices, which Mosaic cannot relayout
            # ("result/input offset mismatch on non-concat dimension").
            # f32 accumulate + f32 bias add, round once — ops/conv.conv1d
            C = full.shape[1]
            y = _dotf(full[0:T], w_rows[0:C])
            for j in range(1, k):
                y = y + _dotf(full[j * d: j * d + T],
                              w_rows[j * C: (j + 1) * C])
            y = y + b_row.astype(jnp.float32)
            return y.astype(full.dtype)

        # ---- conv_pre -----------------------------------------------------
        T = T0
        x = x_ref[...]  # (T0, num_mels)
        full = jnp.concatenate([pre_tail[: k_pre - 1], x], axis=0)
        pre_out[...] = jnp.concatenate(
            [full[T: T + k_pre - 1], pre_tail[k_pre - 1:]], axis=0)
        x = conv(full, T, k_pre, 1, pre_w[...], pre_b[...])

        # ---- stages ---------------------------------------------------------
        for i in range(n_stage):
            wa, wb, ub, up_tail, rw, rb, res_tail = stage_refs[i]
            up_out, res_out = stage_outs[i]
            s = rates[i]
            co = wa.shape[1] // s
            x = _silu(x)
            full = jnp.concatenate([up_tail[:1], x], axis=0)  # (T+1, Cin)
            up_out[...] = jnp.concatenate(
                [full[T: T + 1], up_tail[1:]], axis=0)
            y = _dotf(full[:T], wa[...]) + _dotf(full[1: T + 1], wb[...])
            # de-interleave the s phases packed in y's lanes: out[t*s + p] =
            # y[t, p*co:(p+1)*co].  Mosaic cannot shape-cast (T, s*co) ->
            # (T*s, co) ("infer-vector-layout: unsupported shape cast"), so
            # scatter rows with iota-generated one-hot matmuls instead — the
            # same trick as the encoder kernel's strided downsample, run in
            # reverse.  Masks are built in-registers; nothing extra in VMEM.
            Ts = T * s
            rsel = jax.lax.broadcasted_iota(jnp.int32, (Ts, T), 0)
            csel = jax.lax.broadcasted_iota(jnp.int32, (Ts, T), 1) * s
            acc = _dotf((rsel == csel).astype(jnp.float32), y[:, :co])
            for p in range(1, s):
                sel = (rsel == csel + p).astype(jnp.float32)
                acc = acc + _dotf(sel, y[:, p * co: (p + 1) * co])
            T = Ts
            # f32 bias add, round once — ops/conv.conv_transpose1d
            x = (acc + ub[...].astype(jnp.float32)).astype(x.dtype)

            si = 0
            woff = 0
            new_res = []
            branches = []
            xr_in = x
            for k in ks:
                xr = xr_in
                for d in dils:
                    h = xr
                    for _conv in range(2):
                        kk, dd, rows, off = slots[si]
                        h = _silu(h)
                        fullc = jnp.concatenate(
                            [res_tail[off: off + rows], h], axis=0)
                        new_res.append((off, rows, fullc[T: T + rows]))
                        h = conv(fullc, T, kk, dd, rw[woff: woff + kk * co],
                                 rb[si: si + 1])
                        woff += kk * co
                        si += 1
                    xr = xr + h
                branches.append(xr)
            acc = branches[0].astype(jnp.float32)
            for brn in branches[1:]:
                acc = acc + brn.astype(jnp.float32)
            x = (acc / float(len(branches))).astype(x.dtype)
            # write the packed new tail buffer (static-offset splice; Mosaic
            # has no dynamic_update_slice lowering)
            res_out[...] = _splice_rows(
                res_tail[...], [(off, t) for off, rows, t in new_res])

        # ---- conv_post + tanh ----------------------------------------------
        x = _silu(x)
        full = jnp.concatenate([post_tail[: k_post - 1], x], axis=0)
        post_out[...] = jnp.concatenate(
            [full[T: T + k_post - 1], post_tail[k_post - 1:]], axis=0)
        y = conv(full, T, k_post, 1, post_w[...], post_b[...])
        wav_ref[...] = jnp.tanh(y.astype(jnp.float32)).astype(wav_ref.dtype)


    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def head_stream_step(
    pw: Dict,  # packed_weights output
    state: PackedHeadState,  # B == 1
    x: jax.Array,  # (1, T0, num_mels)
    cfg: HiFiGANConfig,
    interpret: bool = False,
) -> Tuple[PackedHeadState, jax.Array]:
    """One streaming head step through the fused kernel.
    Returns (state', wav (1, T0 * prod(rates)))."""
    if pltpu is None:  # pragma: no cover
        raise RuntimeError("pallas tpu module unavailable")
    T0 = x.shape[1]
    n_stage = len(cfg.upsample_rates)
    up = int(np.prod(cfg.upsample_rates))
    Tout = T0 * up
    wd = pw["pre_w"].dtype
    sd = state.pre.dtype

    kernel = _make_kernel(cfg, T0)
    compiled = not interpret

    def spec(shape):
        if compiled:
            return pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                memory_space=_MEM)
        return pl.BlockSpec(shape, lambda: tuple(0 for _ in shape))

    ins = [x[0].astype(wd), pw["pre_w"], pw["pre_b"], state.pre[0]]
    for i in range(n_stage):
        st = pw["stages"][i]
        ins += [st["wa"], st["wb"], st["ub"], state.ups[i][0],
                st["rw"], st["rb"], state.res[i][0]]
    ins += [pw["post_w"], pw["post_b"], state.post[0]]

    out_shapes = [jax.ShapeDtypeStruct((Tout, 1), wd),
                  jax.ShapeDtypeStruct(state.pre.shape[1:], sd)]
    for i in range(n_stage):
        out_shapes.append(jax.ShapeDtypeStruct(state.ups[i].shape[1:], sd))
        out_shapes.append(jax.ShapeDtypeStruct(state.res[i].shape[1:], sd))
    out_shapes.append(jax.ShapeDtypeStruct(state.post.shape[1:], sd))

    kwargs = {}
    if compiled:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(),
            vmem_limit_bytes=128 * 1024 * 1024,
        )
    outs = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[spec(a.shape) for a in ins],
        out_specs=tuple(spec(s.shape) for s in out_shapes),
        out_shape=tuple(out_shapes),
        interpret=interpret,
        **kwargs,
    )(*ins)

    wav = outs[0][None, :, 0]
    pre = outs[1][None]
    ups, res = [], []
    j = 2
    for i in range(n_stage):
        ups.append(outs[j][None]); res.append(outs[j + 1][None]); j += 2
    post = outs[j][None]
    return PackedHeadState(pre, tuple(ups), tuple(res), post), wav
