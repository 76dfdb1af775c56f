"""Pallas TPU kernel: the tokenizer's ConvNeXt front end in ONE invocation.

Per 46.44 ms chunk the content encoder's pre-transformer path runs ~150
small ops: stem conv + LayerNorm, 18 ConvNeXt blocks across 4 stages (each:
causal depthwise conv k7, LN, pointwise C->4C, exact GELU, pointwise 4C->C,
LayerScale, residual — firefly.py:375-517), 3 stage-transition 1x1 convs,
a final LN, and two stride-2 downsample convs + blocks
(firefly_encoder.py:553-566).  Everything operates on <= 4 rows, so like the
HiFiGAN head (docs/KERNELS.md "fused-head pattern") the stage is pure XLA
op-scheduling latency.

One pallas_call, no grid, fully unrolled:

* depthwise convs are k shifted elementwise FMAs against per-tap (1, C)
  weight rows;
* pointwise convs are single matmuls against row-packed per-stage weights;
* the stride-2 downsample convs are two one-hot row-selection matmuls
  (sel_even @ x @ W0 + sel_odd @ x @ W1) — Mosaic-friendly, no strided
  sublane slices;
* LayerNorm/GELU(exact erf) run in f32 on the VPU;
* depthwise-conv tails live in packed per-stage buffers (8-row slots);
  `TokenizerConfig.use_pallas_encoder` switches the streaming state to this
  `PackedEncState`; pack/unpack convert to/from the dict layout for the
  batched XLA fallback and transfer migration;
* weights are re-packed once per params identity (id-cached, outside jit).

Scope: batch 1 (live-stream hot path), gin_channels == 0 (the deployed
tokenizer backbone).  Batch > 1 unpacks to the dict layout and runs the XLA
path.
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

from streamvoiceanon_tpu.config import TokenizerConfig


def _ln(x: jax.Array, w: jax.Array, b: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype) * w + b


def _erf_poly(x: jax.Array) -> jax.Array:
    """f32 erf for Mosaic (lax.erf has no Pallas TPU lowering rule).

    Abramowitz & Stegun 7.1.26 rational approximation, max abs error
    1.5e-7 — at f32 rounding granularity, so GELU parity vs the XLA
    exact-erf path holds to ~1e-6 (test_pallas_convnext_enc tolerances).
    """
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + _erf_poly(xf / np.sqrt(2.0)))).astype(x.dtype)


class PackedEncState(NamedTuple):
    """Packed dwconv tails (B leading): stem + one buffer per stage + the two
    downsample blocks."""

    stem: jax.Array  # (B, 8, C_in)
    stages: Tuple[jax.Array, ...]  # (B, depth*8, C_i)
    down: jax.Array  # (B, n_down*8, C_q)


def init_packed_state(cfg: TokenizerConfig, batch: int = 1,
                      dtype=jnp.float32) -> PackedEncState:
    bb = cfg.backbone
    cq = cfg.quantizer.input_dim
    nd = len(cfg.quantizer.downsample_factor)
    return PackedEncState(
        stem=jnp.zeros((batch, 8, bb.input_channels), dtype),
        stages=tuple(jnp.zeros((batch, d * 8, c), dtype)
                     for d, c in zip(bb.depths, bb.dims)),
        down=jnp.zeros((batch, nd * 8, cq), dtype),
    )


def pack_enc_state(backbone_state: Dict, down_states, cfg: TokenizerConfig) -> PackedEncState:
    """models/tokenizer_stream dict layout -> packed.  `down_states` is the
    TokenizerStreamState.down tuple ({"conv": ConvState, "block": ConvState})."""
    bb = cfg.backbone
    B = backbone_state["stem"].tail.shape[0]
    dtype = backbone_state["stem"].tail.dtype

    def pad_rows(t, target):
        return jnp.pad(t, ((0, 0), (0, target - t.shape[1]), (0, 0)))

    stages = []
    for i, (d, c) in enumerate(zip(bb.depths, bb.dims)):
        buf = jnp.zeros((B, d * 8, c), dtype)
        for bi, bst in enumerate(backbone_state["stages"][i]):
            buf = jax.lax.dynamic_update_slice(
                buf, bst.tail.astype(dtype), (0, bi * 8, 0))
        stages.append(buf)
    nd = len(down_states)
    cq = cfg.quantizer.input_dim
    down = jnp.zeros((B, nd * 8, cq), dtype)
    for i, st in enumerate(down_states):
        down = jax.lax.dynamic_update_slice(
            down, st["block"].tail.astype(dtype), (0, i * 8, 0))
    return PackedEncState(
        stem=pad_rows(backbone_state["stem"].tail, 8),
        stages=tuple(stages), down=down,
    )


def unpack_enc_state(packed: PackedEncState, cfg: TokenizerConfig):
    """packed -> (backbone dict, down tuple) in the dict layout."""
    from streamvoiceanon_tpu.ops.conv import ConvState

    bb = cfg.backbone
    k = bb.kernel_size
    backbone = {
        "stem": ConvState(packed.stem[:, : k - 1]),
        "stages": [
            [ConvState(packed.stages[i][:, bi * 8: bi * 8 + k - 1])
             for bi in range(d)]
            for i, d in enumerate(bb.depths)
        ],
    }
    down = []
    for i, f in enumerate(cfg.quantizer.downsample_factor):
        B = packed.down.shape[0]
        cq = cfg.quantizer.input_dim
        down.append({
            # stride == kernel -> zero-length conv tail
            "conv": ConvState(jnp.zeros((B, 0, cq), packed.down.dtype)),
            "block": ConvState(packed.down[:, i * 8: i * 8 + k - 1]),
        })
    return backbone, tuple(down)


# ---------------------------------------------------------------------------
# Weight packing (id-cached, eager)
# ---------------------------------------------------------------------------

_WCACHE: Dict[int, Dict] = {}


def _check_geometry(tok_params: Dict, cfg: TokenizerConfig) -> None:
    k = cfg.backbone.kernel_size
    if k > 9:
        raise NotImplementedError(
            "pallas convnext encoder: kernel_size > 9 overflows the 8-row "
            "packed tail slots")
    for d in tok_params["downsample"]:
        if d["block"]["dwconv"]["w"].shape[0] != k:
            raise NotImplementedError(
                "pallas convnext encoder: downsample-block dwconv kernel "
                "must equal backbone.kernel_size")


def packed_weights(tok_params: Dict, cfg: TokenizerConfig) -> Dict:
    key = id(tok_params)
    hit = _WCACHE.get(key)
    if hit is not None:
        return hit[1]
    bb = cfg.backbone
    p = tok_params["backbone"]
    _check_geometry(tok_params, cfg)

    def stage_pack(blocks):
        dw_w = jnp.stack([b["dwconv"]["w"][:, 0, :] for b in blocks])  # (d, k, C)
        dw_b = jnp.stack([b["dwconv"]["b"] for b in blocks])  # (d, C)
        ln_w = jnp.stack([b["norm"]["w"] for b in blocks])
        ln_b = jnp.stack([b["norm"]["b"] for b in blocks])
        pw1 = jnp.concatenate([b["pwconv1"]["w"] for b in blocks], axis=0)
        pw1_b = jnp.stack([b["pwconv1"]["b"] for b in blocks])
        pw2 = jnp.concatenate([b["pwconv2"]["w"] for b in blocks], axis=0)
        pw2_b = jnp.stack([b["pwconv2"]["b"] for b in blocks])
        gamma = jnp.stack([b["gamma"] for b in blocks])
        return {"dw_w": dw_w, "dw_b": dw_b, "ln_w": ln_w, "ln_b": ln_b,
                "pw1": pw1, "pw1_b": pw1_b, "pw2": pw2, "pw2_b": pw2_b,
                "gamma": gamma}

    out = {
        "stem_w": p["stem_conv"]["w"].reshape(-1, bb.dims[0]),
        "stem_b": p["stem_conv"]["b"][None],
        "stem_ln_w": p["stem_norm"]["w"][None],
        "stem_ln_b": p["stem_norm"]["b"][None],
        "stages": [stage_pack(p[f"stage_{i}"]) for i in range(len(bb.depths))],
        "mids": [
            {"ln_w": p[f"mid_norm_{i}"]["w"][None],
             "ln_b": p[f"mid_norm_{i}"]["b"][None],
             "w": p[f"mid_conv_{i}"]["w"][0],
             "b": p[f"mid_conv_{i}"]["b"][None]}
            for i in range(len(bb.depths) - 1)
        ],
        "final_ln_w": p["final_norm"]["w"][None],
        "final_ln_b": p["final_norm"]["b"][None],
        "downs": [
            {"w": d["conv"]["w"].reshape(-1, d["conv"]["w"].shape[-1]),
             "b": d["conv"]["b"][None],
             "blk": stage_pack([d["block"]])}
            for d in tok_params["downsample"]
        ],
    }
    out = jax.tree.map(jnp.asarray, out)
    # pin the params object alongside the packed tree: the cache is keyed by
    # id(), and a garbage-collected dict's address can be reused by a
    # different model's params — keeping a strong reference prevents that
    _WCACHE[key] = (tok_params, out)
    return out


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _make_kernel(cfg: TokenizerConfig, T0: int):
    bb = cfg.backbone
    k = bb.kernel_size
    depths = bb.depths
    factors = cfg.quantizer.downsample_factor

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        stem_w = next(it); stem_b = next(it)
        stem_lnw = next(it); stem_lnb = next(it); stem_tail = next(it)
        stage_refs = []
        for _ in depths:
            stage_refs.append({n: next(it) for n in (
                "dw_w", "dw_b", "ln_w", "ln_b", "pw1", "pw1_b", "pw2",
                "pw2_b", "gamma", "tail")})
        mid_refs = [{n: next(it) for n in ("ln_w", "ln_b", "w", "b")}
                    for _ in range(len(depths) - 1)]
        fin_lnw = next(it); fin_lnb = next(it)
        down_refs = []
        for _ in factors:
            down_refs.append({n: next(it) for n in (
                "w", "b", "dw_w", "dw_b", "ln_w", "ln_b", "pw1", "pw1_b",
                "pw2", "pw2_b", "gamma")})
        dtail_ref = next(it)
        z_ref = next(it)
        stem_out = next(it)
        stage_outs = [next(it) for _ in depths]
        down_out = next(it)

        def block(x, T, sr, bi, tail_ref, base_off):
            """One ConvNeXt block; reads the packed dw tail slot, returns the
            updated rows for the caller to fold back."""
            C = x.shape[1]
            off = base_off + bi * 8
            full = jnp.concatenate([tail_ref[off: off + k - 1], x], axis=0)
            tail_out_rows = full[T: T + k - 1]
            dw_wb = sr["dw_w"][bi]  # (k, C)
            acc = jnp.zeros((T, C), jnp.float32)
            for j in range(k):
                acc = acc + full[j: j + T].astype(jnp.float32) * dw_wb[j: j + 1]
            h = (acc + sr["dw_b"][bi: bi + 1]).astype(x.dtype)
            h = _ln(h, sr["ln_w"][bi: bi + 1], sr["ln_b"][bi: bi + 1])
            hdim = sr["pw1"].shape[1]
            h = (_dotf(h, sr["pw1"][bi * C: (bi + 1) * C])
                 + sr["pw1_b"][bi: bi + 1]).astype(x.dtype)
            h = _gelu_exact(h)
            h = (_dotf(h, sr["pw2"][bi * hdim: (bi + 1) * hdim])
                 + sr["pw2_b"][bi: bi + 1]).astype(x.dtype)
            h = h * sr["gamma"][bi: bi + 1]
            return x + h, tail_out_rows

        # ---- stem -----------------------------------------------------------
        T = T0
        x = x_ref[...]  # (T0, C_in)
        full = jnp.concatenate([stem_tail[: k - 1], x], axis=0)
        stem_out[...] = jnp.concatenate(
            [full[T: T + k - 1], stem_tail[k - 1:]], axis=0)
        # per-tap matmuls against row-slices of the (k*C_in, C_out) packed
        # weight — the single-matmul im2col form concatenates shifted slices
        # along lanes, which Mosaic cannot relayout ("result/input offset
        # mismatch on non-concat dimension" on the real chip)
        cin = x.shape[1]
        acc = _dotf(full[0:T], stem_w[0:cin])
        for j in range(1, k):
            acc = acc + _dotf(full[j: j + T], stem_w[j * cin: (j + 1) * cin])
        x = (acc + stem_b[...]).astype(x.dtype)
        x = _ln(x, stem_lnw[...], stem_lnb[...])

        # ---- stages ----------------------------------------------------------
        for i, d in enumerate(depths):
            if i > 0:
                m = mid_refs[i - 1]
                x = _ln(x, m["ln_w"][...], m["ln_b"][...])
                x = (_dotf(x, m["w"][...]) + m["b"][...]).astype(x.dtype)
            sr = stage_refs[i]
            new_tails = []
            for bi in range(d):
                x, trows = block(x, T, sr, bi, sr["tail"], 0)
                new_tails.append((bi * 8, trows))
            # static-offset row splice (Mosaic has no dynamic_update_slice
            # lowering; all offsets are Python ints here)
            stage_outs[i][...] = _splice_rows(sr["tail"][...], new_tails)
        x = _ln(x, fin_lnw[...], fin_lnb[...])

        # ---- downsample conv (stride f == kernel f) + block ------------------
        new_dtails = []
        for i, f in enumerate(factors):
            dr = down_refs[i]
            C = x.shape[1]
            Tn = T // f
            # y[t] = sum_j x[f*t + j] @ W[j] via one-hot row selections
            rowsel = [
                (jax.lax.broadcasted_iota(jnp.int32, (Tn, T), 1)
                 == (jax.lax.broadcasted_iota(jnp.int32, (Tn, T), 0) * f + j)
                 ).astype(jnp.float32)
                for j in range(f)
            ]
            y = jnp.zeros((Tn, dr["w"].shape[1]), jnp.float32)
            for j in range(f):
                xj = _dotf(rowsel[j], x.astype(jnp.float32)).astype(x.dtype)
                y = y + _dotf(xj, dr["w"][j * C: (j + 1) * C])
            x = (y + dr["b"][...]).astype(x.dtype)
            T = Tn
            x, trows = block(x, T, dr, 0, dtail_ref, i * 8)
            new_dtails.append((i * 8, trows))
        down_out[...] = _splice_rows(dtail_ref[...], new_dtails)

        z_ref[...] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def encoder_front_step(
    pw: Dict,  # packed_weights output
    state: PackedEncState,  # B == 1
    mel: jax.Array,  # (1, T0, C_in)
    cfg: TokenizerConfig,
    interpret: bool = False,
) -> Tuple[PackedEncState, jax.Array]:
    """One fused front-end step: mel frames -> pre-transformer features
    (1, T0 // prod(downsample), C_q).  Returns (state', z)."""
    if pltpu is None:  # pragma: no cover
        raise RuntimeError("pallas tpu module unavailable")
    bb = cfg.backbone
    T0 = mel.shape[1]
    Tz = T0 // int(np.prod(cfg.quantizer.downsample_factor))
    wd = pw["stem_w"].dtype
    sd = state.stem.dtype
    n_stage = len(bb.depths)

    kernel = _make_kernel(cfg, T0)
    compiled = not interpret

    def spec(shape):
        if compiled:
            return pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                memory_space=_MEM)
        return pl.BlockSpec(shape, lambda: tuple(0 for _ in shape))

    ins = [mel[0].astype(wd), pw["stem_w"], pw["stem_b"], pw["stem_ln_w"],
           pw["stem_ln_b"], state.stem[0]]
    for i in range(n_stage):
        st = pw["stages"][i]
        ins += [st["dw_w"], st["dw_b"], st["ln_w"], st["ln_b"], st["pw1"],
                st["pw1_b"], st["pw2"], st["pw2_b"], st["gamma"],
                state.stages[i][0]]
    for i in range(n_stage - 1):
        m = pw["mids"][i]
        ins += [m["ln_w"], m["ln_b"], m["w"], m["b"]]
    ins += [pw["final_ln_w"], pw["final_ln_b"]]
    for i in range(len(cfg.quantizer.downsample_factor)):
        d = pw["downs"][i]
        blk = d["blk"]
        ins += [d["w"], d["b"], blk["dw_w"], blk["dw_b"], blk["ln_w"],
                blk["ln_b"], blk["pw1"], blk["pw1_b"], blk["pw2"],
                blk["pw2_b"], blk["gamma"]]
    ins.append(state.down[0])

    out_shapes = [jax.ShapeDtypeStruct((Tz, cfg.quantizer.input_dim), wd),
                  jax.ShapeDtypeStruct(state.stem.shape[1:], sd)]
    for i in range(n_stage):
        out_shapes.append(jax.ShapeDtypeStruct(state.stages[i].shape[1:], sd))
    out_shapes.append(jax.ShapeDtypeStruct(state.down.shape[1:], sd))

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

    z = outs[0][None]
    new = PackedEncState(
        stem=outs[1][None],
        stages=tuple(outs[2 + i][None] for i in range(n_stage)),
        down=outs[2 + n_stage][None],
    )
    return new, z
