"""Polyphase-folded HiFi-GAN generator: the whole vocoder as MXU matmuls.

The generator's tail is a ~1M-sample conv stack with 8-64 channels —
pathological for the TPU MXU/VPU whose lane width is 128 (XLA's conv
lowering leaves >99% of the lanes idle).  This module re-expresses every
conv / transposed-conv on the long waveform axis as a dense matmul over
FRAME-RATE activations in a polyphase ("folded") layout:

    x_folded[t, s*C + c] = x_long[t*r + s, c]        (r samples per frame)

A conv with kernel k / dilation d / stride 1 (or a transposed conv with
k - 2*pad == stride, which all HiFi-GAN upsamplers satisfy) becomes

    y[t] = concat(x[t-w], ..., x[t+w]) @ W_folded + b_folded

where W_folded ((2w+1)·C_in·r_in, C_out·r_out) is built **exactly** by
scattering the original weights by index arithmetic (no approximation; unit
tests check bit-parity vs the reference-parity conv ops).  The matmuls have
M = frames, N = 512–2048 — near-ideal MXU shapes; XLA fuses the leaky-relu
and residual epilogues.

Masking is frame-level only (validity boundaries are frame-aligned), which
preserves the exact edge-padding parity argument of models/hifigan.py.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from efficientspeech_tpu.config import HifiGanConfig

LRELU_SLOPE = 0.1


# --- exact folded-weight builders (host, numpy) -----------------------------

def fold_conv1d(w_kio: np.ndarray, bias: Optional[np.ndarray], rate: int,
                dilation: int, padding: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """Fold a stride-1 conv1d at ``rate`` samples/frame.

    w_kio: (k, C_in, C_out).  Returns (W, b, w) with
    W ((2w+1)*C_in*rate, C_out*rate), b (C_out*rate,).
    Index math: out sample o = t*rate + p reads x at s = o - padding + tap*d
    → frame t + off, phase q.
    """
    k, c_in, c_out = w_kio.shape
    d_in = c_in * rate
    d_out = c_out * rate

    offs = []
    for p in range(rate):
        for tap in range(k):
            offs.append((p - padding + tap * dilation) // rate)
    w = max(abs(min(offs)), abs(max(offs)))

    W = np.zeros(((2 * w + 1) * d_in, d_out), np.float32)
    for p in range(rate):
        for tap in range(k):
            s = p - padding + tap * dilation
            off = s // rate
            q = s - off * rate
            # rows: frame (off+w), layout q*C_in + ci ; cols: p*C_out + co
            row0 = (off + w) * d_in + q * c_in
            col0 = p * c_out
            W[row0: row0 + c_in, col0: col0 + c_out] += w_kio[tap]
    b = (np.tile(bias, rate) if bias is not None
         else np.zeros(d_out, np.float32)).astype(np.float32)
    return W, b, w


def fold_conv_transpose1d(w_kio: np.ndarray, bias: Optional[np.ndarray],
                          rate_in: int, stride: int, padding: int
                          ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Fold a transposed conv (k - 2*pad == stride) from rate_in to
    rate_in*stride samples/frame.

    w_kio: (k, C_in, C_out) (same layout ops.conv_transpose1d consumes).
    torch semantics: out[O] += x[J] * w[m] where m = O - s*J + pad ∈ [0, k).
    """
    k, c_in, c_out = w_kio.shape
    rate_out = rate_in * stride
    d_in = c_in * rate_in
    d_out = c_out * rate_out

    # enumerate (p, m) pairs with valid J alignment
    entries = []
    for p in range(rate_out):
        for m in range(k):
            num = p + padding - m
            if num % stride != 0:
                continue
            j = num // stride            # input sample within-frame + offset
            off = j // rate_in
            q = j - off * rate_in
            entries.append((p, m, off, q))
    w = max(max(abs(e[2]) for e in entries), 0)

    W = np.zeros(((2 * w + 1) * d_in, d_out), np.float32)
    for p, m, off, q in entries:
        row0 = (off + w) * d_in + q * c_in
        col0 = p * c_out
        W[row0: row0 + c_in, col0: col0 + c_out] += w_kio[m]
    b = (np.tile(bias, rate_out) if bias is not None
         else np.zeros(d_out, np.float32)).astype(np.float32)
    return W, b, w


def _conv_entries(k: int, rate: int, dilation: int, padding: int):
    """Static (tap, p, off, q) scatter entries + window w for a conv fold."""
    entries = []
    offs = []
    for p in range(rate):
        for tap in range(k):
            s = p - padding + tap * dilation
            off = s // rate
            q = s - off * rate
            entries.append((tap, p, off, q))
            offs.append(off)
    w = max(abs(min(offs)), abs(max(offs)))
    return entries, w


def _convt_entries(k: int, rate_in: int, stride: int, padding: int):
    entries = []
    offs = [0]
    for p in range(rate_in * stride):
        for m in range(k):
            num = p + padding - m
            if num % stride != 0:
                continue
            j = num // stride
            off = j // rate_in
            q = j - off * rate_in
            entries.append((m, p, off, q))
            offs.append(off)
    w = max(abs(min(offs)), abs(max(offs)))
    return entries, w


def _scatter_fold(w_kio: jnp.ndarray, bias: jnp.ndarray, entries, w: int,
                  rate_in: int, rate_out: int):
    """Device-side fold: scatter (k, C_in, C_out) weights into the folded
    matrix.  Avoids uploading ~0.5 GB of host-built matrices over slow
    links — only the original small kernels transfer."""
    k, c_in, c_out = w_kio.shape
    d_in, d_out = c_in * rate_in, c_out * rate_out
    taps = np.array([e[0] for e in entries])
    rows0 = np.array([(e[2] + w) * d_in + e[3] * c_in for e in entries])
    cols0 = np.array([e[1] * c_out for e in entries])
    vals = w_kio[jnp.asarray(taps)]                       # (E, C_in, C_out)
    R = jnp.asarray(rows0)[:, None, None] + jnp.arange(c_in)[None, :, None]
    C = jnp.asarray(cols0)[:, None, None] + jnp.arange(c_out)[None, None, :]
    W = jnp.zeros(((2 * w + 1) * d_in, d_out), w_kio.dtype)
    W = W.at[R, C].add(vals)
    b = jnp.tile(bias, rate_out)
    return W, b


# Default folded width: the MINIMUM-lane grid.  Polyphase folding
# inflates FLOPs by ≈ (2w+1)·g/k per op, and minimizing taps·g per op
# lands on g = 128/C for (almost) every op — measured on the chip at the
# 3072-frame serving shape: d128 419 GFLOP / 3.96 ms vs d512 1225 GFLOP /
# 8.77 ms with the fused kernel (benchmarks/grid_sweep.py, round 3).
D_TARGET_DEFAULT = 128


def make_grid_plan(cfg: HifiGanConfig, d_target: int = D_TARGET_DEFAULT):
    """Per-stage polyphase grid: g_s samples per folded row, chosen so
    D = C_s * g_s ≈ d_target.  A uniform full fold (g_s = cumulative rate)
    puts stages 1-3 at D=2048 with ≥3-row windows; d_target=128 (default)
    is the measured FLOP-optimal grid (see D_TARGET_DEFAULT above — the
    windowed-concat XLA path prefers 512, the fused kernel 128).
    Returns per-stage (g, rows_per_mel_frame) and the post-upsample row
    split factors."""
    ch, rate = [], []
    r = 1
    c0 = cfg.upsample_initial_channel
    for i, u in enumerate(cfg.upsample_rates):
        r *= u
        ch.append(c0 // (2 ** (i + 1)))
        rate.append(r)
    g = []
    for c_s, r_s in zip(ch, rate):
        gs = max(1, min(r_s, d_target // c_s))
        while r_s % gs:
            gs -= 1  # g must divide the stage rate for frame alignment
        g.append(gs)
    rows_per_frame = [r_s // g_s for r_s, g_s in zip(rate, g)]
    return ch, rate, g, rows_per_frame


def fold_hifigan_device(params: Dict, cfg: HifiGanConfig, dtype=jnp.bfloat16,
                        d_target: int = D_TARGET_DEFAULT):
    """One jitted program: generator params → folded weights, entirely on
    device (only the small original kernels cross the host link).

    Returns ({key: (W, b)}, meta) where meta carries the static plan:
    window widths, post-up reshape factors, and per-key valid-row
    multipliers (rows per mel frame at that op's output grid).

    Both resblock types fold: "1" (V1/V2 configs, conv1/conv2 pairs) and
    "2" (the LJ_V3 config's lighter block, one residual conv per
    dilation — reference: hifigan/models.py:60-81).
    """

    ch, rate, g, rows_per_frame = make_grid_plan(cfg, d_target)

    specs = {}   # key -> (param_path, entries, w, rate_in, rate_out)
    reshape = {}  # key (up ops) -> row split factor after the op
    valid_mult = {}

    specs["pre"] = ("conv_pre", *_conv_entries(7, 1, 1, 3), 1, 1)
    valid_mult["pre"] = 1
    g_prev = 1
    for i, (u, kk) in enumerate(zip(cfg.upsample_rates,
                                    cfg.upsample_kernel_sizes)):
        # convT emits rows of g_prev*u samples; reshape splits to g[i]
        e, w = _convt_entries(kk, g_prev, u, (kk - u) // 2)
        specs[f"up{i}"] = (f"up{i}", e, w, g_prev, g_prev * u)
        split = (g_prev * u) // g[i]
        assert split * g[i] == g_prev * u, (i, g_prev, u, g[i])
        reshape[f"up{i}"] = split
        # masking happens pre-split (rows/frame at the raw convT output)
        assert rows_per_frame[i] % split == 0
        valid_mult[f"up{i}"] = rows_per_frame[i] // split
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            for m, d in enumerate(rd):
                if cfg.resblock == "1":
                    e1, w1 = _conv_entries(rk, g[i], d, (rk * d - d) // 2)
                    specs[f"rb{i}_{j}_c1_{m}"] = (
                        (f"resblock_{i}_{j}", f"conv1_{m}"), e1, w1,
                        g[i], g[i])
                    valid_mult[f"rb{i}_{j}_c1_{m}"] = rows_per_frame[i]
                    e2, w2 = _conv_entries(rk, g[i], 1, (rk - 1) // 2)
                    specs[f"rb{i}_{j}_c2_{m}"] = (
                        (f"resblock_{i}_{j}", f"conv2_{m}"), e2, w2,
                        g[i], g[i])
                    valid_mult[f"rb{i}_{j}_c2_{m}"] = rows_per_frame[i]
                else:  # "2": one residual conv per dilation
                    e1, w1 = _conv_entries(rk, g[i], d, (rk * d - d) // 2)
                    specs[f"rb{i}_{j}_c_{m}"] = (
                        (f"resblock_{i}_{j}", f"conv_{m}"), e1, w1,
                        g[i], g[i])
                    valid_mult[f"rb{i}_{j}_c_{m}"] = rows_per_frame[i]
        g_prev = g[i]
    specs["post"] = ("conv_post", *_conv_entries(7, g[-1], 1, 3),
                     g[-1], g[-1])
    valid_mult["post"] = rows_per_frame[-1]

    def get_param(p, path):
        node = p[path] if isinstance(path, str) else p[path[0]][path[1]]
        return node["kernel"].astype(dtype), node["bias"].astype(dtype)

    @jax.jit
    def fold_all(p):
        out = {}
        for key, (path, entries, w, r_in, r_out) in specs.items():
            kern, bias = get_param(p, path)
            out[key] = _scatter_fold(kern, bias, entries, w, r_in, r_out)
        return out

    arrays = fold_all(jax.tree.map(jnp.asarray, params))
    meta = {
        "widths": {k: v[2] for k, v in specs.items()},
        "reshape": reshape,
        "valid_mult": valid_mult,
    }
    return arrays, meta


def pack_folded(arrays: Dict, dtype=jnp.bfloat16):
    """Concatenate every folded W and b into ONE flat device array.

    High-latency runtimes pay per-argument marshaling on every jitted call;
    packing turns 2×21 array arguments into one.  Returns (flat, layout)
    where layout maps key → (w_offset, w_shape, b_offset, b_len) (static).
    """
    parts = []
    layout = {}
    off = 0
    for key in sorted(arrays):
        W, b = arrays[key]
        W = jnp.asarray(W, dtype)
        b = jnp.asarray(b, dtype)
        layout[key] = (off, tuple(W.shape), off + W.size, int(b.size))
        parts.append(W.reshape(-1))
        parts.append(b.reshape(-1))
        off += W.size + b.size
    return jnp.concatenate(parts), layout


def unpack_folded(flat: jnp.ndarray, layout, widths) -> Dict:
    """Inverse of pack_folded (inside jit; slices are views until used)."""
    out = {}
    for key, (w_off, w_shape, b_off, b_len) in layout.items():
        W = jax.lax.dynamic_slice_in_dim(
            flat, w_off, int(np.prod(w_shape))).reshape(w_shape)
        b = jax.lax.dynamic_slice_in_dim(flat, b_off, b_len)
        out[key] = (W, b)
    return out


def folded_plan_apply(arrays: Dict, meta, cfg: HifiGanConfig,
                      mel: jnp.ndarray,
                      valid_len: Optional[jnp.ndarray] = None,
                      dtype=jnp.bfloat16,
                      use_pallas: bool = False,
                      interpret: bool = False,
                      pallas_tm: int = 512,
                      pallas_fuse_k: bool = False,
                      pallas_window_dma: bool = False,
                      fuse_stage_sum: bool = True,
                      act_dtype=None,
                      fuse_mrf: bool = False,
                      mrf_tm: int = 512) -> jnp.ndarray:
    """Run the re-gridded folded generator.  ``arrays``/``meta`` from
    fold_hifigan_device.  Exactly equivalent to HifiGanGenerator with
    row-level (frame-aligned) masking.

    pallas_tm: kernel tile height.  512 measured fastest at every serving
    shape (2048/3072/4096 frames: 4.82/8.76/11.74 ms vs 5.32/8.94/11.92 at
    tm=256; benchmarks/compute_sweep.py).

    fuse_stage_sum (pallas path): fold the per-stage resblock sum
    ``xs = xs + v`` and the ``/ num_kernels`` epilogue into the final conv
    kernel of each resblock (second residual operand + output scale) —
    the standalone XLA elementwise passes between opaque kernels are pure
    HBM traffic (~0.5 GB/apply at 3072 frames in f32).

    act_dtype: inter-op activation dtype on the pallas path (default f32).
    The matmuls are one-pass bf16 on the MXU either way (DEFAULT
    precision); bf16 activations halve kernel DMA traffic at a per-op
    rounding cost (the serving wire codec floor is ~26 dB SNR, far below
    the bf16 activation noise — see docs/DESIGN.md)."""
    widths = dict(meta["widths"])
    reshape = dict(meta["reshape"])
    valid_mult = dict(meta["valid_mult"])
    num_kernels = len(cfg.resblock_kernel_sizes)
    # activations stay f32; ``dtype`` selects the matmul input precision
    x = mel.astype(jnp.float32)
    b = x.shape[0]
    if act_dtype is None:
        act_dtype = jnp.float32

    if use_pallas:
        from efficientspeech_tpu.ops.pallas.folded_matmul import folded_matmul

        assert b == 1, "pallas folded path is single-utterance"

    def apply_op(inp, key, pre_lrelu, slope=LRELU_SLOPE, residual=None,
                 accum=None, out_scale=None):
        W, bb = arrays[key]
        w = widths[key]
        if valid_len is not None:
            vrows = valid_len * valid_mult[key]
        else:
            vrows = None
        d_in = W.shape[0] // (2 * w + 1)
        # Mosaic needs the lane (feature) dim 128-aligned; route the mel
        # input op (d_in=80) through XLA
        if use_pallas and d_in % 128 == 0:
            vl = (vrows[0] if vrows is not None
                  else jnp.int32(inp.shape[1]))
            out = folded_matmul(inp[0].astype(act_dtype),
                                W.astype(dtype), bb.astype(dtype),
                                w, vl,
                                residual=None if residual is None
                                else residual[0].astype(act_dtype),
                                accum=None if accum is None
                                else accum[0].astype(act_dtype),
                                out_scale=out_scale,
                                pre_lrelu=pre_lrelu, lrelu_slope=slope,
                                tm=pallas_tm, fuse_k=pallas_fuse_k,
                                window_dma=pallas_window_dma,
                                interpret=interpret)[None]
        else:
            src = inp
            if pre_lrelu:
                src = leaky(src, slope)
            out = _folded_apply(src, (W, bb, w), dtype)
            if residual is not None:
                out = out + residual
            if accum is not None:
                out = out + accum
            if out_scale is not None:
                out = out * out_scale
            if vrows is not None:
                t = out.shape[1]
                keep = (jnp.arange(t, dtype=jnp.int32)[None, :]
                        < vrows[:, None])
                out = jnp.where(keep[:, :, None], out, 0.0)
        split = reshape.get(key, 1)
        if split > 1:
            bb_, t_, d_ = out.shape
            out = out.reshape(bb_, t_ * split, d_ // split)
        return out

    fuse_sum = fuse_stage_sum and use_pallas
    x = apply_op(x, "pre", pre_lrelu=False)
    for i in range(len(cfg.upsample_rates)):
        x = apply_op(x, f"up{i}", pre_lrelu=True)
        if (fuse_mrf and use_pallas and cfg.resblock == "1"
                and x.shape[2] % 128 == 0):
            # whole-stage MRF (18 convs + residuals + sum + /num_kernels)
            # as ONE kernel: per-stage HBM traffic collapses to one
            # read + one write of the activations
            from efficientspeech_tpu.ops.pallas.mrf_block import (
                build_mrf_spec, mrf_fused)

            chains, W_all, b_all, H = build_mrf_spec(
                arrays, widths, i, cfg.resblock_dilation_sizes)
            vrows = (valid_len * valid_mult[f"rb{i}_0_c1_0"]
                     if valid_len is not None else None)
            vl = (vrows[0] if vrows is not None
                  else jnp.int32(x.shape[1]))
            x = mrf_fused(x[0].astype(act_dtype), chains,
                          W_all.astype(dtype), b_all.astype(dtype), H, vl,
                          num_kernels, tm=mrf_tm,
                          interpret=interpret)[None]
            continue
        xs = None
        for j, rd in enumerate(cfg.resblock_dilation_sizes):
            v = x
            for m in range(len(rd)):
                last = fuse_sum and m == len(rd) - 1
                scale = (1.0 / num_kernels
                         if last and j == num_kernels - 1 else None)
                acc = xs if (last and xs is not None) else None
                if cfg.resblock == "1":
                    t1 = apply_op(v, f"rb{i}_{j}_c1_{m}", pre_lrelu=True)
                    v = apply_op(t1, f"rb{i}_{j}_c2_{m}", pre_lrelu=True,
                                 residual=v, accum=acc, out_scale=scale)
                else:  # "2": v = conv(lrelu(v)) + v per dilation
                    v = apply_op(v, f"rb{i}_{j}_c_{m}", pre_lrelu=True,
                                 residual=v, accum=acc, out_scale=scale)
            xs = v if (xs is None or fuse_sum) else xs + v
        x = xs if fuse_sum else xs / num_kernels
    x = apply_op(x, "post", pre_lrelu=True, slope=0.01)
    x = jnp.tanh(x.astype(jnp.float32))
    b_, t_, d_ = x.shape
    return x.reshape(b_, t_ * d_)


def fold_hifigan(params: Dict, cfg: HifiGanConfig) -> Dict:
    """HifiGanGenerator params → folded matmul weights (host, one-time)."""
    assert cfg.resblock == "1", "folded path implements ResBlock1 configs"

    def conv(p):
        return np.asarray(p["kernel"], np.float32), np.asarray(
            p.get("bias"), np.float32) if "bias" in p else None

    folded: Dict = {}
    k_pre = np.asarray(params["conv_pre"]["kernel"], np.float32)
    b_pre = np.asarray(params["conv_pre"]["bias"], np.float32)
    folded["pre"] = fold_conv1d(k_pre, b_pre, rate=1, dilation=1, padding=3)

    rate = 1
    for i, (u, kk) in enumerate(zip(cfg.upsample_rates,
                                    cfg.upsample_kernel_sizes)):
        up = params[f"up{i}"]
        folded[f"up{i}"] = fold_conv_transpose1d(
            np.asarray(up["kernel"], np.float32),
            np.asarray(up["bias"], np.float32),
            rate_in=rate, stride=u, padding=(kk - u) // 2)
        rate *= u
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            rb = params[f"resblock_{i}_{j}"]
            for m, d in enumerate(rd):
                folded[f"rb{i}_{j}_c1_{m}"] = fold_conv1d(
                    np.asarray(rb[f"conv1_{m}"]["kernel"], np.float32),
                    np.asarray(rb[f"conv1_{m}"]["bias"], np.float32),
                    rate=rate, dilation=d, padding=(rk * d - d) // 2)
                folded[f"rb{i}_{j}_c2_{m}"] = fold_conv1d(
                    np.asarray(rb[f"conv2_{m}"]["kernel"], np.float32),
                    np.asarray(rb[f"conv2_{m}"]["bias"], np.float32),
                    rate=rate, dilation=1, padding=(rk - 1) // 2)
    folded["post"] = fold_conv1d(
        np.asarray(params["conv_post"]["kernel"], np.float32),
        np.asarray(params["conv_post"]["bias"], np.float32),
        rate=rate, dilation=1, padding=3)
    return folded


# --- runtime -----------------------------------------------------------------

def _folded_apply(x: jnp.ndarray, Wbw, dtype) -> jnp.ndarray:
    """x (B, T, D_in) → (B, T, D_out) via windowed matmul.

    Mixed precision: when ``dtype`` is bf16 the matmul inputs are bf16 (one
    fast MXU pass) but accumulation and activations stay f32 — through the
    vocoder's 20-deep residual chains pure-bf16 activations lose ~20 dB SNR
    while bf16-matmul/f32-accumulate is transparent at no MXU cost.
    """
    W, b, w = Wbw
    if w == 0:
        window = x
    else:
        t = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (w, w), (0, 0)))
        window = jnp.concatenate(
            [xp[:, i: i + t, :] for i in range(2 * w + 1)], axis=-1)
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    return jnp.dot(window.astype(dtype), jnp.asarray(W, dtype),
                   preferred_element_type=jnp.float32,
                   precision=precision) + jnp.asarray(b, jnp.float32)


def _mask_frames(x: jnp.ndarray, valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    if valid is None:
        return x
    t = x.shape[1]
    keep = jnp.arange(t, dtype=jnp.int32)[None, :] < valid[:, None]
    return jnp.where(keep[:, :, None], x, 0.0)


def leaky(x, slope):
    return jnp.where(x >= 0, x, x * slope)


def folded_generator_apply(folded: Dict, cfg: HifiGanConfig,
                           mel: jnp.ndarray,
                           valid_len: Optional[jnp.ndarray] = None,
                           dtype=jnp.bfloat16,
                           use_pallas: bool = False,
                           interpret: bool = False) -> jnp.ndarray:
    """mel (B, T, num_mels) → wav (B, T * total_upsample).

    Exactly equivalent to HifiGanGenerator.__call__ with frame-level
    masking (valid boundaries are frame-aligned).

    use_pallas: run each folded matmul through the fused Pallas kernel
    (ops/pallas/folded_matmul.py) — pre-activation, bias, residual, and
    tail masking fused into the matmul epilogue; B must be 1.
    """
    num_kernels = len(cfg.resblock_kernel_sizes)
    x = mel.astype(dtype)

    if use_pallas:
        from efficientspeech_tpu.ops.pallas.folded_matmul import folded_matmul

        assert x.shape[0] == 1, "pallas folded path is single-utterance"
        t_frames = x.shape[1]
        vl = (jnp.asarray(valid_len, jnp.int32).reshape(())
              if valid_len is not None else jnp.int32(t_frames))

        def apply_op(inp, key, pre_lrelu, slope=LRELU_SLOPE, residual=None):
            W, b, w = folded[key]
            out = folded_matmul(inp[0], jnp.asarray(W, dtype),
                                jnp.asarray(b, dtype), w, vl,
                                residual=None if residual is None
                                else residual[0],
                                pre_lrelu=pre_lrelu, lrelu_slope=slope,
                                interpret=interpret)
            return out[None]

        x = apply_op(x, "pre", pre_lrelu=False)
        for i in range(len(cfg.upsample_rates)):
            x = apply_op(x, f"up{i}", pre_lrelu=True)
            xs = None
            for j, rd in enumerate(cfg.resblock_dilation_sizes):
                v = x
                for m in range(len(rd)):
                    t1 = apply_op(v, f"rb{i}_{j}_c1_{m}", pre_lrelu=True)
                    v = apply_op(t1, f"rb{i}_{j}_c2_{m}", pre_lrelu=True,
                                 residual=v)
                xs = v if xs is None else xs + v
            x = xs / num_kernels
        x = apply_op(x, "post", pre_lrelu=True, slope=0.01)
        x = jnp.tanh(x)
        b_, t_, d_ = x.shape
        return x.reshape(b_, t_ * d_)

    x = _folded_apply(x, folded["pre"], dtype)
    x = _mask_frames(x, valid_len)

    for i in range(len(cfg.upsample_rates)):
        x = leaky(x, LRELU_SLOPE)
        x = _folded_apply(x, folded[f"up{i}"], dtype)
        x = _mask_frames(x, valid_len)
        xs = None
        for j, rd in enumerate(cfg.resblock_dilation_sizes):
            v = x
            for m in range(len(rd)):
                t1 = leaky(v, LRELU_SLOPE)
                t1 = _folded_apply(t1, folded[f"rb{i}_{j}_c1_{m}"], dtype)
                t1 = _mask_frames(t1, valid_len)
                t1 = leaky(t1, LRELU_SLOPE)
                t1 = _folded_apply(t1, folded[f"rb{i}_{j}_c2_{m}"], dtype)
                t1 = _mask_frames(t1, valid_len)
                v = t1 + v
            xs = v if xs is None else xs + v
        x = xs / num_kernels

    x = leaky(x, 0.01)  # torch default slope (reference: hifigan/models.py:121)
    x = _folded_apply(x, folded["post"], dtype)
    x = _mask_frames(x, valid_len)
    x = jnp.tanh(x)
    b, t, d = x.shape
    return x.reshape(b, t * d)
