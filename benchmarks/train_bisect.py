#!/usr/bin/env python3
"""Training-step bisection harness (consolidates the round-2/3 lab
notebooks train_bisect{,2..8}.py into one parameterized tool — round-3
VERDICT next #8; the findings live in docs/DESIGN.md "Training-step
bisection").

    PYTHONPATH=/root/repo:/root/.axon_site \
        python benchmarks/train_bisect.py --suite <name>

Suites (each reproduces one of the original experiments):

  step         pieces of the full train step: encoder+heads loss fwd/
               grad, length-regulator gather vs one-hot-matmul fwd/grad,
               mel decoder fwd/grad, full AdamW step  (was train_bisect)
  primitives   mel-decoder primitives at the decoder's (B, M, C) shape:
               depthwise k=5 conv, pointwise conv, LayerNorm, tanh, and
               the composed block, fwd + grad        (was train_bisect2)
  structure    the real MelDecoder fwd/grad with/without per-depth
               masking and with f32 vs bf16 input    (was train_bisect3)
  remat        mel-decoder grad: plain vs jax.checkpoint vs
               checkpoint_dots, wrt input and params (was train_bisect4)
  remat-step   full train step: plain vs loss-level remat vs
               nn.remat'd decoder                    (was train_bisect5)
  fused-ln     full train step with the fused Pallas LayerNorm, with and
               without decoder remat                 (was train_bisect6)
  breakdown    post-fused-LN component split: mel decoder fwd/grad vs
               everything-but-the-decoder loss grad  (was train_bisect7)
  fused-block  the fused decoder-block kernel (ops/pallas/
               decoder_block.py): decoder fwd/grad + full step
                                                     (was train_bisect8)

All timings use the on-device fori_loop chain (benchmarks/_chain.py) to
amortize the relay round trip, with a per-iteration argument perturbation
so the relay can't short-circuit bit-identical dispatches (CLAUDE.md
measurement trap).
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from efficientspeech_tpu.config import ModelConfig
from efficientspeech_tpu.utils.cache import enable_compilation_cache
from efficientspeech_tpu.utils.host_init import host_init

from benchmarks._chain import per_iter_ms

DTYPE = jnp.bfloat16


# --------------------------------------------------------------------------
# shared scaffolding
# --------------------------------------------------------------------------

def make_batch(b, n, m, rng):
    return {
        "phoneme": jnp.asarray(rng.integers(1, 150, size=(b, n)), jnp.int32),
        "phoneme_mask": jnp.zeros((b, n), bool),
        "pitch": jnp.asarray(rng.normal(size=(b, n)), jnp.float32),
        "energy": jnp.asarray(rng.normal(size=(b, n)), jnp.float32),
        "duration": jnp.full((b, n), m // n, jnp.int32),
        "mel": jnp.asarray(rng.normal(size=(b, m, 80)), jnp.float32),
        "mel_mask": jnp.zeros((b, m), bool),
    }


def init_model_params(model, batch, seed=0):
    params = host_init(lambda: model.init(
        jax.random.PRNGKey(seed), batch["phoneme"], batch["phoneme_mask"],
        pitch_target=batch["pitch"], energy_target=batch["energy"],
        duration_target=batch["duration"], train=True)["params"], seed=seed)
    return jax.tree.map(jnp.asarray, params)


def model_loss_fn(model):
    from efficientspeech_tpu.training.losses import compute_losses

    def loss_fn(p, bt):
        pred = model.apply({"params": p}, bt["phoneme"],
                           bt["phoneme_mask"], pitch_target=bt["pitch"],
                           energy_target=bt["energy"],
                           duration_target=bt["duration"], train=True)
        return compute_losses(pred, bt)["loss"]

    return loss_fn


def adamw_step_fn(loss_fn, params, batch):
    """Full train step (grad + AdamW update) as a chainable scalar fn."""
    import optax

    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    def step(s):
        bt = dict(batch, pitch=batch["pitch"] + s * 1e-6)
        grads = jax.grad(loss_fn)(params, bt)
        updates, _ = tx.update(grads, opt_state, params)
        newp = optax.apply_updates(params, updates)
        return jax.tree_util.tree_reduce(
            jnp.add, jax.tree.map(
                lambda a: jnp.sum(a.astype(jnp.float32)), newp))

    return step


def tree_sum(tree):
    return jax.tree_util.tree_reduce(
        jnp.add, jax.tree.map(lambda g: jnp.sum(g.astype(jnp.float32)),
                              tree))


def run_cases(cases, args, width=20):
    """Time each scalar case fn on an on-device chain; print ms/iter."""
    for name, fn in cases.items():
        def make(n_iters, fn=fn):
            @jax.jit
            def chain(seed):
                def body(i, c):
                    return c + fn(seed + i).astype(jnp.float32)
                return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
            return chain

        t0 = time.time()
        try:
            ms = per_iter_ms(make(1), make(args.chain),
                             lambda k: (jnp.float32(k),),
                             args.chain, reps=args.reps)
        except Exception as e:
            print(f"  {name} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        print(f"  {name:{width}s} {ms:7.2f} ms   [{time.time() - t0:.0f}s]",
              flush=True)


def grad_case(apply_fn, params, x, eps=jnp.bfloat16(1e-3)):
    """Grad-wrt-params of sum(apply(params, x + s*eps)) as a scalar fn."""
    def run(s):
        return tree_sum(jax.grad(lambda p: jnp.sum(
            apply_fn(p, x + s.astype(x.dtype) * eps)
            .astype(jnp.float32)))(params))
    return run


# --------------------------------------------------------------------------
# suites
# --------------------------------------------------------------------------

def one_hot_regulate(features, durations, max_mel_len):
    """Exact one-hot-matmul formulation of length_regulate: frames =
    onehot(idx) @ features — forward is an (M,N)@(N,C) matmul per sample
    and the BACKWARD is a matmul too (vs the gather's scatter-add).
    This experiment's winner is now ops/length_regulator.py
    via_matmul=True."""
    durations = durations.astype(jnp.int32)
    cum = jnp.cumsum(durations, axis=1)
    mel_len = cum[:, -1]
    frame_pos = jnp.arange(max_mel_len, dtype=jnp.int32)
    below = frame_pos[None, :, None] < cum[:, None, :]          # (B, M, N)
    prev = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]], 1)
    at_or_after = frame_pos[None, :, None] >= prev[:, None, :]
    onehot = (below & at_or_after).astype(features.dtype)
    frames = jnp.einsum("bmn,bnc->bmc", onehot, features,
                        preferred_element_type=jnp.float32)
    frame_valid = frame_pos[None, :] < mel_len[:, None]
    frames = jnp.where(frame_valid[:, :, None],
                       frames.astype(features.dtype), 0.0)
    return frames, frame_valid, mel_len


def suite_step(args, rng):
    from efficientspeech_tpu.models.mel_decoder import MelDecoder
    from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
    from efficientspeech_tpu.ops.length_regulator import length_regulate

    b, n, m = args.batch, args.n_phoneme, args.n_mel
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    cfg = ModelConfig.preset("tiny", max_phoneme_len=n, max_mel_len=m)
    model = Phoneme2Mel(cfg, dtype=dtype)
    batch = make_batch(b, n, m, rng)
    params = init_model_params(model, batch)
    loss_fn = model_loss_fn(model)

    dim = cfg.filter_dim
    feats = jnp.asarray(rng.normal(size=(b, n, 4 * dim)), jnp.float32)
    frames_in = jnp.asarray(rng.normal(size=(b, m, 4 * dim)), dtype)
    meldec = MelDecoder(cfg, dtype=dtype)
    md_params = jax.tree.map(jnp.asarray, host_init(
        lambda: meldec.init(jax.random.PRNGKey(1), frames_in)["params"],
        seed=1))

    def perturb(bt, s):
        return dict(bt, pitch=bt["pitch"] + s * 1e-6)

    cases = {
        "loss_fwd": lambda s: loss_fn(params, perturb(batch, s)),
        "loss_grad": lambda s: tree_sum(
            jax.grad(loss_fn)(params, perturb(batch, s))),
        "full_step": adamw_step_fn(loss_fn, params, batch),
        "reg_fwd": lambda s: jnp.sum(length_regulate(
            feats + s * 1e-6, batch["duration"], m)[0]),
        "reg_grad": lambda s: jnp.sum(jax.grad(lambda x: jnp.sum(
            length_regulate(x, batch["duration"], m)[0]))(feats + s * 1e-6)),
        "regmm_fwd": lambda s: jnp.sum(one_hot_regulate(
            feats + s * 1e-6, batch["duration"], m)[0]),
        "regmm_grad": lambda s: jnp.sum(jax.grad(lambda x: jnp.sum(
            one_hot_regulate(x, batch["duration"], m)[0]))(feats + s * 1e-6)),
        "meldec_fwd": lambda s: jnp.sum(meldec.apply(
            {"params": md_params}, frames_in + s * jnp.bfloat16(1e-3))
            .astype(jnp.float32)),
        "meldec_grad": grad_case(
            lambda p, x: meldec.apply({"params": p}, x),
            md_params, frames_in),
    }

    # numerics: one-hot regulate == gather regulate
    f1 = length_regulate(feats, batch["duration"], m)[0]
    f2 = one_hot_regulate(feats, batch["duration"], m)[0]
    print(f"one-hot vs gather regulator max|Δ| = "
          f"{float(jnp.max(jnp.abs(f1 - f2))):.2e}", flush=True)
    run_cases(cases, args, width=12)


def suite_primitives(args, rng):
    from efficientspeech_tpu.models.modules import LayerNorm
    from efficientspeech_tpu.ops.conv import conv1d

    b, m, c, k, rep = (args.batch, args.n_mel, args.dim, args.k,
                       args.repeat)
    x0 = jnp.asarray(rng.normal(size=(b, m, c)), DTYPE)
    dw_k = jnp.asarray(rng.normal(size=(rep, k, 1, c)) * 0.1, DTYPE)
    pw_k = jnp.asarray(rng.normal(size=(rep, 1, c, c)) * 0.1, DTYPE)
    ln = LayerNorm(dtype=DTYPE)
    ln_params = [ln.init(jax.random.PRNGKey(i), x0)["params"]
                 for i in range(rep)]
    ln_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *ln_params)

    def dw_chain(x, w):
        for i in range(rep):
            x = conv1d(x, w[i], padding=k // 2, groups=c)
        return x

    def pw_chain(x, w):
        for i in range(rep):
            x = conv1d(x, w[i])
        return x

    def ln_chain(x, p):
        for i in range(rep):
            x = ln.apply({"params": jax.tree.map(lambda a: a[i], p)}, x)
        return x

    def tanh_chain(x, _):
        for i in range(rep):
            x = jnp.tanh(x)
        return x

    def block_chain(x, ws):
        dw, pw, p = ws
        for i in range(rep):
            x = conv1d(x, dw[i], padding=k // 2, groups=c)
            x = conv1d(x, pw[i])
            x = jnp.tanh(x)
            x = ln.apply({"params": jax.tree.map(lambda a: a[i], p)}, x)
        return x

    prims = {
        "dw": (dw_chain, dw_k),
        "pw": (pw_chain, pw_k),
        "ln": (ln_chain, ln_stack),
        "tanh": (tanh_chain, dw_k),
        "block": (block_chain, (dw_k, pw_k, ln_stack)),
    }
    cases = {}
    for name, (fn, w) in prims.items():
        def fwd(s, fn=fn, w=w):
            return jnp.sum(fn(x0 + s.astype(DTYPE) * jnp.bfloat16(1e-3), w)
                           .astype(jnp.float32))

        def grad(s, fn=fn, w=w):
            g = jax.grad(lambda xx: jnp.sum(fn(xx, w).astype(jnp.float32)))(
                x0 + s.astype(DTYPE) * jnp.bfloat16(1e-3))
            return jnp.sum(g.astype(jnp.float32))

        cases[name + "_fwd"] = fwd
        cases[name + "_grad"] = grad
    run_cases(cases, args, width=12)


def suite_structure(args, rng):
    from efficientspeech_tpu.models.mel_decoder import MelDecoder

    b, m = args.batch, args.n_mel
    cfg = ModelConfig.preset("tiny", max_phoneme_len=128, max_mel_len=m)
    dim = cfg.filter_dim
    x_bf = jnp.asarray(rng.normal(size=(b, m, 4 * dim)), DTYPE)
    x_f32 = x_bf.astype(jnp.float32)
    mask = jnp.zeros((b, m), bool).at[:, m - 64:].set(True)

    meldec = MelDecoder(cfg, dtype=DTYPE)
    params = jax.tree.map(jnp.asarray, host_init(
        lambda: meldec.init(jax.random.PRNGKey(1), x_bf)["params"], seed=1))

    variants = {
        # the real thing, exactly as the train step calls it
        "md_mask_f32in": lambda s: meldec.apply(
            {"params": params}, x_f32 + s * 1e-6, frame_pad_mask=mask),
        # no per-depth masking
        "md_nomask_f32": lambda s: meldec.apply(
            {"params": params}, x_f32 + s * 1e-6),
        # bf16 input (no implicit f32->bf16 cast chain)
        "md_mask_bf16": lambda s: meldec.apply(
            {"params": params},
            x_bf + s.astype(DTYPE) * jnp.bfloat16(1e-3),
            frame_pad_mask=mask),
        "md_nomask_bf16": lambda s: meldec.apply(
            {"params": params},
            x_bf + s.astype(DTYPE) * jnp.bfloat16(1e-3)),
    }
    cases = {}
    for name, fn in variants.items():
        cases[name + "_fwd"] = (
            lambda s, fn=fn: jnp.sum(fn(s).astype(jnp.float32)))
        cases[name + "_grad"] = (
            lambda s, fn=fn: jnp.sum(jax.grad(
                lambda ss: jnp.sum(fn(ss).astype(jnp.float32)))(s)))
    run_cases(cases, args, width=18)


def suite_remat(args, rng):
    from efficientspeech_tpu.models.mel_decoder import MelDecoder

    b, m = args.batch, args.n_mel
    cfg = ModelConfig.preset("tiny", max_phoneme_len=128, max_mel_len=m)
    dim = cfg.filter_dim
    x_f32 = jnp.asarray(rng.normal(size=(b, m, 4 * dim)), jnp.float32)
    mask = jnp.zeros((b, m), bool).at[:, m - 64:].set(True)

    meldec = MelDecoder(cfg, dtype=DTYPE)
    params = jax.tree.map(jnp.asarray, host_init(
        lambda: meldec.init(jax.random.PRNGKey(1),
                            x_f32.astype(DTYPE))["params"], seed=1))

    def apply_plain(p, x):
        return meldec.apply({"params": p}, x, frame_pad_mask=mask)

    apply_remat = jax.checkpoint(apply_plain)
    # dots saveable: recompute everything EXCEPT matmul outputs
    apply_remat_dots = jax.checkpoint(
        apply_plain, policy=jax.checkpoint_policies.checkpoint_dots)

    variants = {
        "md_grad_x": (apply_plain, False),      # plain, grad wrt input
        "md_grad_xp": (apply_plain, True),      # plain, grad wrt input+params
        "md_remat_xp": (apply_remat, True),     # full remat
        "md_rematdots_xp": (apply_remat_dots, True),  # remat save-dots
    }
    cases = {}
    for name, (fn, wrt_params) in variants.items():
        def run(s, fn=fn, wrt_params=wrt_params):
            if wrt_params:
                g = jax.grad(lambda p, xx: jnp.sum(
                    fn(p, xx).astype(jnp.float32)), argnums=(0, 1))(
                        params, x_f32 + s * 1e-6)
                return jnp.sum(g[1]) + tree_sum(g[0])
            return jnp.sum(jax.grad(lambda xx: jnp.sum(
                fn(params, xx).astype(jnp.float32)))(x_f32 + s * 1e-6))
        cases[name] = run
    run_cases(cases, args, width=18)


def _full_step_case(args, rng, **model_kwargs):
    """Build a full AdamW train-step case for a Phoneme2Mel variant."""
    from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel

    b, n, m = args.batch, args.n_phoneme, args.n_mel
    cfg = ModelConfig.preset("tiny", max_phoneme_len=n, max_mel_len=m)
    model = Phoneme2Mel(cfg, dtype=DTYPE, **model_kwargs)
    batch = make_batch(b, n, m, rng)
    params = init_model_params(model, batch)
    loss_fn = model_loss_fn(model)
    return loss_fn, params, batch


def suite_remat_step(args, rng):
    loss_plain, p_plain, batch = _full_step_case(args, rng)
    loss_remdec, p_remdec, _ = _full_step_case(args, rng,
                                               remat_decoder=True)
    cases = {
        "step_plain": adamw_step_fn(loss_plain, p_plain, batch),
        "step_loss_remat": adamw_step_fn(jax.checkpoint(loss_plain),
                                         p_plain, batch),
        "step_remat_decoder": adamw_step_fn(loss_remdec, p_remdec, batch),
    }
    run_cases(cases, args)


def suite_fused_ln(args, rng):
    loss_f, p_f, batch = _full_step_case(args, rng,
                                         fused_decoder_norm=True)
    loss_fr, p_fr, _ = _full_step_case(args, rng, fused_decoder_norm=True,
                                       remat_decoder=True)
    cases = {
        "step_fusedln": adamw_step_fn(loss_f, p_f, batch),
        "step_remat_fusedln": adamw_step_fn(loss_fr, p_fr, batch),
    }
    run_cases(cases, args)


def suite_breakdown(args, rng):
    import flax.linen as nn

    from efficientspeech_tpu.models.acoustic import PhonemeEncoder
    from efficientspeech_tpu.models.mel_decoder import MelDecoder
    from efficientspeech_tpu.models.modules import Linear, masked_fill
    from efficientspeech_tpu.training.losses import compute_losses

    b, n, m = args.batch, args.n_phoneme, args.n_mel
    cfg = ModelConfig.preset("tiny", max_phoneme_len=n, max_mel_len=m)
    batch = make_batch(b, n, m, rng)
    dim = cfg.filter_dim
    frames_in = jnp.asarray(rng.normal(size=(b, m, 4 * dim)), DTYPE)
    frame_mask = jnp.zeros((b, m), bool)

    # --- mel decoder alone, fused LN (the current default training path) ---
    meldec = MelDecoder(cfg, dtype=DTYPE, fused_norm=True)
    md_params = jax.tree.map(jnp.asarray, host_init(
        lambda: meldec.init(jax.random.PRNGKey(1), frames_in,
                            frame_mask)["params"], seed=1))

    cases = {
        "meldec_fwd": lambda s: jnp.sum(meldec.apply(
            {"params": md_params}, frames_in + s * jnp.bfloat16(1e-3),
            frame_mask).astype(jnp.float32)),
        "meldec_grad": grad_case(
            lambda p, x: meldec.apply({"params": p}, x, frame_mask),
            md_params, frames_in),
    }

    # --- everything-but-the-decoder: full loss grad with a skip-decoder
    # (encoder + regulator + one linear to mel + losses) ---
    class SkipDecoderModel(nn.Module):
        cfg: ModelConfig
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, phoneme, pad_mask, pitch_target=None,
                     energy_target=None, duration_target=None, train=False):
            pred = PhonemeEncoder(self.cfg, dtype=self.dtype,
                                  name="encoder")(
                phoneme, pad_mask, pitch_target=pitch_target,
                energy_target=energy_target,
                duration_target=duration_target, train=train)
            mel = Linear(self.cfg.n_mel_channels, dtype=self.dtype,
                         name="mel_linear")(pred["features"])
            pred["mel"] = masked_fill(mel, ~pred["frame_valid"])
            return pred

    model_skip = SkipDecoderModel(cfg, dtype=DTYPE)
    sk_params = init_model_params(model_skip, batch)

    def skip_loss(p, bt):
        pred = model_skip.apply({"params": p}, bt["phoneme"],
                                bt["phoneme_mask"],
                                pitch_target=bt["pitch"],
                                energy_target=bt["energy"],
                                duration_target=bt["duration"], train=True)
        return compute_losses(pred, bt)["loss"]

    cases["encrest_grad"] = lambda s: tree_sum(jax.grad(skip_loss)(
        sk_params, dict(batch, pitch=batch["pitch"] + s * 1e-6)))
    run_cases(cases, args, width=14)


def suite_fused_block(args, rng):
    from efficientspeech_tpu.models.mel_decoder import MelDecoder

    b, n, m = args.batch, args.n_phoneme, args.n_mel
    cfg = ModelConfig.preset("tiny", max_phoneme_len=n, max_mel_len=m)
    dim = cfg.filter_dim
    frames_in = jnp.asarray(rng.normal(size=(b, m, 4 * dim)), DTYPE)
    frame_mask = jnp.zeros((b, m), bool)

    meldec = MelDecoder(cfg, dtype=DTYPE, fused_norm=True, fused_block=True,
                        fused_block_tg=args.tg,
                        fused_block_tg_bwd=args.tg_bwd,
                        fused_block_bwd_vmem_mb=args.bwd_vmem_mb)
    md_params = jax.tree.map(jnp.asarray, host_init(
        lambda: meldec.init(jax.random.PRNGKey(1), frames_in,
                            frame_mask)["params"], seed=1))

    loss_fn, params, batch = _full_step_case(
        args, rng, fused_decoder_norm=True, fused_decoder_block=True,
        fused_block_tg_bwd=args.tg_bwd,
        fused_block_bwd_vmem_mb=args.bwd_vmem_mb)

    cases = {
        "meldec_fb_fwd": lambda s: jnp.sum(meldec.apply(
            {"params": md_params}, frames_in + s * jnp.bfloat16(1e-3),
            frame_mask).astype(jnp.float32)),
        "meldec_fb_grad": grad_case(
            lambda p, x: meldec.apply({"params": p}, x, frame_mask),
            md_params, frames_in),
        "step_fusedblock": adamw_step_fn(loss_fn, params, batch),
    }
    run_cases(cases, args, width=16)


SUITES = {
    "step": suite_step,
    "primitives": suite_primitives,
    "structure": suite_structure,
    "remat": suite_remat,
    "remat-step": suite_remat_step,
    "fused-ln": suite_fused_ln,
    "breakdown": suite_breakdown,
    "fused-block": suite_fused_block,
}


def main():
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--suite", default="step", choices=sorted(SUITES))
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--n-phoneme", type=int, default=128)
    parser.add_argument("--n-mel", type=int, default=1152)
    parser.add_argument("--chain", type=int, default=24)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--precision", default="bf16",
                        choices=["bf16", "f32"],
                        help="step suite only; the others are bf16")
    # primitives suite
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--repeat", type=int, default=4,
                        help="primitives: apply each this many times "
                             "(the decoder has 4 dw+pw pairs)")
    # fused-block suite
    parser.add_argument("--tg", type=int, default=4)
    parser.add_argument("--tg-bwd", type=int, default=2)
    parser.add_argument("--bwd-vmem-mb", type=int, default=0,
                        help="raise Mosaic's scoped-vmem cap for the "
                             "backward kernel (0 = default 16 MB)")
    args = parser.parse_args()

    enable_compilation_cache()
    print(f"suite {args.suite}: batch={args.batch} n={args.n_phoneme} "
          f"m={args.n_mel} chain={args.chain}", flush=True)
    SUITES[args.suite](args, np.random.default_rng(0))


if __name__ == "__main__":
    main()
