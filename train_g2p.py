#!/usr/bin/env python3
"""Train the neural G2P fallback (VERDICT r4 next #1).

The reference's OOV path is the pre-trained ``g2p_en`` seq2seq
(reference: synthesize.py:8,33-35); this trains our own compact
char→phone transformer (text/g2p_model.py, ~820k params) on the
legitimately-burned word→pron pairs (text/g2p_data.py), validates on
the burned blind4 set, and exports the best checkpoint as a plain .npz
the numpy serving path (text/neural_g2p.py) loads.

    python train_g2p.py --steps 6000 --batch-size 256 \
        --out efficientspeech_tpu/text/data/neural_g2p_en.npz

Runs on whatever backend jax has (TPU under the axon relay, CPU with
JAX_PLATFORMS=cpu); the model is small enough that either works.
"""

import argparse
import json
import os
import time


def get_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--label-smoothing", type=float, default=0.1)
    ap.add_argument("--weight-decay", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gold-repeat", type=int, default=3)
    ap.add_argument("--n-compounds", type=int, default=8000)
    ap.add_argument("--n-prefixed", type=int, default=6000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--eval-set", default="tests/data/g2p_blind4.tsv",
                    help="validation lexicon (round-5 initial training "
                         "used blind4; once blind6 froze, blind5 is the "
                         "calibration set and blind4 may train via "
                         "--include-blind4; NEVER the current gate set)")
    ap.add_argument("--include-blind4", action="store_true",
                    help="fold blind4 into the gold training pairs "
                         "(legitimate only with blind5 as --eval-set "
                         "and blind6 frozen as the gate)")
    ap.add_argument("--out", default="efficientspeech_tpu/text/data/"
                                     "neural_g2p_en.npz")
    ap.add_argument("--log", default=None, help="metrics jsonl path")
    return ap.parse_args()


def evaluate_neural(params_np, lexicon, batch: int = 128):
    """Neural-only word-acc / PER (stress-insensitive) via the SAME
    numpy greedy decode serving uses."""
    import numpy as np

    from efficientspeech_tpu.text import g2p_model as M
    from efficientspeech_tpu.text.g2p_eval import edit_distance, strip_stress

    words = [w for w in lexicon if M.encode_word(w) is not None]
    total_d = total_ref = exact = 0
    for i in range(0, len(words), batch):
        chunk = words[i: i + batch]
        src = np.stack([M.encode_word(w) for w in chunk])
        toks, _ = M.greedy_decode(params_np, src)
        for j, w in enumerate(chunk):
            pred = strip_stress(M.tokens_to_phones(toks[j]))
            ref = strip_stress(lexicon[w])
            d = edit_distance(pred, ref)
            total_d += d
            total_ref += len(ref)
            exact += d == 0
    skipped = len(lexicon) - len(words)
    return (total_d / max(total_ref, 1), exact / max(len(lexicon), 1),
            skipped)


def main():
    args = get_args()

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from efficientspeech_tpu.text import g2p_data as D
    from efficientspeech_tpu.text import g2p_model as M
    from efficientspeech_tpu.text.g2p_eval import load_eval_lexicon

    pairs = D.build_pairs(gold_repeat=args.gold_repeat,
                          n_compounds=args.n_compounds,
                          n_prefixed=args.n_prefixed, seed=args.seed,
                          include_blind4=args.include_blind4)
    src, tgt = D.encode_pairs(pairs)
    n = len(src)
    print(f"training pairs: {n} rows "
          f"({sum(1 for _, _, g in pairs if g)} gold rows, "
          f"{len({w for w, _, _ in pairs})} unique words)")

    params = M.init_params(args.seed)
    print(f"model: {M.n_params(params)} params "
          f"(d={M.D_MODEL}, enc={M.N_ENC}, dec={M.N_DEC})")
    params_dev = {k: jnp.asarray(v) for k, v in params.items()}

    warmup = min(args.warmup, max(args.steps // 2, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, args.lr * 1e-2)
    tx = optax.adamw(sched, b1=0.9, b2=0.98,
                     weight_decay=args.weight_decay,
                     mask={k: v.ndim > 1 for k, v in params.items()})
    opt_state = tx.init(params_dev)

    ls = args.label_smoothing

    def loss_fn(p, s, t, rng):
        r1, r2 = jax.random.split(rng)
        mem, mask = M.encoder(p, s, jnp, dropout=args.dropout, rng=r1)
        tin = jnp.concatenate(
            [jnp.full((t.shape[0], 1), M.PHONE_BOS, jnp.int32),
             t[:, :-1]], axis=1)
        logits = M.decoder_logits(p, mem, mask, tin, jnp,
                                  dropout=args.dropout, rng=r2)
        valid = (t != M.PHONE_PAD).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits)
        onehot = jax.nn.one_hot(t, M.N_PHONES)
        target = onehot * (1 - ls) + ls / M.N_PHONES
        nll = -(target * logp).sum(-1)
        return (nll * valid).sum() / jnp.maximum(valid.sum(), 1.0)

    @jax.jit
    def train_step(p, o, s, t, rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, s, t, rng)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    val_lex = load_eval_lexicon(args.eval_set)
    rng_np = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    perm = rng_np.permutation(n)
    cursor = 0
    best = {"acc": -1.0, "per": 1.0, "step": 0}
    logf = open(args.log, "a") if args.log else None
    t0 = time.time()

    for step in range(1, args.steps + 1):
        if cursor + args.batch_size > n:
            perm = rng_np.permutation(n)
            cursor = 0
        idx = perm[cursor: cursor + args.batch_size]
        cursor += args.batch_size
        key, sub = jax.random.split(key)
        params_dev, opt_state, loss = train_step(
            params_dev, opt_state, jnp.asarray(src[idx]),
            jnp.asarray(tgt[idx]), sub)

        if step % args.eval_every == 0 or step == args.steps:
            loss = float(jax.device_get(loss))
            params_np = {k: np.asarray(jax.device_get(v))
                         for k, v in params_dev.items()}
            per, acc, skipped = evaluate_neural(params_np, val_lex)
            line = {"step": step, "loss": round(loss, 4),
                    "val_per": round(per, 4), "val_acc": round(acc, 4),
                    "val_skipped_long": skipped,
                    "lr": round(float(sched(step)), 6),
                    "elapsed_s": round(time.time() - t0, 1)}
            print(json.dumps(line), flush=True)
            if logf:
                logf.write(json.dumps(line) + "\n")
                logf.flush()
            if acc > best["acc"]:
                best = {"acc": acc, "per": per, "step": step}
                os.makedirs(os.path.dirname(args.out) or ".",
                            exist_ok=True)
                meta = {"d_model": M.D_MODEL, "n_enc": M.N_ENC,
                        "n_dec": M.N_DEC, "n_heads": M.N_HEADS,
                        "d_ff": M.D_FF, "max_src": M.MAX_SRC,
                        "max_tgt": M.MAX_TGT,
                        "val_set": os.path.basename(args.eval_set),
                        "val_acc": round(acc, 4), "val_per": round(per, 4),
                        "step": step, "seed": args.seed,
                        "n_params": M.n_params(params_np)}
                np.savez(args.out,
                         __meta=np.frombuffer(
                             json.dumps(meta).encode(), dtype=np.uint8),
                         **{f"p_{k}": v for k, v in params_np.items()})
                print(f"  saved {args.out} (val acc {acc:.4f})")

    print(f"best: step {best['step']} val_acc {best['acc']:.4f} "
          f"val_per {best['per']:.4f}")


if __name__ == "__main__":
    main()
