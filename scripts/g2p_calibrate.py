#!/usr/bin/env python3
"""Calibrate the neural-G2P routing threshold on a burned blind set.

The front door (text/g2p.py) routes an OOV word to the neural model
when the decode confidence (mean per-token log-prob) clears a
threshold, else falls back to the rule L2S.  This sweeps the threshold
over the observed confidence range and picks the one maximizing FRONT
DOOR word accuracy on the calibration set (round-5 initial: blind4;
after blind6 froze: blind5 — NEVER the current gate set, which this
script refuses mechanically), then stores it in the primary
checkpoint's npz meta (``route_threshold``, plus the ``beam`` width
used), which text/neural_g2p.py reads at load.

    python scripts/g2p_calibrate.py [--npz PATH] [--beam 4] [--write]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BLIND4 = os.path.join(REPO, "tests", "data", "g2p_blind4.tsv")


class _Recorder:
    """Stands in for the neural model inside G2p: records which words
    reach the neural stage, always declines (so the chain result is
    the rules fallback those words would otherwise get)."""

    def __init__(self):
        self.reached = set()

    def confident(self, word):
        self.reached.add(word)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default=os.path.join(
        REPO, "efficientspeech_tpu", "text", "data", "neural_g2p_en.npz"))
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--eval-set", default=BLIND4)
    ap.add_argument("--write", action="store_true",
                    help="store the winning threshold in the npz meta")
    args = ap.parse_args()

    # mechanical guard: never calibrate against the current gate set
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "g2p_measure", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "g2p_measure.py"))
    gm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gm)
    cur = gm.current_blind_set()
    if os.path.basename(args.eval_set) == cur:
        raise SystemExit(
            f"REFUSED: {cur} is the CURRENT blind gate set — calibrating "
            "against it burns it.  Author the next blind set first.")

    from efficientspeech_tpu.text.g2p import G2p
    from efficientspeech_tpu.text.g2p_eval import (
        load_eval_lexicon, edit_distance, strip_stress)
    from efficientspeech_tpu.text.neural_g2p import NeuralG2p

    lex = load_eval_lexicon(args.eval_set)
    g = G2p(use_neural=False)
    rec = _Recorder()
    g._neural = rec
    pre = {w: g(w) for w in lex}          # chain result sans neural

    model = NeuralG2p(args.npz, beam=args.beam)
    neural = {w: model(w) for w in rec.reached}

    def scores(threshold):
        d = r = e = 0
        for w, ref in lex.items():
            pred = pre[w]
            if w in neural:
                ph, conf = neural[w]
                if ph and conf >= threshold:
                    pred = ph
            ref_s, p_s = strip_stress(ref), strip_stress(pred)
            dd = edit_distance(p_s, ref_s)
            d += dd
            r += len(ref_s)
            e += dd == 0
        return e / len(lex), d / r

    confs = sorted(c for _, c in neural.values() if np.isfinite(c))
    grid = [-10.0] + [confs[int(q * (len(confs) - 1))]
                      for q in np.linspace(0, 0.9, 28)]
    best = None
    for t in grid:
        acc, per = scores(t)
        n_routed = sum(1 for w, (ph, c) in neural.items()
                       if ph and c >= t)
        print(f"  t={t:8.4f}  acc {acc:.4f}  PER {per:.4f}  "
              f"routed {n_routed}/{len(neural)}")
        if best is None or (acc, -per) > (best[1], -best[2]):
            best = (t, acc, per)
    t, acc, per = best
    print(f"best threshold {t:.4f}: front-door acc {acc:.4f} PER {per:.4f} "
          f"on {os.path.basename(args.eval_set)} (beam {args.beam}, "
          f"{len(model.params_list)} ensemble member(s))")

    if args.write:
        z = np.load(args.npz)
        meta = json.loads(bytes(z["__meta"]).decode())
        meta["route_threshold"] = round(float(t), 4)
        meta["beam"] = args.beam
        meta["calibration"] = {
            "set": os.path.basename(args.eval_set),
            "front_acc": round(acc, 4), "front_per": round(per, 4),
            "ensemble": len(model.params_list)}
        arrays = {k: z[k] for k in z.files if k != "__meta"}
        np.savez(args.npz, __meta=np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8), **arrays)
        print(f"wrote route_threshold={t:.4f} beam={args.beam} "
              f"into {args.npz}")


if __name__ == "__main__":
    main()
