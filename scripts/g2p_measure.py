#!/usr/bin/env python3
"""Canonical G2P measurement runner with a blind-set ledger.

Every measurement of a blind set (tests/data/g2p_blind*.tsv) is recorded
in tests/data/g2p_ledger.jsonl — set name, tsv sha256, git SHA (+dirty
flag), timestamp, engine, scores.  The ledger is committed alongside the
sets; tests/test_g2p_per.py::test_blind_ledger_protocol asserts the
CURRENT blind set (highest-numbered) has entries from at most ONE
sanctioned measurement session, so an accidental evaluation during
development can no longer happen silently (VERDICT r4 next #6 — the
round-4 session-8 disclosure incident becomes mechanically detectable).

Measuring the CURRENT blind set additionally requires --sanction; the
runner refuses otherwise (prevention on top of detection).

Usage:
    python scripts/g2p_measure.py tests/data/g2p_dev.tsv
    python scripts/g2p_measure.py tests/data/g2p_blind5.tsv --sanction \
        --note "round-5 sanctioned measurement"
"""

import argparse
import datetime
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "tests", "data", "g2p_ledger.jsonl")
DATA_DIR = os.path.join(REPO, "tests", "data")

sys.path.insert(0, REPO)


def current_blind_set() -> str:
    """Highest-numbered g2p_blind*.tsv — the one honest generalization
    set; everything below it is burned (tuned-on retention)."""
    best, best_n = None, -1
    for name in os.listdir(DATA_DIR):
        m = re.fullmatch(r"g2p_blind(\d*)\.tsv", name)
        if m:
            n = int(m.group(1) or "1")
            if n > best_n:
                best, best_n = name, n
    return best


def git_state():
    try:
        sha = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=REPO).decode().strip()
        dirty = bool(subprocess.check_output(
            ["git", "status", "--porcelain"], cwd=REPO).decode().strip())
        return sha, dirty
    except (subprocess.CalledProcessError, FileNotFoundError):
        return "unknown", True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tsv", help="eval lexicon (word<TAB/space>phones)")
    ap.add_argument("--engine", default="front",
                    choices=["front", "rules", "neural"],
                    help="front door G2p() / bare rule L2S / neural model")
    ap.add_argument("--stress", action="store_true",
                    help="stress-sensitive scoring (default strips digits)")
    ap.add_argument("--worst", type=int, default=10,
                    help="print the N worst cases")
    ap.add_argument("--sanction", action="store_true",
                    help="required to measure the CURRENT blind set; "
                         "marks the ledger entry as the sanctioned one")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    from efficientspeech_tpu.text.g2p import G2p, rule_g2p
    from efficientspeech_tpu.text.g2p_eval import (
        load_eval_lexicon, phone_error_rate)

    base = os.path.basename(args.tsv)
    is_blind = re.fullmatch(r"g2p_blind\d*\.tsv", base) is not None
    current = current_blind_set()
    if base == current and not args.sanction:
        raise SystemExit(
            f"REFUSED: {base} is the CURRENT blind set.  Measuring it "
            "burns it — pass --sanction for the one sanctioned "
            "measurement (recorded in the ledger; "
            "test_blind_ledger_protocol then enforces it stays unique).")

    if args.engine == "front":
        fn = G2p()
    elif args.engine == "rules":
        fn = rule_g2p
    else:
        from efficientspeech_tpu.text.neural_g2p import load_default
        model = load_default()
        if model is None:
            raise SystemExit("neural checkpoint missing/unreadable")
        fn = lambda w: model(w)[0]  # NeuralG2p returns (phones, conf)

    lex = load_eval_lexicon(args.tsv)
    per, acc, cases = phone_error_rate(fn, lex,
                                       ignore_stress=not args.stress)
    mode = "stress-sensitive" if args.stress else "stress-insensitive"
    print(f"{base} [{args.engine}, {mode}] n={len(lex)}  "
          f"PER {per:.4f}  word-acc {acc:.4f}")
    for word, ref, pred, d in cases[:args.worst]:
        if d:
            print(f"  {word:24s} ref: {ref:40s} got: {pred}")

    if is_blind:
        sha, dirty = git_state()
        with open(args.tsv, "rb") as f:
            tsv_sha = hashlib.sha256(f.read()).hexdigest()[:16]
        entry = {
            "set": base,
            "tsv_sha256": tsv_sha,
            "git_sha": sha,
            "git_dirty": dirty,
            "utc": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
            "engine": args.engine,
            "stress": args.stress,
            "n": len(lex),
            "per": round(per, 4),
            "word_acc": round(acc, 4),
            "sanctioned": bool(args.sanction),
            "note": args.note,
        }
        with open(LEDGER, "a") as f:
            f.write(json.dumps(entry) + "\n")
        print(f"ledger: recorded in {os.path.relpath(LEDGER, REPO)} "
              f"(git {sha[:9]}{'+dirty' if dirty else ''})")


if __name__ == "__main__":
    main()
