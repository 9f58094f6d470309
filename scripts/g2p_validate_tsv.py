#!/usr/bin/env python3
"""Mechanical validator for authored G2P TSVs (word<ws>ARPAbet phones).

Checks every entry: word is [a-z]+ and encodable (length limits), each
phone is a legal stressed/unstressed ARPAbet token, vowels carry exactly
one stress digit, the word has exactly one primary (1) stress, and there
are no duplicate words.  Used while authoring training/eval lexicons so
format errors can't reach the model (neural G2P training data is built
from these files — text/g2p_data.py).
"""

import re
import sys
from collections import Counter

sys.path.insert(0, ".")

from efficientspeech_tpu.text.cmudict_phones import ARPABET_SET  # noqa: E402
from efficientspeech_tpu.text import g2p_model as M  # noqa: E402

VOWELS = {"AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
          "IH", "IY", "OW", "OY", "UH", "UW"}


def check(path):
    words = Counter()
    bad = 0
    with open(path) as f:
        for ln, line in enumerate(f, 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            w, phones = parts[0], parts[1:]

            def err(msg):
                nonlocal bad
                bad += 1
                print(f"{path}:{ln}: {w}: {msg}")

            words[w] += 1
            if not re.fullmatch(r"[a-z]+", w):
                err("word not [a-z]+")
            if M.encode_word(w) is None:
                err(f"word not encodable (len {len(w)} > {M.MAX_SRC}?)")
            if M.encode_phones(phones) is None and len(phones) + 1 > M.MAX_TGT:
                err(f"{len(phones)} phones > MAX_TGT-1")
            if not phones:
                err("no phones")
                continue
            n_primary = 0
            for p in phones:
                base, digit = p.rstrip("012"), p[len(p.rstrip("012")):]
                if base not in ARPABET_SET and p not in ARPABET_SET:
                    err(f"unknown phone {p}")
                    continue
                if base in VOWELS:
                    if digit not in ("0", "1", "2"):
                        err(f"vowel {p} missing stress digit")
                    elif digit == "1":
                        n_primary += 1
                elif digit:
                    err(f"consonant {p} carries a stress digit")
            if n_primary != 1:
                err(f"{n_primary} primary stresses")
    dups = [w for w, c in words.items() if c > 1]
    if dups:
        bad += len(dups)
        print(f"{path}: {len(dups)} duplicate words: {dups[:20]}")
    print(f"{path}: {sum(words.values())} entries, {bad} problems")
    return bad


if __name__ == "__main__":
    sys.exit(1 if sum(check(p) for p in sys.argv[1:]) else 0)
