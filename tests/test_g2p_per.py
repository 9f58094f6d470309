"""Rule-G2P phone error rate (VERDICT round 1, item 5).

The reference's OOV fallback is the neural g2p_en (synthesize.py:33-35);
ours is a self-contained rule L2S.  This quantifies the drift against a
held-out hand-curated CMUDict-style eval lexicon (tests/data/g2p_eval.tsv)
that the rules never consult.  Measured round 2: PER 0.048 (stress-
insensitive), word accuracy 0.826 — recorded in STATUS.md.
"""

import os

from efficientspeech_tpu.text.g2p import rule_g2p
from efficientspeech_tpu.text.g2p_eval import (
    edit_distance,
    load_eval_lexicon,
    phone_error_rate,
    strip_stress,
)

EVAL = os.path.join(os.path.dirname(__file__), "data", "g2p_eval.tsv")


def test_edit_distance():
    assert edit_distance(list("abc"), list("abc")) == 0
    assert edit_distance(list("abc"), list("axc")) == 1
    assert edit_distance([], list("ab")) == 2
    assert edit_distance(list("kat"), list("akt")) == 2


def test_rule_g2p_per_bound():
    """Segmental PER must stay under 8% and word accuracy above 75% on the
    held-out eval lexicon (measured 4.8% / 82.6%)."""
    lex = load_eval_lexicon(EVAL)
    assert len(lex) >= 150
    per, acc, cases = phone_error_rate(rule_g2p, lex, ignore_stress=True)
    assert per < 0.08, f"PER regressed: {per:.3f}; worst: {cases[:5]}"
    assert acc > 0.75, f"word accuracy regressed: {acc:.3f}"


def test_rule_g2p_emits_valid_arpabet():
    """Every emitted phone must be a valid ARPAbet symbol (else tokenizer
    silently drops it)."""
    from efficientspeech_tpu.text.cmudict_phones import ARPABET_SET

    valid = set(ARPABET_SET)
    lex = load_eval_lexicon(EVAL)
    for word in lex:
        for p in rule_g2p(word):
            assert p in valid, (word, p)


def test_rule_g2p_stable_classes():
    """Spot-check the rule classes the round-1 judge called out."""
    checks = {
        "pillow": "P IH L OW",        # doubled consonant + final -ow
        "famous": "F EY M AH S",      # -ous  (EY via open syllable? fam-)
        "nation": "N EY SH AH N",     # -ation
        "kitten": "K IH T AH N",      # -en
        "helped": "HH EH L P T",      # -ed devoiced
        "wanted": "W AA N T IH D",    # -ed after t
        "music": "M Y UW Z IH K",     # long u + intervocalic s
        "cage": "K EY JH",            # soft g
    }
    for word, ref in checks.items():
        pred = " ".join(strip_stress(rule_g2p(word)))
        # allow a 1-phone slip on the two hardest (vowel quality)
        dist = edit_distance(pred.split(), ref.split())
        assert dist <= (1 if word == "famous" else 0), (word, ref, pred)
