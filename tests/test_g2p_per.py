"""G2P quality gates (VERDICT round-2 next #4; round-3 next #1).

The reference's front door is lexicon-first with the neural g2p_en as OOV
fallback (synthesize.py:19-64); ours is builtin-lexicon + morphological
derivation + compound split + rule L2S (text/g2p.py, text/
builtin_lexicon.py).

FOUR measurement sets, with different meanings (round-4 methodology —
each blind set is burned the moment its error classes drive tuning,
and the next one is authored fresh):

- tests/data/g2p_dev.tsv (630 entries) — the DEVELOPMENT set.  Rules and
  lexicon additions were tuned against it through round 3 (49.7% of its
  words are in the shipped lexicon), so its numbers measure retention,
  NOT generalization.  Round-3 measured: front door PER 0.0026 /
  word-acc 0.990 (stress-insensitive), 0.0096 / 0.962 (stress-sensitive);
  rules alone PER 0.084 / word-acc 0.724.

- tests/data/g2p_blind.tsv (545 entries) — authored blind in round-4
  session 1 and measured once (front door 70.6% / PER 8.86%
  stress-insensitive).  Its documented error classes then drove the
  round-4 session-5 rule batch, so from that session on it is a
  TUNED-ON set (still lexicon-disjoint, so it measures the OOV rules
  path, but not blind generalization).  Post-tuning: front door 80.7% /
  PER 5.08% (stress-sensitive 76.3% / 6.74%), rules-only 72.3%.

- tests/data/g2p_blind2.tsv (513 entries) — authored fresh after the
  session-5 rule batch froze and measured once at 62.0% / PER 9.50%
  (stress-insensitive).  Its error classes then drove the round-4
  session-8 rule batches, so it too is now a TUNED-ON retention set.
  Post-tuning: front door 80.51% / PER 4.53% (stress-sensitive 75.44%
  / 6.24%), rules-only 78.75% / 5.04%.

- tests/data/g2p_blind3.tsv (890 entries) — authored fresh after the
  session-8 batches froze and measured once at 51.35% / PER 12.61%
  (harder vocabulary by construction: French -ique/-esque/-ette,
  -ator agentives, loanword flora/fauna/foods).  Its error classes
  then drove the session's French/agentive batches, so it too is a
  TUNED-ON retention set now.  Post-tuning: 57.19% / PER 10.40%.

- tests/data/g2p_blind4.tsv (592 entries) — authored fresh AFTER the
  French/agentive batches froze and measured once at 50.51% / PER
  13.37% (2026-08-19) — the round-4 honest OOV number.  In round 5 it
  became the neural G2P's calibration/dev set (threshold + ensemble
  selection were tuned against it), so it is a TUNED-ON set now.
  Post-calibration: front door 65.54% / PER 8.67% (stress-sensitive
  61.15% / 10.90%).  Blind1–3 additionally became neural TRAINING
  data in round 5 (their retention is now ~95–99%).

- tests/data/g2p_blind5.tsv (596 entries) — authored and frozen
  (commit e0b2581) BEFORE the neural G2P existed and measured ONCE
  clean (2026-08-20, ledger-recorded): front door 71.14% / PER 7.55
  (stress-sensitive 68.79% / 9.56), neural-only 74.33% / 7.01,
  rules-only 45.81% / 14.19 — clearing the round-4 VERDICT gate
  (≥60% / ≤10%).  After blind6 froze it became the CALIBRATION set
  for the round-5 second cycle (routing threshold sweep → fully open,
  neural-first reorder, ensemble reselection, blind4-in-training),
  so it is a TUNED-ON set now.  Post-tuning: 74.16% / PER 6.52
  (stress 70.97% / 8.35).  It still never enters training data
  (excluded_words()).

- tests/data/g2p_blind6.tsv (566 entries) — the CURRENT blind
  generalization set (commit fc442b7), authored from CMUdict
  conventions without running the G2P, mechanically disjoint from the
  lexicon, dev, blind1–5, the gold training TSVs, and all augmented
  training forms.  Measured ONCE, sanctioned (see
  test_front_door_blind6_bound for the numbers).  Failures on THIS
  set MUST NOT drive any tuning; doing so requires authoring blind
  set #7 and re-measuring.
"""

import os

from efficientspeech_tpu.text.g2p import G2p, _resolve_homograph, rule_g2p
from efficientspeech_tpu.text.g2p_eval import (
    edit_distance,
    load_eval_lexicon,
    phone_error_rate,
    strip_stress,
)

EVAL = os.path.join(os.path.dirname(__file__), "data", "g2p_dev.tsv")
BLIND = os.path.join(os.path.dirname(__file__), "data", "g2p_blind.tsv")
BLIND2 = os.path.join(os.path.dirname(__file__), "data", "g2p_blind2.tsv")
BLIND3 = os.path.join(os.path.dirname(__file__), "data", "g2p_blind3.tsv")
BLIND4 = os.path.join(os.path.dirname(__file__), "data", "g2p_blind4.tsv")
BLIND5 = os.path.join(os.path.dirname(__file__), "data", "g2p_blind5.tsv")
BLIND6 = os.path.join(os.path.dirname(__file__), "data", "g2p_blind6.tsv")


def test_edit_distance():
    assert edit_distance(list("abc"), list("abc")) == 0
    assert edit_distance(list("abc"), list("axc")) == 1
    assert edit_distance([], list("ab")) == 2
    assert edit_distance(list("kat"), list("akt")) == 2


def test_front_door_dev_bound():
    """DEV-set retention gate (memorization guard, NOT generalization —
    the set was tuned on; see module docstring).  Measured 0.26% / 99.0%
    after the round-3 session-10 rule pass."""
    lex = load_eval_lexicon(EVAL)
    assert len(lex) >= 500
    per, acc, cases = phone_error_rate(G2p(), lex, ignore_stress=True)
    assert per <= 0.008, f"PER regressed: {per:.3f}; worst: {cases[:5]}"
    assert acc >= 0.975, f"word accuracy regressed: {acc:.3f}"


def test_front_door_dev_stress_bound():
    """DEV-set stress-sensitive retention: measured PER 0.96% /
    acc 96.2%; enforce with margin."""
    lex = load_eval_lexicon(EVAL)
    per, acc, cases = phone_error_rate(G2p(), lex, ignore_stress=False)
    assert per <= 0.015, f"stress PER regressed: {per:.3f}; {cases[:5]}"
    assert acc >= 0.94, f"stress word accuracy regressed: {acc:.3f}"


def test_rule_g2p_dev_bound():
    """The bare rule L2S (every lookup stripped away) on the dev set:
    measured PER 8.4% / acc 72.4%."""
    lex = load_eval_lexicon(EVAL)
    per, acc, cases = phone_error_rate(rule_g2p, lex, ignore_stress=True)
    assert per < 0.10, f"rule PER regressed: {per:.3f}; worst: {cases[:5]}"
    assert acc > 0.68, f"rule word accuracy regressed: {acc:.3f}"


def test_blind_set_is_disjoint():
    """Validity conditions, enforced mechanically: both measurement sets
    have zero overlap with the dev set and the shipped builtin lexicon,
    and blind2 is additionally disjoint from blind1.  If a measured word
    is ever added to the lexicon this fails, flagging the contamination
    the round-3 VERDICT called out on the dev set."""
    from efficientspeech_tpu.text.builtin_lexicon import get_builtin_lexicon

    blind = load_eval_lexicon(BLIND)
    blind2 = load_eval_lexicon(BLIND2)
    blind3 = load_eval_lexicon(BLIND3)
    blind4 = load_eval_lexicon(BLIND4)
    blind5 = load_eval_lexicon(BLIND5)
    blind6 = load_eval_lexicon(BLIND6)
    assert len(blind) >= 500 and len(blind2) >= 500 \
        and len(blind3) >= 500 and len(blind4) >= 500 \
        and len(blind5) >= 500 and len(blind6) >= 500
    dev = load_eval_lexicon(EVAL)
    lex = get_builtin_lexicon()
    sets = [("blind1", set(blind)), ("blind2", set(blind2)),
            ("blind3", set(blind3)), ("blind4", set(blind4)),
            ("blind5", set(blind5)), ("blind6", set(blind6))]
    for name, s_ in sets:
        assert not s_ & set(dev), (name, sorted(s_ & set(dev))[:10])
        assert not s_ & set(lex), (name, sorted(s_ & set(lex))[:10])
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = sets[i][1] & sets[j][1]
            assert not inter, (sets[i][0], sets[j][0], sorted(inter)[:10])


def test_front_door_blind_bound():
    """Blind-set-#1 gates.  NOTE: tuned-on from round-4 session 5 (its
    error classes drove that rule batch) — these are OOV-path RETENTION
    gates now, not generalization.  After the session-8 batches: PER
    3.53% / acc 86.61% stress-insensitive, 5.01% / 82.94%
    stress-sensitive."""
    blind = load_eval_lexicon(BLIND)
    per, acc, cases = phone_error_rate(G2p(), blind, ignore_stress=True)
    assert per <= 0.01, f"blind1 PER regressed: {per:.3f}; {cases[:5]}"
    assert acc >= 0.98, f"blind1 word accuracy regressed: {acc:.3f}"
    per_s, acc_s, _ = phone_error_rate(G2p(), blind, ignore_stress=False)
    assert per_s <= 0.015, f"blind1 stress PER regressed: {per_s:.3f}"
    assert acc_s >= 0.97, f"blind1 stress accuracy regressed: {acc_s:.3f}"


def test_rule_g2p_blind_bound():
    """Rules-only on blind set #1 (tuned-on): measured 79.82% / 5.58%
    after the session-8 batches."""
    blind = load_eval_lexicon(BLIND)
    per, acc, cases = phone_error_rate(rule_g2p, blind, ignore_stress=True)
    assert per <= 0.065, f"blind1 rule PER regressed: {per:.3f}; {cases[:5]}"
    assert acc >= 0.77, f"blind1 rule accuracy regressed: {acc:.3f}"


def test_front_door_blind2_bound():
    """Blind-set-#2 gates.  NOTE: tuned-on from round-4 session 8 (its
    error classes drove that session's rule batches) — OOV-path
    RETENTION gates now, not generalization.  Post-tuning measured:
    PER 4.53% / acc 80.51% stress-insensitive, 6.24% / 75.44%
    stress-sensitive."""
    blind2 = load_eval_lexicon(BLIND2)
    per, acc, cases = phone_error_rate(G2p(), blind2, ignore_stress=True)
    assert per <= 0.01, f"blind2 PER regressed: {per:.3f}; {cases[:5]}"
    assert acc >= 0.98, f"blind2 word accuracy regressed: {acc:.3f}"
    per_s, acc_s, _ = phone_error_rate(G2p(), blind2, ignore_stress=False)
    assert per_s <= 0.015, f"blind2 stress PER regressed: {per_s:.3f}"
    assert acc_s >= 0.97, f"blind2 stress accuracy regressed: {acc_s:.3f}"


def test_rule_g2p_blind2_bound():
    """Rules-only on blind set #2 (tuned-on): measured 78.75% / 5.04%."""
    blind2 = load_eval_lexicon(BLIND2)
    per, acc, cases = phone_error_rate(rule_g2p, blind2,
                                       ignore_stress=True)
    assert per <= 0.062, f"blind2 rule PER regressed: {per:.3f}; {cases[:5]}"
    assert acc >= 0.75, f"blind2 rule accuracy regressed: {acc:.3f}"


def test_front_door_blind3_bound():
    """Blind-set-#3 gates.  NOTE: tuned-on from the session-8 French/
    agentive batches — OOV-path RETENTION gates now.  Post-tuning:
    PER 10.40% / acc 57.19% stress-insensitive."""
    blind3 = load_eval_lexicon(BLIND3)
    per, acc, cases = phone_error_rate(G2p(), blind3, ignore_stress=True)
    assert per <= 0.01, f"blind3 PER regressed: {per:.3f}; {cases[:5]}"
    assert acc >= 0.98, f"blind3 word accuracy regressed: {acc:.3f}"


def test_front_door_blind4_bound():
    """Blind-set-#4 gates.  NOTE: tuned-on from round 5 (the neural
    G2P's routing threshold and ensemble were calibrated against it) —
    RETENTION gates now, not generalization.  Post-calibration
    measured: PER 8.67% / acc 65.54% stress-insensitive, 10.90% /
    61.15% stress-sensitive."""
    blind4 = load_eval_lexicon(BLIND4)
    per, acc, cases = phone_error_rate(G2p(), blind4, ignore_stress=True)
    assert per <= 0.01, f"blind4 PER regressed: {per:.3f}; {cases[:5]}"
    assert acc >= 0.98, f"blind4 word accuracy regressed: {acc:.3f}"
    per_s, acc_s, _ = phone_error_rate(G2p(), blind4, ignore_stress=False)
    assert per_s <= 0.125, f"blind4 stress PER regressed: {per_s:.3f}"
    assert acc_s >= 0.58, f"blind4 stress accuracy regressed: {acc_s:.3f}"


def test_front_door_blind5_bound():
    """Blind-set-#5 gates.  NOTE: tuned-on from the round-5 blind6
    cycle (it became the calibration set: routing threshold sweep,
    ensemble selection, the neural-first reorder, and blind4-in-
    training were all selected on it) — RETENTION gates now, not
    generalization.  Its sanctioned pre-tuning measurement (2026-08-20,
    ledger): front door 71.14% / PER 7.55 stress-insensitive.
    Post-tuning measured: 74.16% / 6.52 (stress 70.97% / 8.35).
    The honest generalization number lives on blind6."""
    blind5 = load_eval_lexicon(BLIND5)
    per, acc, cases = phone_error_rate(G2p(), blind5, ignore_stress=True)
    assert per <= 0.075, f"blind5 PER regressed: {per:.3f}; {cases[:5]}"
    assert acc >= 0.71, f"blind5 word accuracy regressed: {acc:.3f}"
    per_s, acc_s, _ = phone_error_rate(G2p(), blind5, ignore_stress=False)
    assert per_s <= 0.095, f"blind5 stress PER regressed: {per_s:.3f}"
    assert acc_s >= 0.68, f"blind5 stress accuracy regressed: {acc_s:.3f}"


def test_neural_g2p_blind5_bound():
    """Neural-ensemble-only on blind set #5.  The sanctioned session
    measured the round-5 initial ensemble at PER 7.01% / acc 74.33%;
    the blind6-cycle retrain (blind4 folded into training, selection on
    blind5) measured 74.16% / 6.52 — parity, with the cycle's gain
    coming from routing (threshold open + neural-first)."""
    from efficientspeech_tpu.text.neural_g2p import load_default

    model = load_default()
    assert model is not None, "shipped neural G2P checkpoint must load"
    blind5 = load_eval_lexicon(BLIND5)
    per, acc, cases = phone_error_rate(
        lambda w: model(w)[0], blind5, ignore_stress=True)
    assert per <= 0.085, f"blind5 neural PER regressed: {per:.3f}; {cases[:5]}"
    assert acc >= 0.70, f"blind5 neural accuracy regressed: {acc:.3f}"


def test_rule_g2p_blind4_bound():
    """Rules-only on blind set #4: measured PER 15.33% / acc 44.43%."""
    blind4 = load_eval_lexicon(BLIND4)
    per, acc, cases = phone_error_rate(rule_g2p, blind4,
                                       ignore_stress=True)
    assert per <= 0.168, f"blind4 rule PER regressed: {per:.3f}; {cases[:5]}"
    assert acc >= 0.42, f"blind4 rule accuracy regressed: {acc:.3f}"


def test_rule_g2p_emits_valid_arpabet():
    """Every emitted phone must be a valid ARPAbet symbol (else tokenizer
    silently drops it)."""
    from efficientspeech_tpu.text.cmudict_phones import ARPABET_SET

    valid = set(ARPABET_SET)
    lex = load_eval_lexicon(EVAL)
    g = G2p()
    for word in lex:
        for p in rule_g2p(word):
            assert p in valid, (word, p)
        for p in g(word):
            assert p in valid, (word, p)


def test_rule_g2p_single_primary_stress():
    """normalize_stress: at most one primary stress per word."""
    lex = load_eval_lexicon(EVAL)
    for word in lex:
        primaries = [p for p in rule_g2p(word) if p.endswith("1")]
        assert len(primaries) <= 1, (word, rule_g2p(word))


def test_session8_rule_classes():
    """Spot-check the round-4 session-8 machinery, one word per class
    (words from the tuned-on sets, never from the current blind set).
    use_neural=False: these probe the RULE chain — with the round-5
    neural OOV fallback active, some of these words route to the model
    instead (whose outputs are gated by the blind-set PER tests, not
    by per-class spot values)."""
    g = G2p(use_neural=False)
    checks = {
        "addiction": "AH D IH K SH AH N",   # _stress_last + -ion verb stress
        "safari": "S AH F AA R IY",         # loanword penult, open
        "flamingo": "F L AH M IH NG G OW",  # loanword penult, closed + ng
        "tuxedo": "T AH K S IY D OW",       # loanword penult, -edo
        "majesty": "M AE JH AH S T IY",     # trisyllabic laxing (-y)
        "nominate": "N AA M AH N EY T",     # trisyllabic laxing (-ate)
        "intrusive": "IH N T R UW S IH V",  # -sive voiceless, long stem u
        "explosive": "IH K S P L OW S IH V",
        "inclusion": "IH NG K L UW ZH AH N",  # -usion coronal yod-drop
        "pension": "P EH N SH AH N",        # -nsion
        "typhoon": "T AY F UW N",           # -oon + digraph onset open
        "dashes": "D AE SH IH Z",           # -es after sibilant
        "quaked": "K W EY K T",             # silent-e restoration (-ed)
        "cherish": "CH EH R IH SH",         # intervocalic single r
        "marathon": "M EH R AH TH AH N",    # Greek th stays voiceless
        "screw": "S K R UW",                # ew yod-drop
        "adjust": "AH JH AH S T",           # dj + reduced a-
        "coach": "K OW CH",                 # word-final ch (empty-nxt2 bug)
        "cavernous": "K AE V ER N AH S",    # compound onset validity
    }
    for word, ref in checks.items():
        pred = " ".join(strip_stress(g(word)))
        assert pred == ref, (word, ref, pred)


def test_rule_g2p_stable_classes():
    """Spot-check the rule classes the round-1 judge called out."""
    checks = {
        "pillow": "P IH L OW",        # doubled consonant + final -ow
        "famous": "F EY M AH S",      # -ous with open stem juncture
        "nation": "N EY SH AH N",     # -ation
        "kitten": "K IH T AH N",      # reduced final syllable
        "helped": "HH EH L P T",      # -ed devoiced
        "wanted": "W AA N T IH D",    # -ed after t
        "music": "M Y UW Z IH K",     # long u + intervocalic s
        "cage": "K EY JH",            # soft g
        "banker": "B AE NG K ER",     # velar nasal assimilation
        "earthly": "ER TH L IY",      # ear+C
        "network": "N EH T W ER K",   # wor+C
    }
    for word, ref in checks.items():
        pred = " ".join(strip_stress(rule_g2p(word)))
        dist = edit_distance(pred.split(), ref.split())
        assert dist == 0, (word, ref, pred)


def test_homograph_resolution():
    """Context picks the reading: noun/verb stress pairs and the
    read/live/wind lexical homographs (beyond-reference feature)."""
    assert _resolve_homograph("record", "to", "") == \
        "R IH0 K AO1 R D".split()
    assert _resolve_homograph("record", "the", "") == \
        "R EH1 K ER0 D".split()
    assert _resolve_homograph("read", "have", "") == "R EH1 D".split()
    assert _resolve_homograph("read", "to", "") == "R IY1 D".split()
    assert _resolve_homograph("live", "they", "") == "L IH1 V".split()
    assert _resolve_homograph("live", "a", "concert") == "L AY1 V".split()
    assert _resolve_homograph("wind", "the", "") == "W IH1 N D".split()
    assert _resolve_homograph("wind", "to", "up") == "W AY1 N D".split()
    assert _resolve_homograph("banana", "the", "") == []


def test_homographs_in_text2phoneme():
    """End-to-end through the tokenizer: the same word gets different
    phoneme IDs in disambiguating contexts."""
    import numpy as np

    from efficientspeech_tpu.config import PreprocessConfig
    from efficientspeech_tpu.text.g2p import get_lexicon_and_g2p, \
        text2phoneme

    cfg = PreprocessConfig(lexicon_path="/nonexistent")
    lexicon, g2p = get_lexicon_and_g2p(cfg)
    verb = text2phoneme(lexicon, g2p, "i will record it", cfg)
    noun = text2phoneme(lexicon, g2p, "play the record now", cfg)
    assert len(verb) > 0 and len(noun) > 0
    assert not np.array_equal(verb[:6], noun[:6])


def test_initialisms():
    """All-caps tokens read as letter names when they are initialisms
    (FBI, TPU, USA, HTML) but as words when pronounceable (NASA) or
    known (shouted THE); primary stress on the last letter."""
    from efficientspeech_tpu.text.g2p import is_initialism, \
        spell_initialism

    g = G2p()
    assert " ".join(g("FBI")) == "EH2 F B IY2 AY1"
    assert " ".join(g("TPU")) == "T IY2 P IY2 Y UW1"
    assert " ".join(g("USA")) == "Y UW2 EH2 S EY1"
    assert " ".join(strip_stress(g("HTML"))) == "EY CH T IY EH M EH L"
    # pronounceable / known all-caps stay words (nasa: lexicon entry,
    # CMUdict N AE1 S AH0 — the old rule read was N EY Z AH)
    assert " ".join(strip_stress(g("NASA"))) == "N AE S AH"
    assert " ".join(strip_stress(g("THE"))) == "DH AH"
    assert not is_initialism("iPhone")
    assert not is_initialism("the")
    assert spell_initialism("AB")[-1] == "IY1"  # last letter primary


def test_derived_and_compound_words():
    """Morphology against the builtin lexicon (movement = move + ment,
    making = mak+e + ing) and compound splitting (notebook, outdoors)."""
    g = G2p()
    assert " ".join(strip_stress(g("movement"))) == "M UW V M AH N T"
    assert " ".join(strip_stress(g("making"))) == "M EY K IH NG"
    assert " ".join(strip_stress(g("houses"))) == "HH AW S IH Z"
    assert " ".join(strip_stress(g("helped"))) == "HH EH L P T"
    assert " ".join(strip_stress(g("notebook"))) == "N OW T B UH K"
    assert " ".join(strip_stress(g("outdoors"))) == "AW T D AO R Z"
    assert " ".join(strip_stress(g("snowman"))) == "S N OW M AE N"


def test_blind_ledger_protocol():
    """Blind-set measurement ledger (VERDICT r4 next #6).  The canonical
    runner (scripts/g2p_measure.py) records every blind-set evaluation
    in tests/data/g2p_ledger.jsonl.  The CURRENT blind set (highest-
    numbered) must have entries from at most ONE measurement session
    (one git SHA), all sanctioned — an accidental evaluation during
    development writes a second-SHA entry and fails this test, so the
    round-4 session-8 disclosure incident can no longer recur silently."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "g2p_measure", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "g2p_measure.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    current = mod.current_blind_set()
    assert current is not None

    ledger_path = os.path.join(os.path.dirname(__file__), "data",
                               "g2p_ledger.jsonl")
    assert os.path.isfile(ledger_path), "ledger must be committed"
    entries = [json.loads(ln) for ln in open(ledger_path)
               if ln.strip()]
    cur_entries = [e for e in entries if e["set"] == current]
    shas = {e["git_sha"] for e in cur_entries}
    assert len(shas) <= 1, (
        f"CURRENT blind set {current} was measured in {len(shas)} "
        f"distinct sessions ({sorted(shas)}) — it is burned; author the "
        "next blind set and re-measure")
    assert all(e["sanctioned"] for e in cur_entries), (
        f"unsanctioned measurement of the current blind set {current}: "
        f"{[e for e in cur_entries if not e['sanctioned']]}")


def test_measure_runner_refuses_unsanctioned_current_blind():
    """The runner hard-refuses to measure the current blind set without
    --sanction (prevention on top of the ledger's detection)."""
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "g2p_measure2", os.path.join(repo, "scripts", "g2p_measure.py"))
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    current = mod.current_blind_set()
    r = subprocess.run(
        [sys.executable, "scripts/g2p_measure.py",
         os.path.join("tests", "data", current)],
        cwd=repo, capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": "", "PYTHONPATH": ""})
    assert r.returncode != 0
    assert "REFUSED" in (r.stderr + r.stdout)


def test_front_door_blind6_bound():
    """BLIND generalization gates on the current blind set (#6),
    measured once 2026-08-20 (ledger-recorded, sanctioned, all four
    engine variants in one session): front door 50.88% / PER 10.96
    stress-insensitive (46.82% / 14.13 stress-sensitive); neural-only
    identical (routing is fully open, so every lexicon-disjoint word
    rides the ensemble); rules-only 27.21% / 18.42.

    Absolute levels are NOT comparable across blind sets (same caveat
    as blind3/blind4 in round 4): blind6 deliberately samples erudite
    Latinate/French/Greek vocabulary — the rules-only baseline is 19
    pts below its blind5 level (27.2 vs 45.8), locating most of the
    drop in set difficulty.  The neural-over-rules margin is
    consistent: +28.5 pts on blind5, +23.7 on blind6.  Failures here
    must not drive tuning without blind set #7."""
    blind6 = load_eval_lexicon(BLIND6)
    per, acc, cases = phone_error_rate(G2p(), blind6, ignore_stress=True)
    assert per <= 0.125, f"blind6 PER regressed: {per:.3f}; {cases[:5]}"
    assert acc >= 0.48, f"blind6 word accuracy regressed: {acc:.3f}"
    per_s, acc_s, _ = phone_error_rate(G2p(), blind6, ignore_stress=False)
    assert per_s <= 0.155, f"blind6 stress PER regressed: {per_s:.3f}"
    assert acc_s >= 0.44, f"blind6 stress accuracy regressed: {acc_s:.3f}"
