"""Grapheme-to-phoneme front door for inference.

Pipeline mirrors the reference (reference: synthesize.py:19-64): word-level
lexicon lookup first, then a fallback for out-of-vocabulary words.  The
reference falls back to the ``g2p_en`` neural G2P; that package is optional
here — when absent, a self-contained rule-based letter-to-sound fallback is
used (documented approximation: lexicon entries cover the vast majority of
running words).  For the Tagalog ``t1`` language, OOV words fall back to
character level, same as the reference (reference: synthesize.py:44-45).
"""

import re
from string import punctuation
from typing import Dict, List

import numpy as np

from efficientspeech_tpu.text import text_to_sequence


def read_lexicon(lex_path: str) -> Dict[str, List[str]]:
    """word → phone list; first entry wins (reference: synthesize.py:19-28)."""
    lexicon: Dict[str, List[str]] = {}
    with open(lex_path) as f:
        for line in f:
            temp = re.split(r"\s+", line.strip("\n"))
            word = temp[0]
            phones = temp[1:]
            if word.lower() not in lexicon:
                lexicon[word.lower()] = phones
    return lexicon


# --- rule-based letter-to-sound fallback -----------------------------------
# A pragmatic English L2S: suffix rules, digraphs, magic-e, open-syllable
# long vowels, then letter defaults.  Only used for words missing from the
# lexicon.  Measured on tests/data/g2p_eval.tsv (held-out CMUDict-style
# entries) by tests/test_g2p_per.py; the PER is recorded in STATUS.md.

# suffixes replaced wholesale (stem recursion); longest match first
_SUFFIXES = [
    ("ission", ["IH1", "SH", "AH0", "N"]),
    ("ession", ["EH1", "SH", "AH0", "N"]),
    ("ation", ["EY1", "SH", "AH0", "N"]),
    ("ature", ["EY1", "CH", "ER0"]),
    ("ision", ["IH1", "ZH", "AH0", "N"]),
    ("cious", ["SH", "AH0", "S"]),
    ("tious", ["SH", "AH0", "S"]),
    ("ssion", ["SH", "AH0", "N"]),
    ("tion", ["SH", "AH0", "N"]),
    ("sion", ["ZH", "AH0", "N"]),
    ("cial", ["SH", "AH0", "L"]),
    ("tial", ["SH", "AH0", "L"]),
    ("cian", ["SH", "AH0", "N"]),
    ("ture", ["CH", "ER0"]),
    ("sure", ["ZH", "ER0"]),
    ("able", ["AH0", "B", "AH0", "L"]),
    ("ness", ["N", "AH0", "S"]),
    ("ment", ["M", "AH0", "N", "T"]),
    ("ough", ["AO1"]),
    ("ous", ["AH0", "S"]),
    ("ing", ["IH0", "NG"]),
    ("ly", ["L", "IY0"]),
]
# minimum STEM length for each generic suffix (protects monosyllables like
# "ring", "bed", "ten" whose ending is part of the root)
_SUFFIX_MIN_STEM = {"ing": 3, "ly": 3, "ous": 3, "ness": 3, "ment": 2,
                    "able": 2, "en": 4, "et": 4, "ed": 3, "le": 3}

_DIGRAPHS = [
    ("tch", ["CH"]), ("igh", ["AY1"]), ("dge", ["JH"]), ("alk", ["AO1", "K"]),
    ("ook", ["UH1", "K"]),
    ("ch", ["CH"]), ("sh", ["SH"]), ("th", ["TH"]), ("ph", ["F"]),
    ("wh", ["W"]), ("ck", ["K"]), ("ng", ["NG"]), ("qu", ["K", "W"]),
    ("oo", ["UW1"]), ("ee", ["IY1"]), ("ea", ["IY1"]), ("ai", ["EY1"]),
    ("ay", ["EY1"]), ("oa", ["OW1"]), ("ou", ["AW1"]), ("ow", ["AW1"]),
    ("ong", ["AO1", "NG"]), ("old", ["OW1", "L", "D"]),
    ("oi", ["OY1"]), ("oy", ["OY1"]), ("au", ["AO1"]), ("aw", ["AO1"]),
    ("ar", ["AA1", "R"]), ("or", ["AO1", "R"]), ("ir", ["ER1"]),
    ("ur", ["ER1"]), ("er", ["ER0"]), ("kn", ["N"]), ("wr", ["R"]),
    ("gh", []),
]

_SHORT_VOWELS = {"a": "AE1", "e": "EH1", "i": "IH1", "o": "AA1", "u": "AH1", "y": "IH1"}
_LONG_VOWELS = {"a": "EY1", "e": "IY1", "i": "AY1", "o": "OW1", "u": "UW1", "y": "AY1"}
_CONSONANTS = {
    "b": "B", "d": "D", "f": "F", "g": "G", "h": "HH", "j": "JH", "k": "K",
    "l": "L", "m": "M", "n": "N", "p": "P", "r": "R", "s": "S", "t": "T",
    "v": "V", "w": "W", "x": "K S", "z": "Z",
}
_VOWEL_LETTERS = set("aeiouy")
_VOICELESS = {"P", "K", "F", "TH", "S", "SH", "CH"}


def _collapse_doubles(word: str) -> str:
    """Doubled consonant letters are one phone (pillow → pilow); doubled
    vowels (ee/oo) are digraphs and stay."""
    out = []
    for c in word:
        if out and out[-1] == c and c not in "aeiou":
            continue
        out.append(c)
    return "".join(out)


_VOWEL_PHONES = ("AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
                 "IH", "IY", "OW", "OY", "UH", "UW")


def _has_vowel(phones: List[str]) -> bool:
    return any(p.rstrip("012") in _VOWEL_PHONES for p in phones)


def _demote_stress(phones: List[str]) -> List[str]:
    return [p.replace("1", "0") if p.endswith("1") else p for p in phones]


def normalize_stress(phones: List[str]) -> List[str]:
    """At most ONE primary stress: the first '1' stays primary, later '1's
    become secondary '2' (English default: initial stress; stress-bearing
    suffixes demote the stem before this runs)."""
    out, seen = [], False
    for p in phones:
        if p.endswith("1"):
            if seen:
                p = p[:-1] + "2"
            seen = True
        out.append(p)
    return out


def rule_g2p(word: str) -> List[str]:
    """Heuristic English letter-to-sound; returns ARPAbet phones."""
    return normalize_stress(_rule_g2p(word))


def _rule_g2p(word: str) -> List[str]:
    word = word.lower()
    word = "".join(c for c in word if c.isalpha() or c == "'")
    if not word:
        return []

    for suffix, ph in _SUFFIXES:
        min_stem = _SUFFIX_MIN_STEM.get(suffix, 1)
        if word.endswith(suffix) and len(word) - len(suffix) >= min_stem:
            stem = _rule_g2p(word[: -len(suffix)])
            if any(p.endswith("1") for p in ph):
                # stress-bearing suffix (-ation, -ition, ...): the suffix
                # carries primary stress, the stem demotes
                stem = _demote_stress(stem)
            return stem + ph

    # past-tense -ed: allomorph chosen by the stem's final phone
    if word.endswith("ed") and len(word) - 2 >= _SUFFIX_MIN_STEM["ed"]:
        stem = _rule_g2p(word[:-2])
        if stem:
            last = stem[-1]
            if last in ("T", "D"):
                return stem + ["IH0", "D"]
            return stem + (["T"] if last in _VOICELESS else ["D"])

    phones: List[str] = []
    n = len(word)

    # final e after a consonant is silent whenever an earlier vowel exists
    # (dance, house, give, table); additionally a V-C-e tail is "magic"
    # (lengthens that vowel: make, time)
    silent_final_e = (
        len(word) >= 3
        and word[-1] == "e"
        and word[-2] not in _VOWEL_LETTERS
        and any(ch in _VOWEL_LETTERS for ch in word[:-2])
    )
    magic_e = silent_final_e and word[-3] in _VOWEL_LETTERS

    i = 0
    while i < n:
        if silent_final_e and i == n - 1:
            break
        c = word[i]
        nxt = word[i + 1] if i + 1 < n else ""
        nxt2 = word[i + 2] if i + 2 < n else ""

        # doubled consonant letters are ONE phone, and they close the
        # preceding syllable (summer/letter/rabbit keep short vowels
        # because the open-syllable check below sees both letters)
        if c not in "aeiou" and nxt == c:
            if c in _CONSONANTS:
                phones.extend(_CONSONANTS[c].split())
            i += 2
            continue

        # word-initial y is the consonant (yellow, yes)
        if c == "y" and i == 0 and nxt in _VOWEL_LETTERS:
            phones.append("Y")
            i += 1
            continue

        # word-initial ar+V is the r-colored reduced syllable
        # (around, arise) — not the 'ar' digraph (arm, art)
        if c == "a" and i == 0 and nxt == "r" and nxt2 in _VOWEL_LETTERS \
                and n >= 5:
            phones.append("ER0")
            i += 1
            continue

        # word-initial unstressed a- in a-CV multisyllables
        # (away, again, along, about)
        if c == "a" and i == 0 and n >= 4 and nxt in _CONSONANTS \
                and nxt2 in _VOWEL_LETTERS:
            phones.append("AH0")
            i += 1
            continue

        # unstressed prefixes be-/de-/re- before a consonant (before,
        # believe, return, decide); exceptions (recent, demon) are
        # lexicon entries
        if i == 0 and c in "bdr" and nxt == "e" and n >= 5 \
                and nxt2 not in _VOWEL_LETTERS and nxt2 != c:
            phones.extend([_CONSONANTS[c], "IH0"])
            i += 2
            continue

        # n assimilates to NG before velars (think, bank, uncle, anchor)
        if c == "n" and (nxt in "kgqx" or
                         (nxt == "c" and nxt2 not in "eiyh")):
            if nxt == "g" and nxt2 in "eiy":
                pass  # danger, angel: n + soft g, no velar
            else:
                phones.append("NG")
                i += 1
                continue

        matched = False
        for digraph, ph in _DIGRAPHS:
            if word.startswith(digraph, i):
                # intervocalic th is voiced (mother, weather)
                if digraph == "th" and 0 < i and i + 2 < n \
                        and word[i - 1] in _VOWEL_LETTERS \
                        and word[i + 2] in _VOWEL_LETTERS:
                    ph = ["DH"]
                # word-final -ow is /oʊ/ (yellow, slow), not /aʊ/
                if digraph == "ow" and i + 2 == n:
                    ph = ["OW1"]
                # ng before e/i/y is n + SOFT g (danger, engine), not /ŋ/
                if digraph in ("ng", "ong") and i + len(digraph) < n \
                        and word[i + len(digraph)] in "eiy":
                    continue
                phones.extend(ph)
                i += len(digraph)
                matched = True
                break
        if matched:
            continue
        if c in _VOWEL_LETTERS:
            # reduced FINAL closed syllable: V + single final consonant
            # with an earlier vowel already emitted (open, pilot, problem,
            # cabin, silent...) — schwa, not a full vowel
            if _has_vowel(phones) and i == n - 2 and nxt in "lmnt" \
                    and c != "y":
                phones.append("IH0" if c == "i" else "AH0")
                i += 1
                continue
            # ... same for -ant/-ent tails (giant, silent, parent)
            if _has_vowel(phones) and i == n - 3 \
                    and word.endswith(("ant", "ent")):
                phones.extend(["AH0", "N", "T"])
                break
            # long contexts: magic-e position, open syllable (exactly one
            # consonant then a vowel), a consonant + -le tail (table,
            # title), or word-final vowel (go, hi, mo-ment)
            long_pos = (
                (magic_e and i == n - 3)
                or (nxt and nxt not in _VOWEL_LETTERS and nxt in _CONSONANTS
                    and nxt2 in _VOWEL_LETTERS and nxt2 != nxt)
                or (nxt and nxt in _CONSONANTS and word.startswith("le", i + 2)
                    and i + 4 == n)
                or (i == n - 1 and n >= 2 and c in "iou")
            )
            # i in hiatus before a/o/u: stressed early = /aɪ/ (giant,
            # lion, quiet), later = /iː/ (radio, period)
            if c == "i" and nxt in "aou":
                if i > 0 and word[i - 1] in "lnm" and nxt == "o":
                    phones.append("Y")  # onion, million, opinion
                else:
                    phones.append("AY1" if i <= 2 else "IY0")
                i += 1
                continue
            table = _LONG_VOWELS if long_pos else _SHORT_VOWELS
            if c == "y" and i == n - 1 and not silent_final_e:
                phones.append("IY0" if n > 3 else "AY1")
            elif c == "a" and i > 0 and word[i - 1] == "w" and not long_pos:
                phones.append("AA1")  # wa- (want, wash, watch)
            elif c == "o" and nxt == "g" and i + 2 == n:
                phones.append("AO1")  # final -og (dog, log, fog)
            elif c == "u" and long_pos:
                # long u is /juː/ except after l, r, j (blue, June)
                if i > 0 and word[i - 1] in "lrj":
                    phones.append("UW1")
                else:
                    phones.extend(["Y", "UW1"])
            else:
                phones.append(table[c])
        elif c == "c":
            phones.append("S" if (nxt and nxt in "eiy") else "K")
        elif c == "g":
            # soft g before e/i/y (giant, cage); hard otherwise
            phones.append("JH" if (nxt and nxt in "eiy") else "G")
        elif c == "l" and i == n - 2 and word[-1] == "e" and i > 0 \
                and word[i - 1] not in _VOWEL_LETTERS:
            phones.extend(["AH0", "L"])  # -Cle tail (table, little)
            break
        elif c == "s" and i == n - 1 and len(word) > 1:
            prev = word[i - 1]
            phones.append("Z" if prev in "bdgvlmnrw" or prev in _VOWEL_LETTERS else "S")
        elif c == "s" and 0 < i and nxt and word[i - 1] in _VOWEL_LETTERS \
                and nxt in _VOWEL_LETTERS:
            phones.append("Z")  # intervocalic s (music, visit)
        elif c in _CONSONANTS:
            phones.extend(_CONSONANTS[c].split())
        i += 1
    return phones


class G2p:
    """Callable matching the ``g2p_en.G2p`` protocol (word → phone list)."""

    def __init__(self):
        self._backend = None
        try:  # optional: use g2p_en when installed (reference parity)
            from g2p_en import G2p as _NeuralG2p  # type: ignore
            self._backend = _NeuralG2p()
        except Exception:
            self._backend = None

    def __call__(self, word: str) -> List[str]:
        if self._backend is not None:
            return list(self._backend(word))
        if not any(c.isalpha() for c in word):
            # punctuation passes through (g2p_en behavior); the caller maps
            # it to {sp} (reference: synthesize.py:50)
            return [c for c in word if not c.isspace()]
        return rule_g2p(word)


def get_lexicon_and_g2p(preprocess_config) -> tuple:
    """(lexicon dict, g2p callable) for a PreprocessConfig or raw dict."""
    if hasattr(preprocess_config, "lexicon_path"):
        lex_path = preprocess_config.lexicon_path
    else:
        lex_path = preprocess_config["path"]["lexicon_path"]
    try:
        lexicon = read_lexicon(lex_path)
    except (FileNotFoundError, IsADirectoryError):
        lexicon = {}
    return lexicon, G2p()


def text2phoneme(lexicon: Dict[str, List[str]], g2p, text: str,
                 preprocess_config, verbose: bool = False) -> np.ndarray:
    """Raw text → phoneme ID array (reference: synthesize.py:37-64)."""
    text = text.rstrip(punctuation)
    if hasattr(preprocess_config, "language"):
        lang = preprocess_config.language
        cleaner_names = list(preprocess_config.text_cleaners)
    else:
        lang = preprocess_config["preprocessing"]["text"]["language"]
        cleaner_names = preprocess_config["preprocessing"]["text"]["text_cleaners"]

    phones: List[str] = []
    words = re.split(r"([,;.\-\?\!\s+])", text)
    for w in words:
        if w.lower() in lexicon:
            phones += lexicon[w.lower()]
        elif lang == "t1":
            phones += list(w.lower())
        else:
            phones += list(filter(lambda p: p != " ", g2p(w)))
    phones_str = "{" + "}{".join(phones) + "}"
    phones_str = re.sub(r"\{[^\w\s]?\}", "{sp}", phones_str)
    phones_str = phones_str.replace("}{", " ")

    if verbose:
        print(f"Raw Text Sequence: {text}")
        print(f"Phoneme Sequence: {phones_str}")

    return np.array(text_to_sequence(phones_str, cleaner_names))
