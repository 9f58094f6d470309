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
# A pragmatic English L2S: suffix rules, digraphs, magic-e, then letter
# defaults.  Only used for words missing from the lexicon.

_SUFFIXES = [
    ("tion", ["SH", "AH0", "N"]),
    ("sion", ["ZH", "AH0", "N"]),
    ("ture", ["CH", "ER0"]),
    ("cious", ["SH", "AH0", "S"]),
    ("tious", ["SH", "AH0", "S"]),
    ("ough", ["AO1"]),
]

_DIGRAPHS = [
    ("tch", ["CH"]), ("igh", ["AY1"]), ("dge", ["JH"]),
    ("ch", ["CH"]), ("sh", ["SH"]), ("th", ["TH"]), ("ph", ["F"]),
    ("wh", ["W"]), ("ck", ["K"]), ("ng", ["NG"]), ("qu", ["K", "W"]),
    ("oo", ["UW1"]), ("ee", ["IY1"]), ("ea", ["IY1"]), ("ai", ["EY1"]),
    ("ay", ["EY1"]), ("oa", ["OW1"]), ("ou", ["AW1"]), ("ow", ["AW1"]),
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


def rule_g2p(word: str) -> List[str]:
    """Heuristic English letter-to-sound; returns ARPAbet phones."""
    word = word.lower()
    word = "".join(c for c in word if c.isalpha() or c == "'")
    if not word:
        return []
    phones: List[str] = []

    for suffix, ph in _SUFFIXES:
        if word.endswith(suffix) and len(word) > len(suffix):
            return rule_g2p(word[: -len(suffix)]) + ph

    # magic-e: CVCe → long vowel, silent e
    silent_final_e = (
        len(word) >= 3
        and word[-1] == "e"
        and word[-2] not in _VOWEL_LETTERS
        and word[-3] in _VOWEL_LETTERS
    )

    i = 0
    n = len(word)
    while i < n:
        if silent_final_e and i == n - 1:
            break
        matched = False
        for di, (digraph, ph) in enumerate(_DIGRAPHS):
            if word.startswith(digraph, i):
                phones.extend(ph)
                i += len(digraph)
                matched = True
                break
        if matched:
            continue
        c = word[i]
        if c in _VOWEL_LETTERS:
            long_pos = silent_final_e and i == n - 3
            table = _LONG_VOWELS if long_pos else _SHORT_VOWELS
            if c == "y" and i == n - 1 and not silent_final_e:
                phones.append("IY0")
            else:
                phones.append(table[c])
        elif c == "c":
            nxt = word[i + 1] if i + 1 < n else ""
            phones.append("S" if nxt in "eiy" else "K")
        elif c == "s" and i == n - 1 and len(word) > 1:
            prev = word[i - 1]
            phones.append("Z" if prev in "bdgvlmnrw" or prev in _VOWEL_LETTERS else "S")
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
