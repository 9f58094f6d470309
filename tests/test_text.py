"""Text frontend tests: symbol-table identity with the reference, tokenizer
golden sequences, cleaner/number normalization behavior."""

import importlib.util
import os

import numpy as np
import pytest

from efficientspeech_tpu.text import sequence_to_text, text_to_sequence
from efficientspeech_tpu.text.cleaners import english_cleaners
from efficientspeech_tpu.text.g2p import G2p, rule_g2p, text2phoneme
from efficientspeech_tpu.text.numbers import (
    normalize_numbers,
    number_to_ordinal_words,
    number_to_words,
)
from efficientspeech_tpu.text.symbols import PAD_ID, VOCAB_SIZE, symbols

REFERENCE = "/root/reference"


def _load_module_from_file(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_symbol_table_matches_reference():
    """Our vocabulary must be ID-for-ID identical to the reference
    (reference: text/symbols.py:22-31)."""
    cmudict = _load_module_from_file(
        "ref_cmudict", os.path.join(REFERENCE, "text/cmudict.py"))
    ref_symbols = (
        ["_"]
        + list("-/")
        + list("!'(),.:;? ")
        + list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
        + ["@" + s for s in cmudict.valid_symbols]
        + ["@sp", "@spn", "@sil"]
    )
    assert symbols == ref_symbols
    assert VOCAB_SIZE == len(ref_symbols) + 1
    assert PAD_ID == 0


def test_tokenizer_roundtrip_arpabet():
    seq = text_to_sequence("{HH AH0 L OW1} world", ["english_cleaners"])
    assert all(0 < s < VOCAB_SIZE for s in seq)
    text = sequence_to_text(seq)
    assert "{HH}" in text or "HH" in text
    # curly-brace phones map to @-prefixed symbols
    hh_id = symbols.index("@HH")
    assert seq[0] == hh_id


def test_tokenizer_drops_pad_and_unknown():
    seq = text_to_sequence("_ab~", ["basic_cleaners"])
    a_id = symbols.index("a")
    b_id = symbols.index("b")
    # "_" (pad) and "~" (unknown) are dropped (reference: text/__init__.py:74)
    assert seq == [a_id, b_id]


def test_tokenizer_char_ids():
    seq = text_to_sequence("ab c", ["basic_cleaners"])
    assert seq == [symbols.index("a"), symbols.index("b"),
                   symbols.index(" "), symbols.index("c")]


def test_number_to_words_inflect_compat():
    # expected strings follow inflect's formatting, which the reference
    # depends on (reference: text/numbers.py)
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(19) == "nineteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100, andword="") == "one hundred"
    assert number_to_words(101, andword="") == "one hundred one"
    assert number_to_words(101) == "one hundred and one"
    assert number_to_words(1234, andword="") == "one thousand, two hundred thirty-four"
    assert number_to_words(1000000, andword="") == "one million"
    assert number_to_words(123456, andword="") == \
        "one hundred twenty-three thousand, four hundred fifty-six"


def test_number_year_style():
    assert normalize_numbers("in 1999") == "in nineteen ninety-nine"
    assert normalize_numbers("in 2000") == "in two thousand"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("in 1900") == "in nineteen hundred"
    assert normalize_numbers("in 2023") == "in twenty twenty-three"


def test_number_money_ordinal_decimal():
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers("$2") == "two dollars"
    assert normalize_numbers("£5") == "five pounds"
    assert normalize_numbers("3.14") == "three point fourteen"
    assert normalize_numbers("2nd") == "second"
    assert normalize_numbers("21st") == "twenty-first"
    assert normalize_numbers("100th") == "one hundredth"
    assert normalize_numbers("12th") == "twelfth"


def test_ordinal_words():
    assert number_to_ordinal_words(1) == "first"
    assert number_to_ordinal_words(20) == "twentieth"
    assert number_to_ordinal_words(101) == "one hundred and first"


def test_english_cleaners():
    assert english_cleaners("Dr. Smith  lives at   No 5.") == \
        "doctor smith lives at no five."
    assert english_cleaners("Mr. Brown") == "mister brown"
    assert english_cleaners("CAFÉ") == "cafe"
    assert english_cleaners("it costs $5") == "it costs five dollars"


def test_rule_g2p_basic():
    # heuristic fallback sanity: nonempty, valid ARPAbet
    from efficientspeech_tpu.text.cmudict_phones import ARPABET_SET
    for word in ["hello", "cat", "phone", "station", "make"]:
        phones = rule_g2p(word)
        assert phones, word
        assert all(p in ARPABET_SET for p in phones), (word, phones)
    assert rule_g2p("cat") == ["K", "AE1", "T"]
    assert rule_g2p("make") == ["M", "EY1", "K"]


def test_text2phoneme_end_to_end():
    from efficientspeech_tpu.config import PreprocessConfig
    cfg = PreprocessConfig(lexicon_path="/nonexistent")
    lexicon = {"the": ["DH", "AH0"], "cat": ["K", "AE1", "T"]}
    seq = text2phoneme(lexicon, G2p(), "the cat, runs.", cfg)
    assert isinstance(seq, np.ndarray)
    assert seq.dtype.kind == "i"
    assert len(seq) > 4
    # commas map to {sp}
    sp_id = symbols.index("@sp")
    assert sp_id in seq.tolist()
