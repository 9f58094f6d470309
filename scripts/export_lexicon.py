"""Regenerate lexicon/builtin-en.txt from the in-package builtin lexicon.

Usage: python scripts/export_lexicon.py
The shipped file is what configs/ljspeech.yaml points at
(format matches the reference's lexicon contract,
reference: synthesize.py:19-28: WORD<tab>PH PH PH).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from efficientspeech_tpu.text.builtin_lexicon import get_builtin_lexicon  # noqa: E402

HEADER = """\
# Built-in English lexicon (generated from
# efficientspeech_tpu/text/builtin_lexicon.py — hand-authored,
# General American, CMUDict conventions).  Format matches the
# reference's librispeech-lexicon.txt contract
# (reference: synthesize.py:19-28): WORD<tab>PH PH PH.
"""


def main() -> None:
    lex = get_builtin_lexicon()
    out = os.path.join(os.path.dirname(__file__), "..", "lexicon",
                       "builtin-en.txt")
    with open(out, "w") as f:
        f.write(HEADER)
        for word in sorted(lex):
            f.write(f"{word}\t{' '.join(lex[word])}\n")
    print(f"wrote {len(lex)} entries to {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
