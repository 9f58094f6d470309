"""Import the reference torch modules from a source checkout, WITHOUT its
unavailable dependencies (used for checkpoint-parity testing and for ONNX
export, which needs a torch graph of the reference architecture).

The reference ``text`` package imports ``unidecode``/``inflect`` at package
init; only ``text.symbols.symbols`` is needed (verified ID-identical to ours
in tests/test_text.py), so a stub module is injected before importing the
layers.
"""

import os
import sys
import types

REFERENCE = os.environ.get("EFFICIENTSPEECH_REFERENCE", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


def load_reference_layers():
    if "ref_layers" in sys.modules:
        return sys.modules["ref_layers"]

    from efficientspeech_tpu.text.symbols import symbols as our_symbols

    text_pkg = types.ModuleType("text")
    text_symbols = types.ModuleType("text.symbols")
    text_symbols.symbols = list(our_symbols)
    text_pkg.symbols = text_symbols
    sys.modules.setdefault("text", text_pkg)
    sys.modules.setdefault("text.symbols", text_symbols)

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import layers as ref_layers  # noqa: F401  (reference layers package)
    sys.modules["ref_layers"] = sys.modules["layers"]
    return sys.modules["layers"]


def load_reference_hifigan():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import hifigan as ref_hifigan  # noqa: F401
    return ref_hifigan
