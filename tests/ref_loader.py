"""Helper: import the reference torch modules for golden-output parity
tests.  The implementation lives in the package (it is also needed by the
ONNX exporter); this keeps the historical test import path working."""

from efficientspeech_tpu.convert.ref_modules import (  # noqa: F401
    REFERENCE,
    load_reference_hifigan,
    load_reference_layers,
    reference_available,
)
