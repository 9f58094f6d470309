from efficientspeech_tpu.ops.pallas.folded_matmul import folded_matmul  # noqa: F401
