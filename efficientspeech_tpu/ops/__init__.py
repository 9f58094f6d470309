from efficientspeech_tpu.ops.conv import conv1d, conv_transpose1d  # noqa: F401
from efficientspeech_tpu.ops.length_regulator import length_regulate  # noqa: F401
