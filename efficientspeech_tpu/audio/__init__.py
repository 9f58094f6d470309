from efficientspeech_tpu.audio.mel import mel_filterbank  # noqa: F401
from efficientspeech_tpu.audio.stft import (  # noqa: F401
    MelSpectrogram,
    griffin_lim,
    istft,
    stft,
)
