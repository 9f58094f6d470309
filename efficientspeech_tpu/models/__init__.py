from efficientspeech_tpu.models.acoustic import PhonemeEncoder  # noqa: F401
from efficientspeech_tpu.models.mel_decoder import MelDecoder  # noqa: F401
from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel  # noqa: F401
from efficientspeech_tpu.models.hifigan import HifiGanGenerator  # noqa: F401
from efficientspeech_tpu.models.efficientspeech import EfficientSpeech  # noqa: F401
