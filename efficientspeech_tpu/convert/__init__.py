from efficientspeech_tpu.convert.from_torch import (  # noqa: F401
    convert_efficientspeech_state_dict,
    convert_hifigan_state_dict,
    fold_weight_norm,
    load_hifigan_checkpoint,
    load_efficientspeech_checkpoint,
)
