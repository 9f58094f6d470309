from efficientspeech_tpu.training.losses import compute_losses  # noqa: F401
from efficientspeech_tpu.training.schedule import warmup_cosine_schedule  # noqa: F401
from efficientspeech_tpu.training.state import TrainState, create_train_state  # noqa: F401
