from efficientspeech_tpu.eval.quality import (  # noqa: F401
    batch_quality,
    dtw_path,
    duration_mae,
    f0_frame_metrics,
    mcd_dtw,
    mel_cepstra,
    utterance_quality,
)
