from efficientspeech_tpu.data.dataset import (  # noqa: F401
    BucketedLoader,
    LJSpeechDataset,
)
