"""Architecture parity: our parameter counts equal the reference's released
checkpoint sizes (tiny_eng_266k / small_eng_952k / base_eng_4M,
reference: README.md:35-87)."""

import jax
import jax.numpy as jnp
import pytest

from efficientspeech_tpu.config import ModelConfig
from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel


@pytest.mark.parametrize("preset,expected", [
    ("tiny", 266_355),
    ("small", 952_339),
    ("base", 3_953_235),
])
def test_acoustic_param_counts(preset, expected):
    cfg = ModelConfig.preset(preset, max_phoneme_len=32, max_mel_len=128)
    model = Phoneme2Mel(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32), jnp.int32),
                           jnp.ones((1, 32), bool), train=False)["params"])
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(shapes))
    assert n == expected, f"{preset}: {n} != {expected}"
