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


def test_arch_override_flags():
    """The reference exposes each architecture hyperparameter as a CLI flag
    (reference: utils/tools.py:354-389); our CLIs mirror that as preset
    overrides — a flag that is given overrides exactly that field."""
    import argparse

    from efficientspeech_tpu.config import add_arch_args, arch_overrides

    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="tiny")
    add_arch_args(parser)

    args = parser.parse_args([])
    assert arch_overrides(args) == {}

    args = parser.parse_args(
        ["--n-blocks", "3", "--reduction", "2", "--decoder-kernel-size", "3"])
    cfg = ModelConfig.preset(args.preset, **arch_overrides(args))
    assert (cfg.n_blocks, cfg.reduction, cfg.decoder_kernel_size) == (3, 2, 3)
    # untouched fields keep the preset value
    assert cfg.depth == 2 and cfg.embed_dim == 128
