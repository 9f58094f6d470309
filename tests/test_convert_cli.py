"""convert.py CLI: torch .ckpt → orbax params + StableHLO export (CPU)."""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")


def test_convert_cli_roundtrip(tmp_path):
    sys.path.insert(0, os.path.dirname(__file__))
    from ref_loader import load_reference_layers

    ref = load_reference_layers()
    torch.manual_seed(7)
    pe = ref.PhonemeEncoder(pitch_stats=[-2.9, 11.4], energy_stats=[-1.4, 8.2],
                            depth=2, reduction=4, head=1, embed_dim=128,
                            kernel_size=3, expansion=1)
    md = ref.MelDecoder(dim=32, kernel_size=5, n_blocks=2, block_depth=2)
    p2m = ref.Phoneme2Mel(encoder=pe, decoder=md)
    sd = {"phoneme2mel." + k: v for k, v in p2m.state_dict().items()}
    ckpt = str(tmp_path / "test.ckpt")
    torch.save({"state_dict": sd}, ckpt)

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", PYTHONPATH="",
               JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = str(tmp_path / "native_params")
    hlo = str(tmp_path / "model.stablehlo")
    r = subprocess.run(
        [sys.executable, "convert.py", "--preset", "tiny",
         "--checkpoint", ckpt,
         "--hifigan-checkpoint",
         os.path.join(REFERENCE, "hifigan/LJ_V2/generator_v2"),
         "--output", out_dir, "--export", hlo, "--insize", "16",
         "--precision", "f32"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(out_dir)
    assert os.path.getsize(hlo) > 10000

    # the exported program loads and runs
    sys.path.insert(0, repo)
    os.environ["JAX_PLATFORMS"] = "cpu"
    from efficientspeech_tpu.convert.export import load_exported

    import jax.numpy as jnp

    runner = load_exported(hlo)
    phoneme = jnp.asarray(
        np.random.default_rng(0).integers(1, 152, (1, 16)), jnp.int32)
    wav, wav_len, mel_len, dur = runner(phoneme, jnp.zeros((1, 16), bool))
    assert np.isfinite(np.asarray(wav, np.float32)).all()


def test_demo_url_checkpoint_download_paths(tmp_path, monkeypatch):
    """URL checkpoints resolve to a local file (reference demo.py:100-102);
    zero-egress failures raise a clear SystemExit instead of hanging."""
    import demo

    # non-URL passes through untouched
    assert demo._maybe_download("local.ckpt") == "local.ckpt"
    assert demo._maybe_download(None) is None

    # already-downloaded file short-circuits (no network touched)
    monkeypatch.chdir(tmp_path)
    (tmp_path / "tiny_eng.ckpt").write_bytes(b"x")
    assert demo._maybe_download(
        "https://example.com/x/tiny_eng.ckpt") == "tiny_eng.ckpt"

    # download failure (zero egress) surfaces as SystemExit
    import urllib.request

    def boom(url, filename):
        raise OSError("no route to host")

    monkeypatch.setattr(urllib.request, "urlretrieve", boom)
    import pytest

    with pytest.raises(SystemExit):
        demo._maybe_download("https://example.com/x/absent.ckpt")
