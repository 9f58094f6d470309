"""ONNX interchange export (reference: convert.py:35-42).

The reference exports its torch model to a fixed-insize .onnx runnable
anywhere under onnxruntime.  Our compute path is JAX (the native analogue
is the StableHLO export in convert/export.py), but the interchange
capability is preserved: our parameter pytrees load into the VENDORED
torch mirror of the architecture (convert/torch_modules.py — standalone,
no reference checkout needed) and export through torch.onnx with the
reference's exact input/output contract —
inputs[1, insize] int → (wav, lengths, duration).

The environment lacks the ``onnx`` python package; torch's TorchScript
exporter only imports it for a post-pass that splices in custom onnxscript
functions (a no-op for this purely-aten graph), so that pass is shimmed to
identity when ``onnx`` is missing.  Validation under onnxruntime is not
possible here (zero egress) — the graph's torch source is parity-tested
against our JAX model instead (tests/test_parity_torch.py).
"""

import numpy as np

from efficientspeech_tpu.config import HifiGanConfig, ModelConfig
from efficientspeech_tpu.convert.ref_modules import (
    load_reference_hifigan,
    load_reference_layers,
    reference_available,
)
from efficientspeech_tpu.convert.to_torch import (
    efficientspeech_params_to_state_dict,
    hifigan_params_to_state_dict,
)


def _shim_missing_onnx_package():
    try:
        import onnx  # noqa: F401
        return
    except ImportError:
        pass
    try:
        from torch.onnx._internal.torchscript_exporter import (
            onnx_proto_utils)
    except ImportError as e:  # torch layout changed; surface clearly
        raise RuntimeError(
            "onnx package missing and torch exporter layout unknown; "
            "install onnx or upgrade this shim") from e
    if getattr(onnx_proto_utils._add_onnxscript_fn, "_es_shim", False):
        return

    def _passthrough(model_bytes, custom_opsets):
        # the real pass only splices custom onnxscript functions into the
        # proto; this graph is pure aten, so the proto is already complete
        return model_bytes

    _passthrough._es_shim = True
    onnx_proto_utils._add_onnxscript_fn = _passthrough


def build_reference_model(params, cfg: ModelConfig,
                          hifigan_cfg: HifiGanConfig):
    """Instantiate the reference torch modules and load OUR params into
    them; returns an eval-mode torch module: phoneme → (wav, len, dur)."""
    import torch

    if not reference_available():
        raise RuntimeError("reference checkout not found; ONNX export "
                           "needs the torch reference architecture")
    ref = load_reference_layers()
    ref_h = load_reference_hifigan()

    pe = ref.PhonemeEncoder(pitch_stats=list(cfg.pitch_stats),
                            energy_stats=list(cfg.energy_stats),
                            depth=cfg.depth, reduction=cfg.reduction,
                            head=cfg.head, embed_dim=cfg.embed_dim,
                            kernel_size=cfg.kernel_size,
                            expansion=cfg.expansion)
    md = ref.MelDecoder(dim=cfg.embed_dim // cfg.reduction,
                        kernel_size=cfg.decoder_kernel_size,
                        n_blocks=cfg.n_blocks, block_depth=cfg.block_depth)
    p2m = ref.Phoneme2Mel(encoder=pe, decoder=md)
    sd = efficientspeech_params_to_state_dict(
        params, depth=cfg.depth, n_blocks=cfg.n_blocks,
        block_depth=cfg.block_depth, pitch_stats=cfg.pitch_stats,
        energy_stats=cfg.energy_stats)
    sd = {k[len("phoneme2mel."):]: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in sd.items()}
    p2m.load_state_dict(sd)
    p2m.eval()

    h = ref_h.AttrDict({
        "resblock": hifigan_cfg.resblock,
        "upsample_rates": list(hifigan_cfg.upsample_rates),
        "upsample_kernel_sizes": list(hifigan_cfg.upsample_kernel_sizes),
        "upsample_initial_channel": hifigan_cfg.upsample_initial_channel,
        "resblock_kernel_sizes": list(hifigan_cfg.resblock_kernel_sizes),
        "resblock_dilation_sizes":
            [list(d) for d in hifigan_cfg.resblock_dilation_sizes],
    })
    gen = ref_h.Generator(h)
    gsd = hifigan_params_to_state_dict(
        params["hifigan"],
        num_kernels=len(hifigan_cfg.resblock_kernel_sizes))
    gen.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in gsd.items()})
    gen.eval()

    class TextToWav(torch.nn.Module):
        """The reference predict_step graph (reference: model.py:159-164)."""

        def __init__(self):
            super().__init__()
            self.phoneme2mel = p2m
            self.hifigan = gen

        def forward(self, phoneme):
            mel, mel_len, duration = self.phoneme2mel(
                {"phoneme": phoneme}, train=False)
            wav = self.hifigan(mel.transpose(1, 2)).squeeze(1)
            return wav, mel_len, duration

    return TextToWav().eval()


def export_onnx(params, cfg: ModelConfig, hifigan_cfg: HifiGanConfig,
                path: str, insize: int = 128, opset: int = 17,
                use_reference: bool = False) -> int:
    """Write a fixed-insize .onnx (reference contract: convert.py:35-42);
    returns the file size in bytes.

    The graph is traced from the VENDORED torch modules
    (convert/torch_modules.py) — fully standalone, no reference checkout
    needed.  ``use_reference=True`` traces the live reference modules
    instead (A/B validation when a checkout is mounted)."""
    import os

    import torch

    _shim_missing_onnx_package()
    if use_reference:
        model = build_reference_model(params, cfg, hifigan_cfg)
    else:
        from efficientspeech_tpu.convert.torch_modules import (
            build_export_model)

        model = build_export_model(params, cfg, hifigan_cfg)
    phoneme = torch.randint(low=70, high=146, size=(1, insize)).int()
    with torch.no_grad():
        torch.onnx.export(
            model, (phoneme,), path, opset_version=opset,
            do_constant_folding=True,
            input_names=["inputs"], output_names=["wav", "lengths",
                                                  "duration"],
            dynamic_axes={"inputs": {1: "phoneme"}},
            dynamo=False)
    return os.path.getsize(path)


def export_torchscript(params, cfg: ModelConfig, hifigan_cfg: HifiGanConfig,
                       path: str, insize: int = 128) -> int:
    """Write a traced TorchScript module (reference: convert.py:43-48) from
    the vendored torch mirror — fixed ``insize`` like the reference's jit
    export; returns the file size in bytes."""
    import os

    import torch

    from efficientspeech_tpu.convert.torch_modules import build_export_model

    model = build_export_model(params, cfg, hifigan_cfg)
    phoneme = torch.randint(low=70, high=146, size=(1, insize)).int()
    with torch.no_grad():
        traced = torch.jit.trace(model, (phoneme,))
    traced.save(path)
    return os.path.getsize(path)
