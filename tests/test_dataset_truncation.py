"""BucketedLoader truncation alignment (VERDICT round 1, item 2).

The reference never truncates (it pads each batch to its max,
datamodule.py:29-76); our static buckets can clamp n_pad/m_pad.  When they
do, durations and the mel valid-region must stay ALIGNED: the loss must see
zero contribution from mel frames beyond sum(truncated durations), and
sum(duration) must never exceed the mel buffer.
"""

import numpy as np

from efficientspeech_tpu.data.dataset import BucketedLoader
from efficientspeech_tpu.training.losses import compute_losses


class _StubDataset:
    """Minimal duck-typed dataset: aligned (phoneme, duration, mel) items."""

    def __init__(self, items):
        self.items = items
        self.phonemes = [it["phoneme"] for it in items]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        return self.items[idx]


def _make_item(rng, n_ph, frames_per_ph=6):
    duration = rng.integers(frames_per_ph - 2, frames_per_ph + 3,
                            size=n_ph).astype(np.int32)
    m = int(duration.sum())
    return {
        "phoneme": rng.integers(1, 152, size=n_ph).astype(np.int32),
        "pitch": rng.normal(size=n_ph).astype(np.float32),
        "energy": rng.normal(size=n_ph).astype(np.float32),
        "duration": duration,
        "mel": rng.normal(size=(m, 80)).astype(np.float32) + 5.0,
        "text": "stub",
    }


def test_phoneme_truncation_keeps_duration_mel_aligned():
    """An utterance longer than max_phoneme_len: valid mel frames must equal
    the truncated durations' sum, not the original mel length."""
    rng = np.random.default_rng(0)
    item = _make_item(rng, n_ph=48)  # > max_phoneme_len below
    loader = BucketedLoader(_StubDataset([item]), batch_size=1,
                            shuffle=False, prefetch=0,
                            phoneme_multiple=32, mel_multiple=64,
                            max_phoneme_len=32, max_mel_len=1024)
    batch = next(iter(loader))

    n_pad = batch["phoneme"].shape[1]
    assert n_pad == 32
    kept_dur = batch["duration"][0]
    valid_frames = int((~batch["mel_mask"][0]).sum())
    assert valid_frames == int(kept_dur.sum())
    # the original mel is longer than the kept expansion — the surplus
    # frames must be masked (previously they were marked valid)
    assert item["mel"].shape[0] > valid_frames
    # kept durations match the source for the kept phonemes
    np.testing.assert_array_equal(kept_dur[:32], item["duration"][:32])


def test_mel_truncation_clamps_durations():
    """max_mel_len below the true expansion: cumsum(duration) <= m_pad and
    the valid mel region equals the clamped sum exactly."""
    rng = np.random.default_rng(1)
    item = _make_item(rng, n_ph=30, frames_per_ph=8)  # ~240 frames
    loader = BucketedLoader(_StubDataset([item]), batch_size=1,
                            shuffle=False, prefetch=0,
                            phoneme_multiple=32, mel_multiple=64,
                            max_phoneme_len=32, max_mel_len=128)
    batch = next(iter(loader))

    m_pad = batch["mel"].shape[1]
    assert m_pad == 128
    dur = batch["duration"][0]
    assert int(dur.sum()) <= m_pad
    valid_frames = int((~batch["mel_mask"][0]).sum())
    assert valid_frames == int(dur.sum())
    # clamping preserves the prefix: durations that fully fit are untouched
    cum = np.cumsum(item["duration"])
    n_full = int(np.searchsorted(cum, m_pad, side="right"))
    np.testing.assert_array_equal(dur[:n_full], item["duration"][:n_full])


def test_no_truncation_unchanged():
    rng = np.random.default_rng(2)
    item = _make_item(rng, n_ph=20)
    loader = BucketedLoader(_StubDataset([item]), batch_size=1,
                            shuffle=False, prefetch=0,
                            phoneme_multiple=32, mel_multiple=64)
    batch = next(iter(loader))
    np.testing.assert_array_equal(batch["duration"][0][:20],
                                  item["duration"])
    assert int((~batch["mel_mask"][0]).sum()) == item["mel"].shape[0]


def test_mel_loss_zero_beyond_truncated_durations():
    """VERDICT acceptance: feed a >max_phoneme_len utterance and assert the
    mel L1 sees ZERO contribution from frames beyond sum(truncated durs)."""
    rng = np.random.default_rng(3)
    item = _make_item(rng, n_ph=48)
    loader = BucketedLoader(_StubDataset([item]), batch_size=1,
                            shuffle=False, prefetch=0,
                            phoneme_multiple=32, mel_multiple=64,
                            max_phoneme_len=32, max_mel_len=1024)
    batch = next(iter(loader))
    b, m_pad = batch["mel_mask"].shape
    n_pad = batch["phoneme"].shape[1]
    boundary = int(batch["duration"][0].sum())

    # prediction = exact target inside the aligned region, garbage outside:
    # total mel loss must be exactly zero if masking is correct
    pred_mel = batch["mel"].copy()
    pred_mel[0, boundary:] += 123.0  # would dominate the loss if unmasked
    pred = {
        "mel": pred_mel,
        "pitch": batch["pitch"][..., None],
        "energy": batch["energy"][..., None],
        "duration": batch["duration"].astype(np.float32)[..., None],
    }
    losses = compute_losses(
        {k: np.asarray(v) for k, v in pred.items()},
        {k: np.asarray(v) for k, v in batch.items() if k != "text"})
    assert float(losses["mel_loss"]) == 0.0
    assert float(losses["loss"]) == 0.0
