"""Mel/pitch/energy plotting (reference: utils/tools.py:210-259).

Used by validation tooling to render spectrograms with pitch/energy
contours overlaid.
"""

from typing import Optional, Sequence

import numpy as np


def plot_mel(mels: Sequence[np.ndarray], titles: Optional[Sequence[str]] = None,
             pitches: Optional[Sequence[np.ndarray]] = None,
             energies: Optional[Sequence[np.ndarray]] = None,
             stats: Optional[dict] = None, path: Optional[str] = None):
    """Plot a column of mel spectrograms ((T, n_mels) each) with optional
    de-normalized pitch (Hz, left axis) and energy (right axis) contours.

    stats: {"pitch": [min, max, mean, std], "energy": [...]} from stats.json
    (values are frame- or phoneme-rate arrays in normalized units).
    Returns the matplotlib figure; saves to ``path`` when given.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(mels)
    fig, axes = plt.subplots(n, 1, squeeze=False, figsize=(10, 3 * n))
    titles = titles or [None] * n

    for i, mel in enumerate(mels):
        ax = axes[i][0]
        mel = np.asarray(mel)
        ax.imshow(mel.T, origin="lower", aspect="auto", interpolation="none")
        ax.set_ylim(0, mel.shape[1])
        ax.set_xlim(0, mel.shape[0])
        if titles[i]:
            ax.set_title(titles[i], fontsize="medium")
        ax.tick_params(labelsize="x-small")

        if pitches is not None and stats is not None:
            p_min, p_max, p_mean, p_std = stats["pitch"][:4]
            pitch = np.asarray(pitches[i]) * p_std + p_mean
            ax1 = ax.twinx()
            x = np.linspace(0, mel.shape[0], len(pitch))
            ax1.plot(x, pitch, color="tomato", linewidth=0.7)
            ax1.set_ylabel("F0 (Hz)", color="tomato", fontsize="x-small")
            ax1.tick_params(labelsize="x-small", colors="tomato")
        if energies is not None and stats is not None:
            e_min, e_max, e_mean, e_std = stats["energy"][:4]
            energy = np.asarray(energies[i]) * e_std + e_mean
            ax2 = ax.twinx()
            ax2.spines["right"].set_position(("outward", 40))
            x = np.linspace(0, mel.shape[0], len(energy))
            ax2.plot(x, energy, color="darkviolet", linewidth=0.7)
            ax2.set_ylabel("energy", color="darkviolet", fontsize="x-small")
            ax2.tick_params(labelsize="x-small", colors="darkviolet")

    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig
