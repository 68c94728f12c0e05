"""Spectrogram plotting for TensorBoard (reference: trainer.py:46-57)."""

from __future__ import annotations

import numpy as np


def plot_spectrogram(spectrogram):
    """(n, d) or (d, n) mel -> matplotlib figure (frames on x, channels on y).
    Matches the reference's figure layout; requires matplotlib (gated)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    spectrogram = np.asarray(spectrogram)
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(spectrogram.T, aspect='auto', origin='lower', interpolation='none')
    plt.colorbar(im, ax=ax)
    plt.xlabel('Frames')
    plt.ylabel('Channels')
    plt.tight_layout()
    fig.canvas.draw()
    plt.close()
    return fig
