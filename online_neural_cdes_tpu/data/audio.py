"""MFCC features in pure numpy/scipy.

Replaces the reference's torchaudio dependency for SpeechCommands
preprocessing (reference get_data/download/speech_commands.py:108-115:
``MFCC(log_mels=True, melkwargs=dict(n_fft=360, n_mels=32), n_mfcc=10)``).
Matches torchaudio's conventions: center-padded reflect STFT with a Hann
window, power spectrogram, HTK mel filterbank without normalisation,
natural-log mels (log(mel + 1e-6)), orthonormal DCT-II.

Component oracles (torchaudio itself is not importable in this image):
the STFT power spectrogram is pinned at 1e-12 rtol against ``torch.stft``
called with torchaudio.Spectrogram's exact arguments, and the DCT-II
basis against ``scipy.fft.dct(type=2, norm="ortho")`` — see
tests/test_raw_builders.py.  The mel filterbank remains formula-matched
(HTK scale, unnormalised triangles, torchaudio melscale_fbanks contract).
"""

from __future__ import annotations

import numpy as np

__all__ = ["mfcc", "mel_filterbank"]


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """(n_freqs, n_mels) triangular HTK filterbank (torchaudio melscale)."""
    f_max = f_max or sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(mel_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]           # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up))


def _stft_power(audio: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Center-padded (reflect) Hann-window power spectrogram.
    audio: (..., T) -> (..., n_fft//2+1, frames)."""
    pad = n_fft // 2
    x = np.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    window = np.hanning(n_fft + 1)[:-1].astype(x.dtype)
    strides = x.strides[:-1] + (hop * x.strides[-1], x.strides[-1])
    frames = np.lib.stride_tricks.as_strided(
        x, x.shape[:-1] + (n_frames, n_fft), strides
    )
    spec = np.fft.rfft(frames * window, axis=-1)
    return np.moveaxis(np.abs(spec) ** 2, -1, -2)


def _dct2_ortho(n_mfcc: int, n_mels: int) -> np.ndarray:
    k = np.arange(n_mfcc)[:, None]
    n = np.arange(n_mels)[None, :]
    basis = np.cos(np.pi / n_mels * (n + 0.5) * k)
    basis[0] *= 1.0 / np.sqrt(2.0)
    return basis * np.sqrt(2.0 / n_mels)


def mfcc(audio: np.ndarray, sample_rate: int = 16000, n_fft: int = 360,
         hop: int | None = None, n_mels: int = 32, n_mfcc: int = 10,
         log_mels: bool = True) -> np.ndarray:
    """audio (..., T) -> MFCC (..., frames, n_mfcc)."""
    hop = hop or n_fft // 2
    power = _stft_power(np.asarray(audio, np.float64), n_fft, hop)
    mels = np.einsum("...ft,fm->...mt", power, mel_filterbank(
        n_fft // 2 + 1, n_mels, sample_rate))
    if log_mels:
        feats = np.log(mels + 1e-6)
    else:
        # torchaudio's amplitude_to_db path (top_db=80 clamp omitted).
        feats = 10.0 * np.log10(np.maximum(mels, 1e-10))
    out = np.einsum("km,...mt->...kt", _dct2_ortho(n_mfcc, n_mels), feats)
    return np.moveaxis(out, -2, -1).astype(np.float32)
