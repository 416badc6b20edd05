"""Dataset builders: write the processed ``improved-neural-cdes_data.npz``
for each benchmark dataset.

Capability parity with the reference's per-dataset ``__main__`` scripts
(/root/reference/get_data/{speech_commands,character_trajectories,tsr}.py
and get_data/download/*): each builder produces the same npz contract
(data/common.py).  Raw-source acquisition is environment-gated — this image
has zero network egress, so builders consume already-downloaded raw files
when present and otherwise raise with instructions; ``build_toy_bm`` is a
fully self-contained synthetic dataset used by tests and smoke sweeps.

Run as modules, e.g.::

    python -m online_neural_cdes_tpu.data.builders toy --root data/processed
"""

from __future__ import annotations

import os
import sys

import numpy as np

from online_neural_cdes_tpu.data.common import (
    add_time,
    process_all_interpolations,
    save_processed,
)


def build_toy_bm(root: str = "data/processed", num_paths: int = 512,
                 n_points: int = 10, seed: int = 0, test_mode: bool = False):
    """Synthetic Brownian-motion online task (sign of the running path),
    shaped like a real processed dataset: statics, NaN dropout, online
    labels that end early (NaN tail)."""
    rng = np.random.default_rng(seed)
    inc = rng.normal(size=(num_paths, n_points - 1)) / np.sqrt(n_points - 1)
    bm = np.concatenate([np.zeros((num_paths, 1)), np.cumsum(inc, 1)], 1)
    values = np.stack([bm, bm + 0.1 * rng.normal(size=bm.shape)], -1)
    # Missingness on channel 1.
    drop = rng.uniform(size=values[..., 1].shape) < 0.3
    values[..., 1][drop] = np.nan
    temporal = add_time(values).astype(np.float32)  # (N, L, 3), time channel 0

    labels = (bm > 0).astype(np.float32)
    # Online labels stop at a random end-time per path.
    ends = rng.integers(n_points // 2, n_points + 1, size=num_paths)
    for i, e in enumerate(ends):
        labels[i, e:] = np.nan

    static = rng.normal(size=(num_paths, 4)).astype(np.float32)
    strat = (bm[:, -1] > 0).astype(np.int64)

    processed = process_all_interpolations(static, temporal, strat)
    directory = os.path.join(root, "Toy/BM")
    path = save_processed(processed, labels, directory, test_mode=False)
    # Also write the shrunk test-mode variant (reference get_data/
    # common.py:140-145 `_test` datasets): re-process the first 100 samples.
    n_small = min(100, num_paths)
    small = process_all_interpolations(
        static[:n_small], temporal[:n_small], strat[:n_small]
    )
    save_processed(small, labels[:n_small], directory, test_mode=True)
    return path


def build_character_trajectories(root: str = "data/processed",
                                 raw_dir: str = "data/raw/UEA"):
    """UEA CharacterTrajectories from .ts files (reference
    get_data/character_trajectories.py + download/tsr.py's .ts parser)."""
    ts_train = os.path.join(raw_dir, "CharacterTrajectories_TRAIN.ts")
    ts_test = os.path.join(raw_dir, "CharacterTrajectories_TEST.ts")
    if not (os.path.exists(ts_train) and os.path.exists(ts_test)):
        raise FileNotFoundError(
            "CharacterTrajectories .ts files not found under "
            f"{raw_dir}; download from timeseriesclassification.com (no "
            "network egress in this environment)."
        )
    from online_neural_cdes_tpu.data.ts_format import load_ts_file

    series, labels = [], []
    for path in (ts_train, ts_test):
        s, l = load_ts_file(path)
        series.extend(s)
        labels.extend(l)
    # UEA class labels are 1-based ('1'..'20'); shift to 0-based class ids
    # at build time (the reference shifts at load time,
    # ingredients/loader.py:152 `.to(torch.long) - 1`).
    labels = np.asarray([float(l) for l in labels], dtype=np.float32) - 1.0
    temporal = [add_time(s[None])[0] for s in series]
    processed = process_all_interpolations(None, temporal, labels.astype(np.int64))
    return save_processed(processed, labels, os.path.join(root, "UEA/CharacterTrajectories"))


def build_tsr(dataset: str, root: str = "data/processed",
              raw_dir: str = "data/raw/TSR"):
    """Beijing air-quality regression datasets (reference get_data/tsr.py)."""
    path = os.path.join(raw_dir, f"{dataset}_TRAIN.ts")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"TSR raw file {path} not found (zero-egress environment; "
            "download from the TSER archive first)."
        )
    from online_neural_cdes_tpu.data.ts_format import load_ts_file

    series, targets = load_ts_file(path)
    targets = np.asarray([float(t) for t in targets], dtype=np.float32)
    temporal = [add_time(s[None])[0] for s in series]
    processed = process_all_interpolations(None, temporal, None)
    return save_processed(processed, targets, os.path.join(root, f"TSR/{dataset}"))


SPEECH_CLASSES = ("yes", "no", "up", "down", "left", "right", "on", "off",
                  "stop", "go")


def build_speech_commands(root: str = "data/processed",
                          raw_dir: str = "data/raw/SpeechCommands"):
    """SpeechCommands MFCC dataset: ten classes, 16 kHz one-second clips,
    10 MFCC channels (reference get_data/download/speech_commands.py:80-115
    — its torchaudio MFCC replaced by the numpy implementation in
    data/audio.py).  Requires the extracted speech_commands_v0.02 archive
    under ``raw_dir`` (zero-egress image: download externally)."""
    from scipy.io import wavfile

    from online_neural_cdes_tpu.data.audio import mfcc

    if not os.path.isdir(raw_dir):
        raise FileNotFoundError(
            f"SpeechCommands raw audio not found under {raw_dir} "
            "(zero-egress environment)."
        )
    clips, labels = [], []
    for y, cls in enumerate(SPEECH_CLASSES):
        folder = os.path.join(raw_dir, cls)
        for fname in sorted(os.listdir(folder)):
            if not fname.endswith(".wav"):
                continue
            _, audio = wavfile.read(os.path.join(folder, fname))
            if len(audio) != 16000:  # discard short clips like the reference
                continue
            clips.append(audio.astype(np.float32) / 2**15)
            labels.append(y)
    feats = mfcc(np.stack(clips))                 # (N, frames, 10)
    labels = np.asarray(labels, np.float32)
    temporal = add_time(feats)
    processed = process_all_interpolations(None, temporal, labels.astype(np.int64))
    return save_processed(
        processed, labels, os.path.join(root, "SpeechCommands/SpeechCommands")
    )


BUILDERS = {
    "toy": build_toy_bm,
    "character_trajectories": build_character_trajectories,
    "speech_commands": build_speech_commands,
}


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "toy"
    root = "data/processed"
    if "--root" in sys.argv:
        root = sys.argv[sys.argv.index("--root") + 1]
    if name.startswith("Beijing"):
        print(build_tsr(name, root=root))
    else:
        print(BUILDERS[name](root=root))
