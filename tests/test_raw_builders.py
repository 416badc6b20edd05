"""Raw-data construction tests: MFCC numerics, the MIMIC build_raw
pipeline on synthetic BigQuery-style CSVs, and the SpeechCommands builder
on synthetic wavs."""

import os

import numpy as np
import pandas as pd
import pytest

from online_neural_cdes_tpu.data.audio import (
    _dct2_ortho,
    _stft_power,
    mel_filterbank,
    mfcc,
)
from online_neural_cdes_tpu.data.mimic_raw import (
    build_reduced_format,
    merge_nearby_vitals,
    remove_continuously_monitored,
)


def test_dct_is_orthonormal():
    D = _dct2_ortho(32, 32)
    np.testing.assert_allclose(D @ D.T, np.eye(32), atol=1e-12)


@pytest.mark.oracle
def test_stft_power_matches_torch_stft():
    """Component oracle for the MFCC front half: ``_stft_power`` vs
    ``torch.stft`` called with torchaudio.Spectrogram's exact arguments.

    torchaudio's Spectrogram (which MFCC wraps, reference
    get_data/download/speech_commands.py:108-115) is literally a call to
    torch.stft(n_fft, hop, win_length=n_fft, window=hann_window,
    center=True, pad_mode="reflect", onesided=True) followed by
    ``abs()**power`` — so pinning against torch's own C++ STFT at those
    arguments ties the numpy implementation to the real library's
    conventions (framing, periodic-Hann window, reflect center padding)
    without torchaudio being importable in this image."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    n_fft, hop = 360, 180
    for shape in [(1000,), (3, 1000), (2, 2, 777)]:
        audio = rng.normal(size=shape)
        ours = _stft_power(audio, n_fft, hop)
        win = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)
        spec = torch.stft(
            torch.from_numpy(audio).reshape(-1, shape[-1]),
            n_fft=n_fft, hop_length=hop, win_length=n_fft, window=win,
            center=True, pad_mode="reflect", normalized=False,
            onesided=True, return_complex=True,
        )
        ref = (spec.abs().numpy() ** 2).reshape(ours.shape)
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-10)


@pytest.mark.oracle
def test_dct2_matches_scipy():
    """Component oracle for the MFCC back half: the orthonormal DCT-II
    basis vs scipy.fft.dct(type=2, norm="ortho") — the same transform
    torchaudio's create_dct produces (torchaudio functional docs)."""
    scipy_fft = pytest.importorskip("scipy.fft")
    for n_mfcc, n_mels in [(10, 32), (13, 40), (32, 32)]:
        D = _dct2_ortho(n_mfcc, n_mels)
        ref = scipy_fft.dct(np.eye(n_mels), type=2, norm="ortho", axis=0)[:n_mfcc]
        np.testing.assert_allclose(D, ref, atol=1e-14)


def test_mel_filterbank_covers_spectrum():
    fb = mel_filterbank(181, 32, 16000)
    assert fb.shape == (181, 32)
    assert (fb >= 0).all()
    # Every mel filter has support; interior frequencies are covered.
    assert (fb.sum(axis=0) > 0).all()
    assert (fb[5:-5].sum(axis=1) > 0).all()


@pytest.mark.smoke
def test_mfcc_shapes_and_tone_sensitivity():
    sr, T = 16000, 16000
    t = np.arange(T) / sr
    low = np.sin(2 * np.pi * 300 * t)[None]
    high = np.sin(2 * np.pi * 4000 * t)[None]
    f_low = mfcc(low)
    f_high = mfcc(high)
    # torchaudio frame count for n_fft=360, hop=180, center pad: T//hop + 1.
    assert f_low.shape == (1, T // 180 + 1, 10)
    # Different tones produce clearly different cepstra.
    assert np.abs(f_low - f_high).mean() > 0.5
    # Deterministic + finite.
    assert np.isfinite(f_low).all()


def _synthetic_bigquery_csv(path, n_patients=8, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    base = pd.Timestamp("2020-01-01 00:00:00")
    for pid in range(n_patients):
        intime = base + pd.Timedelta(hours=rng.integers(0, 24))
        stay_hours = float(rng.uniform(6, 60))
        outtime = intime + pd.Timedelta(hours=stay_hours)
        n_obs = int(rng.integers(6, 25))
        times = np.sort(rng.uniform(0.1, stay_hours, n_obs))
        t_sofa = (
            intime + pd.Timedelta(hours=float(rng.uniform(2, stay_hours)))
            if rng.uniform() < 0.4 else pd.NaT
        )
        for tt in times:
            rows.append({
                "stay_id": pid,
                "charttime": intime + pd.Timedelta(hours=float(tt)),
                "icu_intime": intime,
                "icu_outtime": outtime,
                "t_sofa": t_sofa,
                "gender": rng.choice(["M", "F"]),
                "ethnicity": rng.choice(["A", "B", "C"]),
                "admission_age": float(rng.uniform(20, 90)),
                "height": float(rng.uniform(150, 200)),
                "weight": float(rng.uniform(50, 120)),
                "hospital_expire_flag": int(rng.uniform() < 0.2),
                "ventilation_status": rng.choice(
                    [np.nan, "Oxygen", "InvasiveVent"], p=[0.7, 0.2, 0.1]
                ),
                "heart_rate": float(rng.normal(80, 10)),
                "sbp": float(rng.normal(120, 15)) if rng.uniform() < 0.7 else np.nan,
                "dbp": np.nan, "dbp_ni": np.nan, "mbp": np.nan, "mbp_ni": np.nan,
                "o2_flow": np.nan, "resp_rate": float(rng.normal(16, 2)),
                "spo2": float(rng.normal(97, 1)), "temperature": np.nan,
                **{lab: np.nan for lab in (
                    "alp", "ast", "baseexcess", "bicarbonate_bg",
                    "bilirubin_direct", "bilirubin_total", "bun", "calcium",
                    "chloride", "creatinine", "fibrinogen", "fio2", "glucose",
                    "glucose_bg", "hematocrit", "hemoglobin", "lactate", "pco2",
                    "ph", "platelet", "po2", "potassium_bg", "ptt", "so2",
                    "sodium", "troponin_i", "wbc")},
            })
    pd.DataFrame(rows).to_csv(path, index=False)


def test_build_reduced_format_pipeline(tmp_path):
    raw_dir = tmp_path / "mimic"
    raw_dir.mkdir()
    _synthetic_bigquery_csv(str(raw_dir / "export_0.csv"), n_patients=30)
    out = build_reduced_format(str(raw_dir))
    npz = np.load(out, allow_pickle=True)
    n = len(npz["static_data"])
    assert n > 0
    assert len(npz["temporal_data"]) == n
    assert npz["los_data"].shape == (n,)
    # time channel 0, hours, increasing.
    for t in npz["temporal_data"]:
        assert (np.diff(t[:, 0]) >= 0).all()
        assert t.shape[1] == 1 + 10 + 27  # time + vitals + labs
    # sepsis label: at most one 1 per patient.
    for s in npz["sepsis_data"]:
        assert s[:, 1].sum() in (0.0, 1.0)
    # And the prepared tasks build end-to-end from it.
    from online_neural_cdes_tpu.data.mimic import prepare_all

    paths = prepare_all(out, out_root=str(tmp_path / "processed"))
    assert all(os.path.exists(p) for p in paths.values())


def test_merge_nearby_vitals_merges():
    frame = pd.DataFrame({
        "id": [1, 1, 1],
        "time": [1.0, 1.016, 2.0],     # first two within 2 minutes
        "heart_rate": [80.0, 90.0, 100.0],
        "ventilation": [0.0, 1.0, 0.0],
        "sepsis": [np.nan, np.nan, np.nan],
    })
    merged = merge_nearby_vitals(frame)
    assert len(merged) == 2
    assert merged.iloc[0]["heart_rate"] == 85.0   # mean of merged features
    assert merged.iloc[0]["ventilation"] == 1.0   # last of vent
    assert merged.iloc[0]["time"] == 1.016        # last time


def test_remove_continuously_monitored():
    times_cont = np.arange(0, 10) / 60.0          # every minute
    times_ok = np.arange(0, 10).astype(float)     # hourly
    frame = pd.DataFrame({
        "id": [1] * 10 + [2] * 10,
        "time": np.concatenate([times_cont, times_ok]),
    })
    out = remove_continuously_monitored(frame)
    assert set(out["id"].unique()) == {2}


def test_speech_builder_on_synthetic_wavs(tmp_path):
    from scipy.io import wavfile

    from online_neural_cdes_tpu.data.builders import SPEECH_CLASSES, build_speech_commands

    raw = tmp_path / "SpeechCommands"
    rng = np.random.default_rng(0)
    for cls in SPEECH_CLASSES:
        d = raw / cls
        d.mkdir(parents=True)
        for i in range(2):
            audio = (rng.normal(size=16000) * 3000).astype(np.int16)
            wavfile.write(str(d / f"{i}.wav"), 16000, audio)
    out = build_speech_commands(root=str(tmp_path / "processed"), raw_dir=str(raw))
    npz = np.load(out, allow_pickle=True)
    assert npz["temporal_data_linear"].shape[0] == 20
    assert npz["temporal_data_linear"].shape[-1] == 11  # time + 10 MFCC
    assert set(np.unique(npz["labels"])) == set(range(10))


def test_download_helpers_with_mocked_transport(monkeypatch, tmp_path):
    """Zero-egress coverage of the download/unzip/untar helpers (reference
    get_data/download/helpers.py roles): urlretrieve is mocked to write a
    real zip/tar, and the extract + already-present short-circuit paths
    run for real."""
    import io
    import os
    import tarfile
    import zipfile

    from online_neural_cdes_tpu.data import download as dl

    calls = []

    def fake_urlretrieve(url, loc):
        calls.append(url)
        with zipfile.ZipFile(loc, "w") as zf:
            zf.writestr("Data_TRAIN.ts", "@data\n1.0:a\n")

    monkeypatch.setattr("urllib.request.urlretrieve", fake_urlretrieve)

    folder = str(tmp_path / "uea")
    loc = dl.download_zip(folder, "Data", dl.UEA_URL.format(name="Data"))
    assert loc and calls == [dl.UEA_URL.format(name="Data")]
    assert os.path.exists(os.path.join(folder, "Data_TRAIN.ts"))
    # Second call short-circuits (files exist).
    assert dl.download_zip(folder, "Data", "http://never-hit") is None
    assert calls == [dl.UEA_URL.format(name="Data")]

    # untar path with a real tarball.
    tar_path = str(tmp_path / "sc.tar.gz")
    payload = io.BytesIO(b"audio")
    with tarfile.open(tar_path, "w:gz") as tf:
        info = tarfile.TarInfo("speech/yes/a.wav")
        info.size = len(payload.getvalue())
        payload.seek(0)
        tf.addfile(info, payload)
    out = str(tmp_path / "sc")
    dl.untar(tar_path, out)
    assert os.path.exists(os.path.join(out, "speech/yes/a.wav"))

    assert dl.mkdir_if_not_exists(str(tmp_path / "new")) is False
    assert dl.mkdir_if_not_exists(str(tmp_path / "new")) is True
