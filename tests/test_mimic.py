"""MIMIC-IV task-preparation tests against the reference's documented
semantics (prepare.py:1-10 task overview + per-task exclusion rules)."""

import numpy as np
import pytest

from online_neural_cdes_tpu.data.mimic import (
    _exclude_times,
    _process_continuous_labels,
    _vent_exclusions,
    perform_exclusions,
    prepare_all,
    synthesize_reduced_format,
)


def test_exclude_times_drop_and_reduce():
    temporal = [
        np.array([[0.0, 1.0], [50.0, 2.0]]),
        np.array([[0.0, 1.0], [80.0, 2.0]]),
    ]
    static = np.zeros((2, 3))
    labels = np.array([0.0, 1.0])
    s, t, l = _exclude_times(static, list(temporal), labels, max_time=72.0, method="drop")
    assert len(t) == 1 and l.shape == (1,)

    s, t, l = _exclude_times(static, list(temporal), None, max_time=72.0, method="reduce")
    assert t[1].shape == (1, 2)  # the 80h row is cut


@pytest.mark.smoke
def test_sepsis_windowing():
    times = np.arange(0.0, 30.0)
    ls = np.zeros(30)
    ls[20:] = 1.0  # first positive at t=20
    labels = [np.stack([times, ls], 1)]
    temporal = [np.stack([times, np.random.randn(30)], 1)]
    static = np.zeros((1, 2))
    s, t, l = _process_continuous_labels(static, list(temporal), list(labels))
    # Censored after first_pos + 6 = 26.
    assert t[0][:, 0].max() <= 26.0
    # Ones inside [20-12, 20+6] = [8, 26].
    out_times = t[0][:, 0]
    expected = ((out_times >= 8.0) & (out_times <= 26.0)).astype(float)
    np.testing.assert_array_equal(l[0], expected)


def test_sepsis_early_positive_excluded():
    times = np.arange(0.0, 10.0)
    ls = np.zeros(10)
    ls[2:] = 1.0  # first positive at t=2 < exclude_before=4
    labels = [np.stack([times, ls], 1)]
    temporal = [np.stack([times, np.zeros(10)], 1)]
    s, t, l = _process_continuous_labels(np.zeros((1, 2)), list(temporal), list(labels))
    assert len(t) == 0


def test_ventilation_shift():
    times = np.arange(0.0, 40.0)
    vent = np.zeros(40)
    vent[30:] = 2.0  # goes on vent (code 2) at t=30
    labels = [np.stack([times, vent], 1)]
    temporal = [np.stack([times, np.random.randn(40)], 1)]
    s, t, l = _vent_exclusions(np.zeros((1, 2)), list(temporal), list(labels))
    assert len(t) == 1
    out_times = t[0][:, 0]
    # Censored to max_time - 12 = 27.
    assert out_times.max() <= 27.0
    # Label at t becomes state at ~t+12: positive from t >= 18.  The
    # boundary point t == cut keeps its unshifted value (the reference's
    # loop breaks before updating it, prepare.py:126-135).
    expected = ((out_times >= 18.0) & (out_times < 27.0)).astype(float)
    np.testing.assert_array_equal(l[0], expected)


def test_mortality_labels_shape():
    temporal = [np.array([[0.0, 1.0], [10.0, 2.0]])] * 3
    static = np.zeros((3, 2))
    labels = np.array([0.0, 1.0, 1.0])
    s, t, l = perform_exclusions("Mortality", static, list(temporal), labels)
    assert l.shape == (3, 1)


def test_prepare_all_from_synthetic(tmp_path):
    raw = synthesize_reduced_format(str(tmp_path / "reduced_format.npz"),
                                    num_patients=40, seed=1)
    paths = prepare_all(raw, out_root=str(tmp_path / "processed"))
    assert set(paths) == {"Sepsis", "Mortality", "LOS", "Ventilation"}
    for name, path in paths.items():
        npz = np.load(path, allow_pickle=True)
        assert "temporal_data_rectilinear" in npz.files
        labels = npz["labels"]
        assert len(labels) > 0
        if name in ("Sepsis", "Ventilation"):
            # Online labels are ragged, matching their series lengths.
            raw_t = npz["temporal_data_raw"]
            assert labels.dtype == object
            assert all(len(l) == len(x) for l, x in zip(labels, raw_t))
