"""Full-training-loop dynamics oracle vs the reference trainer (VERDICT r4
ask #2 — the last unpinned reference behaviour).

The reference trains with torch Adam over named-parameter groups where every
param named ``final_linear*`` gets a 10x learning rate
(/root/reference/experiments/ingredients/trainer.py:272-302), torch
``ReduceLROnPlateau(patience, threshold=1e-6, min_lr=1e-7)`` stepped on VAL
LOSS each epoch (trainer.py:423-429), ignite ``EarlyStopping`` /
``ModelCheckpoint`` with strict-improvement semantics on the monitored
score (trainer.py:417-443), a ``shuffle=False`` train DataLoader
(ingredients/loader.py:211), NaN-masked ``TemporalLossWrapper`` for online
tasks (ingredients/metrics.py:26-46) and sklearn AUC epoch metrics
(ingredients/metrics.py:166-224).

ignite and sacred are NOT installed in this image, so this oracle drives
the reference's own torch model through the SAME torch components the
reference delegates every piece of numerical dynamics to — real
``torch.optim.Adam`` (bias correction, eps placement), real torch
``ReduceLROnPlateau`` (rel-threshold bookkeeping, per-group min_lr clamp) —
while the thin ignite handler rules (strict > on the monitored score for
both early stop and best-checkpoint; stop at counter >= patience) are
transcribed from trainer.py:417-443 with citations.  The handler logic is
a few comparisons; the places silent drift can hide (optax-vs-torch Adam,
plateau x 10x-group interaction, masked-loss reductions) all run through
the genuine libraries on both sides.

Both trainers start from IDENTICAL copied initial weights on an identical
tiny synthetic dataset (f64, CPU, natural-cubic control so the knot-side
lookup divergence is moot) and must agree on:
  - the per-epoch validation-loss trajectory (round-off tolerance),
  - the per-epoch LR-scale trajectory EXACTLY (plateau decisions),
  - best epoch, total epochs run (early-stop decision) EXACTLY,
  - final test metrics from the best checkpoint,
  - (online task) the per-epoch sklearn-AUC trajectory.

Marked ``oracle``: excluded from the smoke tier.
"""

import copy
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/modules"
pytestmark = [
    pytest.mark.oracle,
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference checkout not present"
    ),
]


@pytest.fixture(scope="module")
def oracle():
    for sub in ("torchdiffeq", "torchcde"):
        p = os.path.join(REF, sub)
        if p not in sys.path:
            sys.path.insert(0, p)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.test_reference_oracle import _install_autots_stub

    _install_autots_stub()
    import torch
    import torchcde

    torch.set_default_dtype(torch.float64)
    yield torch, torchcde
    torch.set_default_dtype(torch.float32)


# ---------------------------------------------------------------------------
# Reference-side trainer: the reference's model + torch Adam/plateau with the
# ignite handler rules from trainer.py:417-443.
# ---------------------------------------------------------------------------

def _run_reference_trainer(
    torch, model, train_batches, val_xy, test_xy, *,
    lr, plateau_patience, early_stop_patience, max_epochs,
    online=False, compute_auc=False,
):
    """Train the reference torch model with the reference's exact trainer
    dynamics; returns a history dict mirroring harness.train's outputs."""
    from sklearn.metrics import roc_auc_score

    # Optimizer param groups: 10x lr on names starting 'final_linear'
    # (reference setup_optimizer, trainer.py:288-292).
    groups = [
        {"params": p, "lr": lr * 10 if name.startswith("final_linear") else lr}
        for name, p in model.named_parameters()
    ]
    opt = torch.optim.Adam(groups)
    # Plateau scheduler on val loss (trainer.py:423-429).
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, patience=plateau_patience, threshold=1e-6, min_lr=1e-7
    )
    bce = torch.nn.BCEWithLogitsLoss()

    def loss_fn(preds, labels):
        if online:
            # TemporalLossWrapper (ingredients/metrics.py:44-46).
            mask = ~torch.isnan(labels)
            return bce(preds[mask], labels[mask])
        return bce(preds, labels)

    base_lr0 = opt.param_groups[0]["lr"]
    val_losses, val_aucs, lr_scales = [], [], []
    best_score = None
    best_state = copy.deepcopy(model.state_dict())
    best_epoch = 0
    counter = 0
    epochs_run = 0
    val_x, val_y = val_xy
    for epoch in range(max_epochs):
        model.train()
        for xb, yb in train_batches:
            opt.zero_grad()
            loss_fn(model(xb), yb).backward()
            opt.step()
        epochs_run += 1
        model.eval()
        with torch.no_grad():
            vp = model(val_x)
            vloss = float(loss_fn(vp, val_y))
            if compute_auc:
                mask = ~torch.isnan(val_y)
                # IgniteAUC: sigmoid probas + sklearn roc_auc_score
                # (ingredients/metrics.py:125-131,166-169).
                val_aucs.append(float(roc_auc_score(
                    val_y[mask].numpy(),
                    torch.sigmoid(vp.squeeze(-1)[mask.squeeze(-1)]
                                  if online else vp[mask]).numpy(),
                )))
        val_losses.append(vloss)
        # EarlyStopping + ModelCheckpoint ride the monitored score with
        # strict-improvement semantics (trainer.py:417-443; monitored
        # metric here = loss, sign -1).
        score = -vloss
        if best_score is None or score > best_score:
            best_score = score
            best_state = copy.deepcopy(model.state_dict())
            best_epoch = epoch
            counter = 0
        else:
            counter += 1
        sched.step(vloss)
        lr_scales.append(opt.param_groups[0]["lr"] / base_lr0)
        if counter >= early_stop_patience:
            break

    # Best-checkpoint reload + test eval (trainer.py:186-188).
    model.load_state_dict(best_state)
    model.eval()
    test_x, test_y = test_xy
    with torch.no_grad():
        tp = model(test_x)
        tloss = float(loss_fn(tp, test_y))
        tauc = None
        if compute_auc:
            mask = ~torch.isnan(test_y)
            tauc = float(roc_auc_score(
                test_y[mask].numpy(),
                torch.sigmoid(tp.squeeze(-1)[mask.squeeze(-1)]
                              if online else tp[mask]).numpy(),
            ))
    return {
        "val_losses": val_losses,
        "val_aucs": val_aucs,
        "lr_scales": lr_scales,
        "best_epoch": best_epoch,
        "epochs_run": epochs_run,
        "test_loss": tloss,
        "test_auc": tauc,
    }


# ---------------------------------------------------------------------------
# Shared setup: tiny synthetic dataset + weight-copied model pair.
# ---------------------------------------------------------------------------

def _make_dataset(rng, n, L, C, online=False):
    """Synthetic series with a learnable-but-noisy binary label."""
    x = rng.normal(size=(n, L, C)) * 0.5
    x[:, :, 0] = np.linspace(0.0, 1.0, L)  # time channel
    x[:, :, 1:] = np.cumsum(x[:, :, 1:], axis=1) * 0.5  # smooth-ish paths
    if online:
        # Per-step labels: running sign of channel 1, NaN after a
        # per-sample finish index (finished series — the TemporalLossWrapper
        # target, ingredients/metrics.py:26-46).
        y = (np.cumsum(x[:, :, 1], axis=1) > 0).astype(np.float64)
        finish = rng.integers(L // 2, L + 1, size=n)
        for i, f in enumerate(finish):
            y[i, f:] = np.nan
    else:
        logits = x[:, -1, 1] + 0.5 * x[:, L // 2, 2]
        y = (logits + rng.normal(size=n) * 0.3 > 0).astype(np.float64)
    return x, y


def _build_pair(oracle, C, H, HH, NL, online):
    """Reference NCDE + our NCDE with copied initial weights (cubic control,
    rk4 step_size=1 — the existing end-to-end forward oracle combo)."""
    torch, _ = oracle
    from src.ncde import NeuralCDE as RefNCDE

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from tests.test_reference_oracle import _copy_original_field_ncde_params

    kwargs = dict(
        input_dim=C, hidden_dim=H, output_dim=1, hidden_hidden_dim=HH,
        num_layers=NL, interpolation="cubic", vector_field="original",
        vector_field_type="matmul", adjoint=False, solver="rk4",
        return_sequences=online,
    )
    # The reference inits from torch's GLOBAL rng (OS-seeded): pin it, or
    # the trainer dynamics differ run to run.
    torch.manual_seed(20260819)
    ref = RefNCDE(**kwargs).double()
    ours = NeuralCDE(fused=False, **kwargs)
    params = ours.init(jax.random.PRNGKey(0), dtype=jnp.float64)
    params = _copy_original_field_ncde_params(torch, params, ref)
    return ref, ours, params


def _loaded(coeffs, labels, C, online):
    from online_neural_cdes_tpu.data.loader import LoadedData

    return LoadedData(
        static=None, temporal=np.asarray(coeffs), labels=np.asarray(labels),
        input_dim=C, output_dim=1, static_dim=None,
        model_interpolation="cubic", return_sequences=online,
    )


def _run_both(oracle, *, online, n_train, n_val, n_test, L, C, H, HH, NL,
              lr, batch_size, plateau_patience, early_stop_patience,
              max_epochs, seed):
    torch, torchcde = oracle
    from online_neural_cdes_tpu.data.loader import Batches
    from online_neural_cdes_tpu.models.ncde import NeuralCDE  # noqa: F401
    from online_neural_cdes_tpu.ops.interpolation import natural_cubic_coeffs
    from online_neural_cdes_tpu.training.harness import ModelBundle, train

    rng = np.random.default_rng(seed)
    n = n_train + n_val + n_test
    x, y = _make_dataset(rng, n, L, C, online=online)

    coeffs_j = np.asarray(natural_cubic_coeffs(jnp.asarray(x)))
    coeffs_t = torchcde.natural_cubic_coeffs(torch.tensor(x))

    sl_tr = slice(0, n_train)
    sl_va = slice(n_train, n_train + n_val)
    sl_te = slice(n_train + n_val, n)

    ref, ours, params0 = _build_pair(oracle, C, H, HH, NL, online)

    # --- reference side ---------------------------------------------------
    def t_labels(sl):
        lab = torch.tensor(y[sl])
        return lab.unsqueeze(-1) if online else lab.unsqueeze(-1)

    # shuffle=False DataLoader (ingredients/loader.py:211): fixed-order
    # contiguous batches, exactly what Batches yields on array data.
    tr_batches = [
        (coeffs_t[sl_tr][i:i + batch_size], t_labels(sl_tr)[i:i + batch_size])
        for i in range(0, n_train, batch_size)
    ]
    ref_hist = _run_reference_trainer(
        torch, ref, tr_batches,
        (coeffs_t[sl_va], t_labels(sl_va)),
        (coeffs_t[sl_te], t_labels(sl_te)),
        lr=lr, plateau_patience=plateau_patience,
        early_stop_patience=early_stop_patience, max_epochs=max_epochs,
        online=online, compute_auc=True,
    )

    # --- our side -----------------------------------------------------------
    bundle = ModelBundle(ours, "ncde", lambda inputs: inputs, ours.apply)
    results = train(
        bundle,
        _loaded(coeffs_j[sl_tr], y[sl_tr], C, online),
        _loaded(coeffs_j[sl_va], y[sl_va], C, online),
        _loaded(coeffs_j[sl_te], y[sl_te], C, online),
        loss_str="bce", metrics=("loss", "auc"),
        val_metric_to_monitor="loss", lr=lr, final_lr_multiplier=10.0,
        max_epochs=max_epochs, batch_size=batch_size,
        plateau_patience=plateau_patience,
        early_stop_patience=early_stop_patience,
        init_params=params0,
    )
    return ref_hist, results


def _assert_dynamics_match(ref_hist, results, loss_rtol):
    ours_losses = np.array([h["loss"] for h in results["history"]])
    ref_losses = np.array(ref_hist["val_losses"])
    # Early-stop decision: identical epoch counts.
    assert results["epochs_run"] == ref_hist["epochs_run"]
    assert len(ours_losses) == len(ref_losses)
    # Per-epoch val-loss trajectory at round-off-accumulation tolerance.
    np.testing.assert_allclose(ours_losses, ref_losses, rtol=loss_rtol)
    # Plateau decisions: our lr_scale history entry i is the scale USED for
    # epoch i (pre-update); the torch trace records the post-step scale of
    # epoch i, i.e. the scale used for epoch i+1.
    ours_scales = np.array(
        [h["lr_scale"] for h in results["history"]][1:]
    )
    ref_scales = np.array(ref_hist["lr_scales"][:-1])
    # rtol 1e-12: ours multiplies scales (0.1*0.1 = 0.010000000000000002),
    # torch multiplies the lr itself — same decisions, fp product order.
    np.testing.assert_allclose(ours_scales, ref_scales, rtol=1e-12)
    # Best-checkpoint selection.
    assert results["best_epoch"] == ref_hist["best_epoch"]


def test_trainer_dynamics_oneshot(oracle):
    """One-shot BCE task: full trainer loop parity — Adam + 10x readout
    group, plateau decay, early stop, best-checkpoint test metrics."""
    ref_hist, results = _run_both(
        oracle, online=False, n_train=24, n_val=12, n_test=12,
        L=8, C=3, H=6, HH=8, NL=2, lr=0.01, batch_size=12,
        plateau_patience=2, early_stop_patience=8, max_epochs=40, seed=7,
    )
    _assert_dynamics_match(ref_hist, results, loss_rtol=3e-6)
    # A plateau reduction must actually have fired inside the horizon —
    # otherwise the lr_scale trace pins nothing.
    assert any(s < 1.0 for s in ref_hist["lr_scales"]), ref_hist["lr_scales"]
    # Test metrics from the best checkpoint.
    np.testing.assert_allclose(
        results["test.loss"], ref_hist["test_loss"], rtol=3e-6
    )
    np.testing.assert_allclose(
        results["test.auc"], ref_hist["test_auc"], rtol=1e-9
    )


def test_trainer_dynamics_online_temporal_loss_and_auc(oracle):
    """Online task: NaN-masked TemporalLossWrapper + sklearn AUC parity
    through the full loop (ingredients/metrics.py:26-46,166-224)."""
    ref_hist, results = _run_both(
        oracle, online=True, n_train=18, n_val=9, n_test=9,
        L=10, C=3, H=6, HH=8, NL=2, lr=0.01, batch_size=9,
        plateau_patience=2, early_stop_patience=6, max_epochs=25, seed=3,
    )
    _assert_dynamics_match(ref_hist, results, loss_rtol=3e-6)
    # Per-epoch sklearn AUC trajectory (rank statistic: any drift big
    # enough to flip a rank pair would move AUC by ~1/(pos*neg)).
    ours_aucs = np.array([h["auc"] for h in results["history"]])
    np.testing.assert_allclose(
        ours_aucs, np.array(ref_hist["val_aucs"]), atol=1e-12
    )
    np.testing.assert_allclose(
        results["test.auc"], ref_hist["test_auc"], atol=1e-12
    )
    np.testing.assert_allclose(
        results["test.loss"], ref_hist["test_loss"], rtol=3e-6
    )
