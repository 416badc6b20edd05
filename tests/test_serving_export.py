"""AOT serving-artifact tests: export the predictor's bucket grid to a
self-contained StableHLO directory, reload it without the model code, and
serve identically to the live predictor."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
from online_neural_cdes_tpu.serving import Predictor, predictor_from_bundle
from online_neural_cdes_tpu.serving_export import export_predictor, load_predictor


def _predictor(return_sequences=False, static_dim=None):
    model = NeuralCDE(
        input_dim=3, hidden_dim=6, output_dim=2, num_layers=1,
        interpolation="linear", return_sequences=return_sequences,
        adjoint=False, solver="rk4", static_dim=static_dim,
    )
    params = model.init(jax.random.PRNGKey(0))
    return Predictor(
        model, params, coeff_fn=lambda x: linear_interpolation_coeffs(x),
        batch_buckets=(2, 4), length_multiple=8,
    )


def _requests(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        L = int(rng.integers(4, 15))
        s = rng.normal(size=(L, 3)).astype(np.float32)
        s[:, 0] = np.arange(L)
        out.append(s)
    return out


@pytest.mark.smoke
def test_roundtrip_matches_live_predictor(tmp_path):
    """The loaded artifact serves the exact computation the live predictor
    dispatches — same outputs for ragged, batch-padded, chunked requests,
    in both latency (predict) and throughput (predict_many) modes."""
    pred = _predictor(return_sequences=False)
    n = export_predictor(
        pred, str(tmp_path), channels=3, max_length=16, platforms=("cpu",)
    )
    assert n == 2 * 2  # batch buckets (2, 4) x lengths (8, 16)

    loaded = load_predictor(str(tmp_path))
    reqs = _requests(5, seed=1)  # 5 > top bucket 4 -> chunked
    live = pred.predict(reqs)
    served = loaded.predict(reqs)
    assert len(served) == 5
    for a, b in zip(live, served):
        np.testing.assert_array_equal(a, b)

    many_live = pred.predict_many([reqs[:2], reqs[2:]])
    many_served = loaded.predict_many([reqs[:2], reqs[2:]])
    for batch_a, batch_b in zip(many_live, many_served):
        for a, b in zip(batch_a, batch_b):
            np.testing.assert_array_equal(a, b)


def test_roundtrip_sequence_outputs_and_manifest(tmp_path):
    """Sequence outputs come back truncated per request, and the manifest
    records the padding policy the loader must reproduce."""
    pred = _predictor(return_sequences=True)
    export_predictor(
        pred, str(tmp_path), channels=3, max_length=16, platforms=("cpu",)
    )
    manifest = json.load(open(tmp_path / "manifest.json"))
    assert manifest["return_sequences"] is True
    assert manifest["batch_buckets"] == [2, 4]
    assert manifest["pad_forward_fill"] is True

    loaded = load_predictor(str(tmp_path))
    reqs = _requests(3, seed=2)
    for a, b in zip(pred.predict(reqs), loaded.predict(reqs)):
        assert b.shape == a.shape  # (L_i, 2) per request
        np.testing.assert_array_equal(a, b)


def test_static_features_roundtrip(tmp_path):
    pred = _predictor(static_dim=4)
    export_predictor(
        pred, str(tmp_path), channels=3, max_length=16, static_dim=4,
        platforms=("cpu",),
    )
    loaded = load_predictor(str(tmp_path))
    reqs = _requests(3, seed=3)
    static = np.random.default_rng(3).normal(size=(3, 4)).astype(np.float32)
    for a, b in zip(pred.predict(reqs, static=static),
                    loaded.predict(reqs, static=static)):
        np.testing.assert_array_equal(a, b)
    # The artifact was exported WITH static: requests must pass it.
    with pytest.raises(ValueError, match="static"):
        loaded.predict(reqs)


def test_out_of_grid_request_raises_with_recipe(tmp_path):
    """The artifact has no Python model to retrace, so an over-length
    request fails loudly with the re-export recipe instead of recompiling
    like the live predictor would."""
    pred = _predictor()
    export_predictor(
        pred, str(tmp_path), channels=3, max_length=16, platforms=("cpu",)
    )
    loaded = load_predictor(str(tmp_path))
    too_long = [np.zeros((24, 3), np.float32)]  # pads to 24 > grid max 16
    with pytest.raises(ValueError, match="re-export"):
        loaded.predict(too_long)


def test_mesh_predictor_rejected():
    from online_neural_cdes_tpu.parallel.mesh import make_mesh

    pred = _predictor()
    pred.mesh = make_mesh()  # simulate a mesh-sharded predictor
    with pytest.raises(ValueError, match="mesh"):
        export_predictor(pred, "/tmp/unused", channels=3, max_length=16)


def test_update_params_rolls_checkpoint_without_reexport(tmp_path):
    """A retrained same-architecture checkpoint drops into the artifact by
    rewriting params.npz; a different architecture is rejected before
    anything is overwritten."""
    from online_neural_cdes_tpu.serving_export import update_params

    pred = _predictor()
    export_predictor(
        pred, str(tmp_path), channels=3, max_length=8, platforms=("cpu",)
    )
    model = pred.model
    new_params = model.init(jax.random.PRNGKey(42))
    update_params(str(tmp_path), new_params)
    reqs = [r[:8] for r in _requests(2, seed=6)]
    fresh = Predictor(
        model, new_params,
        coeff_fn=lambda x: linear_interpolation_coeffs(x),
        batch_buckets=(2, 4), length_multiple=8,
    )
    for a, b in zip(fresh.predict(reqs),
                    load_predictor(str(tmp_path)).predict(reqs)):
        np.testing.assert_array_equal(a, b)

    other = NeuralCDE(
        input_dim=3, hidden_dim=12, output_dim=2, num_layers=1,
        interpolation="linear", adjoint=False, solver="rk4",
    )
    with pytest.raises(ValueError, match="re-export"):
        update_params(str(tmp_path), other.init(jax.random.PRNGKey(0)))
    # The failed update must not have corrupted the artifact.
    for a, b in zip(fresh.predict(reqs),
                    load_predictor(str(tmp_path)).predict(reqs)):
        np.testing.assert_array_equal(a, b)


def test_reexport_removes_stale_shape_modules(tmp_path):
    """Re-exporting into the same directory with a smaller grid must not
    leave the old grid's modules behind — a stale shape file would be
    loaded by the reader's directory sweep and silently served."""
    pred = _predictor()
    export_predictor(
        pred, str(tmp_path), channels=3, max_length=16, platforms=("cpu",)
    )
    export_predictor(
        pred, str(tmp_path), channels=3, max_length=8, platforms=("cpu",)
    )
    loaded = load_predictor(str(tmp_path))
    with pytest.raises(ValueError, match="re-export"):
        loaded.predict([np.zeros((12, 3), np.float32)])  # pads to 16


class _TinyLinear:
    """Minimal model for params-structure tests: dict params, no NCDE."""

    return_sequences = False

    @staticmethod
    def apply(params, x):
        return x[:, -1] @ params["w"] + params["b"]


def test_update_params_rejects_renamed_tree_same_shapes(tmp_path):
    """Structural identity is checked via the manifest treedef: a tree
    with identical leaf count/shapes/dtypes but different field names must
    be rejected (index-wise restore would scramble weights silently)."""
    from online_neural_cdes_tpu.serving_export import update_params

    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    pred = Predictor(_TinyLinear, params, batch_buckets=(2,),
                     length_multiple=8)
    export_predictor(
        pred, str(tmp_path), channels=3, max_length=8, platforms=("cpu",)
    )
    renamed = {"weight": jnp.ones((3, 2)), "bias": jnp.zeros((2,))}
    with pytest.raises(ValueError, match="structure"):
        update_params(str(tmp_path), renamed)


def test_bfloat16_params_roundtrip(tmp_path):
    """Extension-float leaves survive the artifact: npz stores them
    upcast, the manifest records the original dtype, and the loader casts
    back to match the modules' input specs."""
    params = {
        "w": jnp.ones((3, 2), jnp.bfloat16) * 0.5,
        "b": jnp.zeros((2,), jnp.float32),
    }
    pred = Predictor(_TinyLinear, params, batch_buckets=(2,),
                     length_multiple=8)
    export_predictor(
        pred, str(tmp_path), channels=3, max_length=8, platforms=("cpu",)
    )
    loaded = load_predictor(str(tmp_path))
    # dict leaves flatten sorted: [b (f32), w (bf16)]
    assert loaded.params[1].dtype == jnp.bfloat16
    reqs = [np.ones((8, 3), np.float32)] * 2
    for a, b in zip(pred.predict(reqs), loaded.predict(reqs)):
        np.testing.assert_array_equal(a, b)


def test_loaded_artifact_shards_over_mesh(tmp_path):
    """One exported artifact scales from one device to a slice:
    load_predictor(mesh=) shards every bucket batch over the data axis
    (XLA re-propagates the sharding through the deserialized StableHLO)
    and serves the same outputs as the unsharded load."""
    from online_neural_cdes_tpu.ops.interpolation import (
        linear_interpolation_coeffs as lic,
    )
    from online_neural_cdes_tpu.parallel.mesh import make_mesh

    model = NeuralCDE(
        input_dim=3, hidden_dim=6, output_dim=2, num_layers=1,
        interpolation="linear", adjoint=False, solver="rk4",
    )
    params = model.init(jax.random.PRNGKey(0))
    pred = Predictor(model, params, coeff_fn=lambda x: lic(x),
                     batch_buckets=(8,), length_multiple=8)
    export_predictor(
        pred, str(tmp_path), channels=3, max_length=8, platforms=("cpu",)
    )
    mesh = make_mesh()
    plain = load_predictor(str(tmp_path))
    sharded = load_predictor(str(tmp_path), mesh=mesh)
    reqs = [r[:8] for r in _requests(6, seed=9)]
    for a, b in zip(plain.predict(reqs), sharded.predict(reqs)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_recurrent_bundle_exports(tmp_path):
    """The full-zoo serving path survives export: a gru-d bundle's
    prepare_batch (mask/delta derivation) stages into the artifact."""
    from online_neural_cdes_tpu.training.harness import setup_model

    bundle = setup_model(
        "gru-d", input_dim=3, output_dim=2, hidden_dim=6,
        return_sequences=True,
    )
    params = bundle.init(jax.random.PRNGKey(0))
    pred = predictor_from_bundle(
        bundle, params, batch_buckets=(2,), length_multiple=8
    )
    export_predictor(
        pred, str(tmp_path), channels=3, max_length=8, platforms=("cpu",)
    )
    loaded = load_predictor(str(tmp_path))
    assert loaded.pad_forward_fill is False  # NaN padding policy survived
    reqs = _requests(2, seed=4)
    reqs = [r[:8] for r in reqs]
    for a, b in zip(pred.predict(reqs), loaded.predict(reqs)):
        np.testing.assert_array_equal(a, b)


def _stepper(static_dim=None, B=3):
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper

    rng = np.random.default_rng(7)
    model = NeuralCDE(
        input_dim=3, hidden_dim=8, output_dim=2, hidden_hidden_dim=12,
        num_layers=1, interpolation="rectilinear", return_sequences=True,
        adjoint=False, solver="rk4", static_dim=static_dim,
    )
    params = model.init(jax.random.PRNGKey(0))
    static = (
        None if static_dim is None
        else np.asarray(rng.normal(size=(B, static_dim)), np.float32)
    )
    return OnlineNCDEStepper(model, params, static=static), static


def _stream(B, L, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, L, 3)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    x[1, 2, 1] = np.nan  # held value mid-stream
    return x


def test_stepper_roundtrip_matches_live(tmp_path):
    """The streaming artifact advances state identically to the live
    stepper — init, every step's output, and the readout — including a
    held (NaN) observation."""
    from online_neural_cdes_tpu.serving_export import (
        export_stepper, load_stepper,
    )

    stepper, _ = _stepper()
    n = export_stepper(
        stepper, str(tmp_path), batch_sizes=(3,), channels=3,
        platforms=("cpu",),
    )
    assert n == 3  # step + init + readout
    loaded = load_stepper(str(tmp_path))

    x = _stream(3, 5)
    s_live = stepper.init(x[:, 0])
    s_art = loaded.init(x[:, 0])
    np.testing.assert_array_equal(
        np.asarray(stepper.readout(s_live["z"])),
        np.asarray(loaded.readout(s_art["z"])),
    )
    for k in range(1, 5):
        s_live, y_live = stepper.step(s_live, x[:, k])
        s_art, y_art = loaded.step(s_art, x[:, k])
        np.testing.assert_array_equal(np.asarray(y_live), np.asarray(y_art))
        np.testing.assert_array_equal(
            np.asarray(s_live["last_obs"]), np.asarray(s_art["last_obs"])
        )


def test_stepper_static_roundtrip_and_guards(tmp_path):
    from online_neural_cdes_tpu.serving_export import (
        export_stepper, load_stepper,
    )

    stepper, static = _stepper(static_dim=2)
    export_stepper(
        stepper, str(tmp_path), batch_sizes=(3,), channels=3,
        platforms=("cpu",),
    )
    loaded = load_stepper(str(tmp_path), static=static)
    x = _stream(3, 4, seed=1)
    s_live, s_art = stepper.init(x[:, 0]), loaded.init(x[:, 0])
    for k in range(1, 4):
        s_live, y_live = stepper.step(s_live, x[:, k])
        s_art, y_art = loaded.step(s_art, x[:, k])
        np.testing.assert_array_equal(np.asarray(y_live), np.asarray(y_art))
    # Static is required for a static-exported artifact...
    with pytest.raises(ValueError, match="static"):
        load_stepper(str(tmp_path)).init(x[:, 0])
    # ...and an unexported batch size names the exported ones.
    with pytest.raises(ValueError, match="re-export"):
        loaded.init(np.zeros((5, 3), np.float32))


def test_stepper_and_predictor_artifacts_are_distinguished(tmp_path):
    from online_neural_cdes_tpu.serving_export import (
        export_stepper, load_stepper,
    )

    stepper, _ = _stepper()
    export_stepper(
        stepper, str(tmp_path), batch_sizes=(3,), channels=3,
        platforms=("cpu",),
    )
    with pytest.raises(ValueError, match="load_stepper"):
        load_predictor(str(tmp_path))
    pred_dir = tmp_path / "pred"
    export_predictor(
        _predictor(), str(pred_dir), channels=3, max_length=8,
        platforms=("cpu",),
    )
    with pytest.raises(ValueError, match="load_predictor"):
        load_stepper(str(pred_dir))


def test_artifact_serves_in_a_fresh_process(tmp_path):
    """The deployment claim: a fresh process given ONLY the artifact
    directory — no model object, params pytree, coefficient builder, or
    configuration from the exporting process — serves it and reproduces
    the live predictor's outputs.  Would catch any accidental Python-side
    dependence on the exporting process's objects (e.g. a closure that
    escaped into the manifest)."""
    pred = _predictor(return_sequences=False)
    export_predictor(
        pred, str(tmp_path), channels=3, max_length=8, platforms=("cpu",)
    )
    reqs = _requests(2, seed=5)
    reqs = [r[:8] for r in reqs]
    expected = pred.predict(reqs)
    np.save(tmp_path / "req0.npy", reqs[0])
    np.save(tmp_path / "req1.npy", reqs[1])
    np.save(tmp_path / "expected.npy", expected[0])

    script = f"""
import numpy as np
import jax
# The JAX_PLATFORMS env var alone does not survive this box's TPU-plugin
# sitecustomize (tests/conftest.py has the same note).
jax.config.update("jax_platforms", "cpu")
from online_neural_cdes_tpu.serving_export import load_predictor
pred = load_predictor({str(tmp_path)!r})
reqs = [np.load({str(tmp_path / 'req0.npy')!r}), np.load({str(tmp_path / 'req1.npy')!r})]
out = pred.predict(reqs)
np.testing.assert_array_equal(out[0], np.load({str(tmp_path / 'expected.npy')!r}))
print("SERVED_OK")
"""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        # Share the suite's persistent compile cache (conftest.py) so the
        # fresh process's tiny compiles are warm on repeat runs.
        JAX_COMPILATION_CACHE_DIR=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
        ),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.02",
        JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0",
    )
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "SERVED_OK" in res.stdout


def test_mesh_sharded_stepper_matches_single_device(tmp_path):
    """A stream population sharded over the data mesh — live stepper and
    reloaded artifact — ticks identically to single-device serving, and
    the per-stream state dict really lives sharded on the mesh."""
    from online_neural_cdes_tpu.parallel.mesh import make_mesh
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper
    from online_neural_cdes_tpu.serving_export import (
        export_stepper, load_stepper,
    )

    B = 8
    stepper, _ = _stepper(B=B)
    mesh = make_mesh(4)
    sharded = OnlineNCDEStepper(stepper.model, stepper.params, mesh=mesh)
    export_stepper(stepper, str(tmp_path), batch_sizes=(B,), channels=3,
                   platforms=("cpu",))
    loaded = load_stepper(str(tmp_path), mesh=mesh)

    x = _stream(B, 5, seed=11)
    s_ref = stepper.init(x[:, 0])
    s_mesh = sharded.init(x[:, 0])
    s_art = loaded.init(x[:, 0])
    # The state dict is sharded over the data axis, not replicated.
    assert not s_mesh["z"].sharding.is_fully_replicated
    assert not s_art["z"].sharding.is_fully_replicated
    for k in range(1, 5):
        s_ref, y_ref = stepper.step(s_ref, x[:, k])
        s_mesh, y_mesh = sharded.step(s_mesh, x[:, k])
        s_art, y_art = loaded.step(s_art, x[:, k])
        np.testing.assert_allclose(np.asarray(y_mesh), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y_art), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sharded.readout(s_mesh["z"])),
        np.asarray(stepper.readout(s_ref["z"])), rtol=1e-6, atol=1e-6)


def test_mesh_sharded_stepper_rejects_indivisible_batch(tmp_path):
    """A stream batch that doesn't divide the mesh fails with the fix."""
    import pytest

    from online_neural_cdes_tpu.parallel.mesh import make_mesh
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper

    stepper, _ = _stepper(B=3)
    sharded = OnlineNCDEStepper(stepper.model, stepper.params,
                                mesh=make_mesh(4))
    with pytest.raises(ValueError, match="does not divide"):
        sharded.init(_stream(3, 4)[:, 0])


def test_bf16_params_export_roundtrip(tmp_path):
    """params_dtype='bfloat16' halves the weight payload; the loaded
    predictor matches the f32 one to reduced-precision tolerance, and an
    f32 checkpoint rolls into the bf16 artifact via update_params."""
    from online_neural_cdes_tpu.serving_export import (
        export_predictor, load_predictor, update_params,
    )

    pred = _predictor()
    f32_dir, bf16_dir = str(tmp_path / "f32"), str(tmp_path / "bf16")
    export_predictor(pred, f32_dir, channels=3, max_length=16,
                     platforms=("cpu",))
    export_predictor(pred, bf16_dir, channels=3, max_length=16,
                     platforms=("cpu",), params_dtype="bfloat16")

    def _payload(d):
        with np.load(os.path.join(d, "params.npz")) as z:
            return sum(z[k].nbytes for k in z.files)

    # Stored weight payload halves (bit-pattern uint16 storage, no f32
    # upcast); the file itself also shrinks.
    assert _payload(bf16_dir) == _payload(f32_dir) // 2
    assert os.path.getsize(os.path.join(bf16_dir, "params.npz")) < \
        os.path.getsize(os.path.join(f32_dir, "params.npz"))

    reqs = _requests(3, seed=9)
    outs_f32 = load_predictor(f32_dir).predict(reqs)
    outs_bf16 = load_predictor(bf16_dir).predict(reqs)
    for a, b in zip(outs_bf16, outs_f32):
        np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
        assert not np.array_equal(a, b)  # really reduced precision

    # Roll the (f32) training checkpoint into the bf16 artifact: floats
    # cast to the manifest dtype; outputs unchanged after the no-op roll.
    n = update_params(bf16_dir, pred.params)
    assert n > 0
    outs_rolled = load_predictor(bf16_dir).predict(reqs)
    for a, b in zip(outs_rolled, outs_bf16):
        np.testing.assert_array_equal(a, b)


def test_bf16_params_export_rejects_non_float_dtype(tmp_path):
    import pytest

    from online_neural_cdes_tpu.serving_export import export_predictor

    with pytest.raises(ValueError, match="floating"):
        export_predictor(_predictor(), str(tmp_path), channels=3,
                         max_length=8, platforms=("cpu",),
                         params_dtype="int8")


def test_mesh_sharded_static_stepper_matches_single_device(tmp_path):
    """Static features shard with the stream population: the MIMIC-shaped
    (static-featured) stepper over a mesh ticks identically to
    single-device, live and from the artifact."""
    from online_neural_cdes_tpu.parallel.mesh import make_mesh
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper
    from online_neural_cdes_tpu.serving_export import (
        export_stepper, load_stepper,
    )

    B = 8
    stepper, static = _stepper(static_dim=5, B=B)
    mesh = make_mesh(4)
    sharded = OnlineNCDEStepper(stepper.model, stepper.params,
                                static=static, mesh=mesh)
    export_stepper(stepper, str(tmp_path), batch_sizes=(B,), channels=3,
                   platforms=("cpu",))
    loaded = load_stepper(str(tmp_path), static=static, mesh=mesh)

    x = _stream(B, 4, seed=13)
    s_ref = stepper.init(x[:, 0])
    s_mesh = sharded.init(x[:, 0])
    s_art = loaded.init(x[:, 0])
    for k in range(1, 4):
        s_ref, y_ref = stepper.step(s_ref, x[:, k])
        s_mesh, y_mesh = sharded.step(s_mesh, x[:, k])
        s_art, y_art = loaded.step(s_art, x[:, k])
        np.testing.assert_allclose(np.asarray(y_mesh), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y_art), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)


def test_multi_axis_mesh_stepper_divides_by_data_axis(tmp_path):
    """On a multi-axis mesh the stream batch must divide the DATA axis, not
    the total device count: batch 4 on a (2 ensemble, 4 data) 8-device
    mesh is valid and ticks match single-device."""
    from jax.sharding import Mesh

    from online_neural_cdes_tpu.serving import OnlineNCDEStepper

    B = 4
    stepper, _ = _stepper(B=B)
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("ensemble", "data"))
    sharded = OnlineNCDEStepper(stepper.model, stepper.params, mesh=mesh)
    x = _stream(B, 4, seed=17)
    s_ref, s_mesh = stepper.init(x[:, 0]), sharded.init(x[:, 0])
    for k in range(1, 4):
        s_ref, y_ref = stepper.step(s_ref, x[:, k])
        s_mesh, y_mesh = sharded.step(s_mesh, x[:, k])
        np.testing.assert_allclose(np.asarray(y_mesh), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)


def test_v1_artifact_still_loads_and_v2_is_stamped(tmp_path):
    """Format compatibility: the reader accepts v1 artifacts (extension
    floats stored f32-upcast) and serves them correctly; new exports stamp
    v2 so a v1-only loader refuses bit-pattern params instead of
    value-casting garbage; update_params rewriting a v1 artifact with
    extension floats bumps the manifest."""
    from online_neural_cdes_tpu.serving_export import update_params

    pred = _predictor()
    bf16_dir = str(tmp_path / "a")
    export_predictor(pred, bf16_dir, channels=3, max_length=16,
                     platforms=("cpu",), params_dtype="bfloat16")
    manifest_path = os.path.join(bf16_dir, "manifest.json")
    manifest = json.load(open(manifest_path))
    assert manifest["format_version"] == 2
    v2_outs = load_predictor(bf16_dir).predict(_requests(2, seed=21))

    # Rewrite as a v1 artifact: f32-upcast params + v1 manifest (the old
    # writer's encoding).
    with np.load(os.path.join(bf16_dir, "params.npz")) as z:
        f32up = {
            k: np.asarray(jnp.asarray(
                z[k].view(np.dtype("bfloat16")), jnp.float32))
            for k in z.files
        }
    np.savez(os.path.join(bf16_dir, "params.npz"), **f32up)
    manifest["format_version"] = 1
    # v1 artifacts predate the integrity digests too.
    manifest.pop("params_sha256", None)
    manifest.pop("module_sha256", None)
    json.dump(manifest, open(manifest_path, "w"))

    v1_outs = load_predictor(bf16_dir).predict(_requests(2, seed=21))
    for a, b in zip(v1_outs, v2_outs):
        np.testing.assert_array_equal(a, b)

    # update_params rolls bit patterns into the v1 artifact -> stamps v2.
    update_params(bf16_dir, pred.params)
    assert json.load(open(manifest_path))["format_version"] == 2
    load_predictor(bf16_dir).predict(_requests(2, seed=21))


def test_bf16_stepper_export_ticks_within_tolerance(tmp_path):
    """params_dtype='bfloat16' on the streaming artifact: ticks track the
    f32 live stepper within reduced-precision tolerance."""
    from online_neural_cdes_tpu.serving_export import (
        export_stepper, load_stepper,
    )

    stepper, _ = _stepper()
    export_stepper(stepper, str(tmp_path), batch_sizes=(3,), channels=3,
                   platforms=("cpu",), params_dtype="bfloat16")
    loaded = load_stepper(str(tmp_path))
    x = _stream(3, 5, seed=23)
    s_live, s_art = stepper.init(x[:, 0]), loaded.init(x[:, 0])
    for k in range(1, 5):
        s_live, y_live = stepper.step(s_live, x[:, k])
        s_art, y_art = loaded.step(s_art, x[:, k])
        np.testing.assert_allclose(np.asarray(y_art), np.asarray(y_live),
                                   rtol=0.05, atol=0.05)
        assert not np.array_equal(np.asarray(y_art), np.asarray(y_live))


def test_exported_step_blocks_catch_up_backlog(tmp_path):
    """block_sizes= exports catch-up modules; the loaded stepper's
    step_many chunks a backlog into the largest blocks plus single-step
    remainder and matches the live sequential ticks exactly."""
    from online_neural_cdes_tpu.serving_export import (
        export_stepper, load_stepper,
    )

    B, K = 3, 7  # blocks of 4 -> one block + 3 singles
    stepper, _ = _stepper(B=B)
    n = export_stepper(stepper, str(tmp_path), batch_sizes=(B,), channels=3,
                       platforms=("cpu",), block_sizes=(4,))
    assert n == 4  # step + init + readout + stepblock4
    loaded = load_stepper(str(tmp_path))

    x = _stream(B, K + 1, seed=29)
    s_live = stepper.init(x[:, 0])
    ys_live = []
    for k in range(1, K + 1):
        s_live, y = stepper.step(s_live, x[:, k])
        ys_live.append(np.asarray(y))

    s_art = loaded.init(x[:, 0])
    # Empty backlog: no-op state, (0, B, out) like the live scan.
    s_art, ys_empty = loaded.step_many(s_art, np.zeros((0, B, 3), np.float32))
    assert ys_empty.shape[0] == 0 and ys_empty.shape[1] == B
    # Wrong layout ((B, K, C) un-swapped) fails loudly, not silently.
    import pytest
    with pytest.raises(ValueError, match="time-major"):
        loaded.step_many(s_art, x[:, 1:])
    xs = np.swapaxes(x[:, 1:], 0, 1)  # (K, B, C)
    s_art, ys_art = loaded.step_many(s_art, xs)
    np.testing.assert_array_equal(np.asarray(ys_art), np.stack(ys_live))
    np.testing.assert_array_equal(np.asarray(s_art["z"]),
                                  np.asarray(s_live["z"]))


def test_artifact_integrity_check_refuses_corruption(tmp_path):
    """Digests stamped at export time: flipping bytes in params.npz (or a
    module) makes the loader refuse instead of serving garbage weights;
    update_params re-stamps the params digest."""
    from online_neural_cdes_tpu.serving_export import update_params

    pred = _predictor()
    export_predictor(pred, str(tmp_path), channels=3, max_length=8,
                     platforms=("cpu",))
    load_predictor(str(tmp_path))  # intact -> loads

    params_path = os.path.join(str(tmp_path), "params.npz")
    blob = bytearray(open(params_path, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(params_path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="integrity"):
        load_predictor(str(tmp_path))

    # Re-export replaces the corrupted artifact wholesale; a subsequent
    # update_params re-stamps the digest and the artifact still loads.
    export_predictor(pred, str(tmp_path), channels=3, max_length=8,
                     platforms=("cpu",))
    update_params(str(tmp_path), pred.params)
    load_predictor(str(tmp_path))

    mod_dir = os.path.join(str(tmp_path), "modules")
    victim = sorted(os.listdir(mod_dir))[0]
    blob = bytearray(open(os.path.join(mod_dir, victim), "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(os.path.join(mod_dir, victim), "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="integrity"):
        load_predictor(str(tmp_path))


def test_stepper_precompile_warms_all_modules(tmp_path):
    """precompile() touches every exported module (+catch-up blocks) so
    the first real tick pays no compile; live stepper analogue too."""
    from online_neural_cdes_tpu.serving_export import (
        export_stepper, load_stepper,
    )

    stepper, _ = _stepper(B=3)
    assert stepper.precompile(3, block_sizes=(4,)) == 3

    export_stepper(stepper, str(tmp_path), batch_sizes=(3,), channels=3,
                   platforms=("cpu",), block_sizes=(4,))
    loaded = load_stepper(str(tmp_path))
    assert loaded.precompile() == 4  # init/step/readout + stepblock4
    # Every module wrapper now sits in the jit cache.
    assert len(loaded._jitted) == 4


def test_update_params_two_phase_commit_crash_window(tmp_path):
    """update_params publishes the manifest (accepting old AND new digests)
    before replacing params.npz — a crash or a concurrent load in the
    window sees old params + a manifest that still accepts them."""
    from online_neural_cdes_tpu.serving_export import update_params

    pred = _predictor()
    export_predictor(pred, str(tmp_path), channels=3, max_length=8,
                     platforms=("cpu",))
    params_path = os.path.join(str(tmp_path), "params.npz")
    old_bytes = open(params_path, "rb").read()

    update_params(str(tmp_path), pred.model.init(jax.random.PRNGKey(9)))
    manifest = json.load(open(tmp_path / "manifest.json"))
    assert manifest["params_sha256_prev"] is not None
    load_predictor(str(tmp_path))  # new params + new digest

    # Simulate the crash window: manifest already replaced, params not yet.
    open(params_path, "wb").write(old_bytes)
    load_predictor(str(tmp_path))  # old params accepted via _prev

    # Anything ELSE is still refused.
    blob = bytearray(old_bytes)
    blob[len(blob) // 2] ^= 0xFF
    open(params_path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="integrity"):
        load_predictor(str(tmp_path))
