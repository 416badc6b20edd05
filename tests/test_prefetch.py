"""Input-pipeline prefetching: device placement, ordering, sharding,
exception propagation, and bit-identical training through the harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_neural_cdes_tpu.data.prefetch import prefetch_to_device


@pytest.mark.smoke
def test_prefetch_preserves_order_and_values():
    batches = [(np.full((4, 3), i, np.float32), np.full((4,), i, np.float32))
               for i in range(7)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 7
    for i, (x, y) in enumerate(out):
        assert isinstance(x, jax.Array) and isinstance(y, jax.Array)
        np.testing.assert_array_equal(np.asarray(x), batches[i][0])
        np.testing.assert_array_equal(np.asarray(y), batches[i][1])


def test_prefetch_applies_sharding():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from online_neural_cdes_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("data"))
    batches = [(np.zeros((16, 5), np.float32), np.zeros((16,), np.float32))]
    (x, y), = prefetch_to_device(iter(batches), size=2, sharding=sh)
    assert x.sharding == sh and y.sharding == sh
    assert len(x.addressable_shards) == 8


def test_prefetch_reraises_producer_exception():
    def gen():
        yield np.zeros((2,), np.float32)
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_abandoned_prefetch_releases_producer_thread():
    """Abandoning the iterator mid-stream (exception in the training loop,
    early break) must not leave the producer blocked on the full queue
    holding device-resident batches."""
    import threading
    import time

    batches = [np.full((2,), i, np.float32) for i in range(100)]
    it = prefetch_to_device(iter(batches), size=2)
    next(it)
    it.close()  # what GC does when the consumer's frame unwinds
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not any(t.name == "prefetch" and t.is_alive()
                   for t in threading.enumerate()):
            break
        time.sleep(0.05)
    assert not any(t.name == "prefetch" and t.is_alive()
                   for t in threading.enumerate())


def test_prefetch_rejects_bad_size():
    with pytest.raises(ValueError):
        next(prefetch_to_device(iter([]), size=0))


def test_train_with_prefetch_is_bit_identical():
    """The harness's prefetch=N path must not change numerics — same batches,
    same order, same updates."""
    from online_neural_cdes_tpu.data.loader import LoadedData
    from online_neural_cdes_tpu.data.toy import brownian_motion_data
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
    from online_neural_cdes_tpu.training.harness import setup_model, train

    x, y = brownian_motion_data(jax.random.PRNGKey(0), 96, n_points=4)
    coeffs = np.asarray(linear_interpolation_coeffs(x))
    labels = np.asarray(y[:, -1:])

    def make_data():
        return LoadedData(
            static=None, temporal=coeffs, labels=labels,
            input_dim=2, output_dim=1, static_dim=None,
            model_interpolation="linear", return_sequences=False,
        )

    bundle = setup_model(
        "ncde", input_dim=2, output_dim=1, hidden_dim=8,
        hidden_hidden_dim=8, num_layers=1, interpolation="linear",
        adjoint=False, solver="rk4",
    )

    def run(prefetch):
        return train(
            bundle, make_data(), make_data(), make_data(),
            loss_str="bce", max_epochs=2, batch_size=32, seed=0,
            prefetch=prefetch,
        )

    plain = run(0)
    pre = run(2)
    assert [h["loss"] for h in pre["history"]] == [
        h["loss"] for h in plain["history"]
    ]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        pre["best_params"], plain["best_params"],
    )
