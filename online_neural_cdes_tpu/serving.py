"""Batched inference serving.

The reference has no serving path (training-harness evaluation only); this
is the production-inference counterpart for the TPU build: a predictor
that precompiles a small set of (batch, length) bucket shapes, pads
incoming ragged requests into them, runs the jitted forward, and strips
the padding — no recompiles at serve time, deterministic latency per
bucket.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.data.loader import pad_ragged
from online_neural_cdes_tpu.parallel.mesh import (
    DATA_AXIS, data_axis_size as _data_axis_size, replicate, shard_batch,
)

__all__ = ["OnlineNCDEStepper", "Predictor", "predictor_from_bundle"]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _shard_streams(x, mesh):
    """Place a per-stream array with its leading (stream-batch) axis split
    over the mesh's data axis, failing with the fix if it doesn't divide."""
    n_data = _data_axis_size(mesh)
    if x.shape[0] % n_data:
        raise ValueError(
            f"stream batch {x.shape[0]} does not divide the mesh's "
            f"{n_data}-device data axis; pad the stream population to a "
            "multiple of it"
        )
    return shard_batch(x, mesh)


def _check_backlog_layout(xs, n_streams: int):
    """A backlog must be time-major (K, B, C).  The natural pipeline
    layout is (B, K, C) — when B == K a swapped array is shape-consistent
    and would silently scan streams as time, so the stream axis is
    checked against the state explicitly."""
    if xs.ndim != 3 or xs.shape[1] != n_streams:
        raise ValueError(
            f"step_many expects a time-major (K, B={n_streams}, C) "
            f"backlog; got shape {tuple(xs.shape)} — np.swapaxes(xs, 0, 1) "
            "a (B, K, C) array first"
        )


def _shard_block(xs, mesh):
    """Place a (K, B, C) observation block with its STREAM axis (axis 1)
    split over the data axis — the block axis is time and stays local."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_data = _data_axis_size(mesh)
    if xs.shape[1] % n_data:
        raise ValueError(
            f"stream batch {xs.shape[1]} does not divide the mesh's "
            f"{n_data}-device data axis; pad the stream population to a "
            "multiple of it"
        )
    return jax.device_put(xs, NamedSharding(mesh, P(None, DATA_AXIS)))


class Predictor:
    """Jitted bucketed-forward server for a model bundle.

    Args:
        model: object with ``apply(params, inputs)`` (e.g. NeuralCDE).
        params: trained parameter pytree.
        coeff_fn: raw series (B, L, C) -> model inputs (e.g. a coefficient
            builder); identity if requests are already coefficients.
        batch_buckets / length_multiple: the bucket shape grid; requests pad
            up to the nearest bucket.  Call :meth:`precompile` to compile
            the grid up front; otherwise shapes compile on first use.
        rectilinear_rows: set True when the model emits *unfiltered*
            rectilinear sequence rows (``return_filtered_rectilinear=False``
            — 2L-1 rows per length-L request); outputs are then mapped back
            to one row per observation time (the reference's ::2 filtering,
            ncde.py:200-212) before truncating to the request length.
        mesh: optional ``jax.sharding.Mesh`` with a ``"data"`` axis —
            bucket batches shard across it (params replicated, XLA
            propagates the batch sharding through the coefficient build
            and the forward), scaling one predictor over a multi-chip
            slice.  Every batch bucket must divide the data-axis size.
        pad_forward_fill: how the length-pad region is filled.  True
            (default) repeats each request's final row — for interpolated
            controls the pad intervals then have dX = 0, freezing the CDE
            state.  Set False to pad with NaN rows instead for models
            whose preparation derives observation masks from NaN (the
            GRU-family adapters) — fabricated pad "observations" would
            corrupt their mask/delta channels, while NaN pad rows stay
            causally isolated from every request's own rows.
    """

    def __init__(
        self,
        model,
        params,
        coeff_fn=None,
        batch_buckets: Sequence[int] = (1, 8, 64, 256),
        length_multiple: int = 16,
        rectilinear_rows: bool = False,
        mesh=None,
        pad_forward_fill: bool = True,
        accept_static: bool = True,
    ):
        self.model = model
        self.coeff_fn = coeff_fn or (lambda x: x)
        self.batch_buckets = sorted(batch_buckets)
        self.length_multiple = length_multiple
        self.rectilinear_rows = rectilinear_rows
        self.mesh = mesh
        self.pad_forward_fill = pad_forward_fill
        self.accept_static = accept_static
        if mesh is not None:
            n_data = _data_axis_size(mesh)
            bad = [b for b in self.batch_buckets if b % n_data]
            if bad:
                raise ValueError(
                    f"batch_buckets {bad} do not divide the mesh's "
                    f"{n_data}-device data axis; every bucket must shard "
                    "evenly over it"
                )
            params = replicate(params, mesh)
        self.params = params
        self._fwd = jax.jit(lambda p, inputs: model.apply(p, inputs))

    def _bucket_batch(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        return _round_up(n, self.batch_buckets[-1])

    def bucket_grid(self, max_length: int):
        """Every (batch bucket, padded length) shape :meth:`predict` can
        dispatch for requests up to ``max_length`` — the single source of
        truth shared by :meth:`precompile` and the AOT exporter
        (serving_export.py), so warmed/exported shapes can never diverge
        from the shapes serve time produces.  Requests of max_length pad
        UP to the next multiple (pad_ragged rounds up), so the range
        includes that top bucket."""
        top = _round_up(max_length, self.length_multiple)
        lengths = range(self.length_multiple, top + 1, self.length_multiple)
        return [(b, L) for b in self.batch_buckets for L in lengths]

    def precompile(self, channels: int, max_length: int,
                   static_dim: Optional[int] = None) -> int:
        """Warm every (batch bucket, length bucket) jit cache entry with
        zero requests so serve time never compiles.  Returns the number of
        shapes compiled."""
        compiled = 0
        for b, length in self.bucket_grid(max_length):
            series = [np.zeros((length, channels), np.float32)] * b
            static = (
                np.zeros((b, static_dim), np.float32)
                if static_dim else None
            )
            self.predict(series, static=static)
            compiled += 1
        return compiled

    def _dispatch(self, series, static: Optional[np.ndarray]):
        """Pack one <=top-bucket batch and enqueue the jitted forward.
        Returns (device output, request lengths) WITHOUT synchronising —
        the device array is a future until :meth:`_collect` transfers it."""
        if static is not None and not self.accept_static:
            raise ValueError(
                "this predictor's model does not consume static features "
                "(its batch preparation is temporal-only — the reference "
                "GRU/ODE-RNN baselines discard static, setup_model.py) — "
                "call predict without static"
            )
        lengths = [len(s) for s in series]
        n = len(series)
        nb = self._bucket_batch(n)

        padded = pad_ragged(
            [np.asarray(s, np.float32) for s in series],
            bucket_multiple=self.length_multiple,
            forward_fill=self.pad_forward_fill,
        )
        if nb > n:  # pad batch with repeats of the first request
            filler = np.repeat(padded[:1], nb - n, axis=0)
            padded = np.concatenate([padded, filler], axis=0)
            if static is not None:
                static = np.concatenate(
                    [static, np.repeat(static[:1], nb - n, axis=0)], axis=0
                )

        if self.mesh is not None:
            padded = shard_batch(padded, self.mesh)
            if static is not None:
                static = shard_batch(np.asarray(static, np.float32), self.mesh)
        inputs = self.coeff_fn(jnp.asarray(padded))
        if static is not None:
            inputs = (jnp.asarray(static, jnp.float32), inputs)
        return self._fwd(self.params, inputs), lengths

    def _collect(self, device_out, lengths) -> List[np.ndarray]:
        """Transfer a dispatched batch to host (the sync point) and strip
        the padding per request."""
        out = np.asarray(device_out)
        results = []
        for i, L in enumerate(lengths):
            o = out[i]
            if o.ndim >= 1 and getattr(self.model, "return_sequences", False):
                if self.rectilinear_rows:
                    # Unfiltered rectilinear output: rows alternate
                    # time-advance / value-update; every 2nd row is the
                    # state at an observation time.
                    o = o[::2]
                results.append(o[:L])
            else:
                results.append(o)
        return results

    def _chunks(self, series, static: Optional[np.ndarray]):
        """Normalise one request batch (array -> list) and split it into
        <=top-bucket chunks — the single chunking path shared by
        :meth:`predict` and :meth:`predict_many`."""
        if isinstance(series, np.ndarray) and series.ndim == 3:
            series = [s for s in series]
        if not series:
            raise ValueError("empty request batch")
        top = self.batch_buckets[-1]
        for start in range(0, len(series), top):
            st = None if static is None else static[start:start + top]
            yield series[start:start + top], st

    def predict(self, series, static: Optional[np.ndarray] = None) -> List[np.ndarray]:
        """series: list of (L_i, C) raw observations (NaN = missing) or an
        (N, L, C) array.  Returns per-request outputs with padding removed
        (sequence outputs truncated to each request's own length).

        Requests larger than the biggest batch bucket are chunked through
        it, so every executed shape is one ``precompile()`` warmed — the
        no-recompiles-at-serve-time contract holds for any request size."""
        out: List[np.ndarray] = []
        for chunk, st in self._chunks(series, static):
            out.extend(self._collect(*self._dispatch(chunk, st)))
        return out

    def predict_many(
        self,
        batches,
        statics: Optional[Sequence[Optional[np.ndarray]]] = None,
        in_flight: int = 4,
    ) -> List[List[np.ndarray]]:
        """Throughput mode: serve a stream of request batches keeping up to
        ``in_flight`` dispatched batches ahead of the sync point, so each
        batch's host packing, host->device transfer and sync round-trip
        overlap the previous batches' device compute (JAX's async dispatch
        provides the pipelining; the latency-mode :meth:`predict`
        serialises on its per-call sync instead).  Outputs are identical
        to calling :meth:`predict` per batch (tested bit-exact), in order;
        oversized batches chunk through the top bucket like
        :meth:`predict`."""
        from collections import deque

        batches = list(batches)
        statics_list = list(statics) if statics is not None else [None] * len(batches)
        if len(statics_list) != len(batches):
            raise ValueError("statics must match batches in length")

        units = []  # (batch index, series chunk, static chunk)
        for bi, (series, static) in enumerate(zip(batches, statics_list)):
            for chunk, st in self._chunks(series, static):
                units.append((bi, chunk, st))

        results: List[List[np.ndarray]] = [[] for _ in batches]
        pending: deque = deque()

        def drain_one():
            bi, dev, lengths = pending.popleft()
            results[bi].extend(self._collect(dev, lengths))

        for bi, chunk, st in units:
            dev, lengths = self._dispatch(chunk, st)
            pending.append((bi, dev, lengths))
            if len(pending) >= max(int(in_flight), 1):
                drain_one()
        while pending:
            drain_one()
        return results


def predictor_from_bundle(bundle, params, **kw) -> Predictor:
    """Serve any harness ``ModelBundle`` (training/harness.py::setup_model)
    — the full model zoo, including the recurrent baselines whose inputs
    are prepared tensors (GRU-D masks/deltas, gru-intensity channels)
    rather than interpolation coefficients.

    The bundle's ``prepare_batch`` becomes the predictor's ``coeff_fn``
    (override via ``coeff_fn=`` for NCDE bundles, whose prepare is the
    identity over precomputed coefficients) and its ``apply_fn`` the
    forward.  Recurrent bundles pad with NaN rows (``pad_forward_fill=
    False``): their preparation derives observation masks from NaN, so
    forward-fill padding would fabricate observations, while NaN pad rows
    stay causally isolated from every request's own (earlier) rows.

    A recurrent ONE-SHOT bundle is rejected: its output is read after the
    pad rows, which a recurrent cell keeps mutating even on padding
    (unlike the NCDE, whose pad intervals have dX = 0 — see
    ``test_padding_does_not_change_results``).  Build the bundle with
    ``return_sequences=True`` and read each request's final row
    (``outs[i][-1]``) — the one-shot output for the same params.
    """
    recurrent = bundle.model_string not in (
        "ncde", "ncde-stacked", "ncde-attention"
    )
    return_sequences = bool(getattr(bundle.model, "return_sequences", False))
    if recurrent and not return_sequences:
        raise ValueError(
            f"Cannot serve a one-shot {bundle.model_string!r} bundle: a "
            "recurrent cell keeps mutating state across the length-pad "
            "rows, so the final-state output would include padding. Build "
            "the bundle with return_sequences=True and read each "
            "request's final row (outs[i][-1]) instead."
        )

    class _BundleModel:
        apply = staticmethod(bundle.apply_fn)
    _BundleModel.return_sequences = return_sequences

    kw.setdefault("coeff_fn", bundle.prepare_batch)
    kw.setdefault("pad_forward_fill", not recurrent)
    # Recurrent bundle preparation is temporal-only (it drops the static
    # half of (static, temporal) training batches, mirroring the
    # reference's GRU/ODE-RNN baselines) — wrapping static around the
    # PREPARED tensors would hand apply_fn a tuple it cannot consume, so
    # reject static requests loudly instead.
    kw.setdefault("accept_static", not recurrent)
    return Predictor(_BundleModel, params, **kw)


class OnlineNCDEStepper:
    """Streaming (stateful) inference for a **rectilinear** NeuralCDE: advance
    the hidden state one observation at a time.

    The training-side model consumes a whole precomputed coefficient array;
    in production an *online* task receives observations incrementally.
    Rectilinear interpolation makes incremental solving exact: each new
    observation appends exactly two control pieces — a time-advance
    (only the time channel moves) and a value-update (time held) — so the
    hidden state can be advanced without re-solving the history.
    After ``k`` steps the state equals the offline
    ``model.apply(params, coeffs)[:, k]`` at the same observations
    (tested to float tolerance).

    Missing values (NaN) are held at their last observed value, matching
    ``prepare_rectilinear_interpolation``'s forward fill; NaNs in the very
    first observation are zeroed (the data pipeline's initial-NaN
    convention, reference transformers.py:51-76).

    Usage::

        stepper = OnlineNCDEStepper(model, params)
        state = stepper.init(x0)                # (B, C) first observations
        state, y = stepper.step(state, x_new)   # per new (B, C) row
    """

    def __init__(self, model, params, static: Optional[jax.Array] = None,
                 mesh=None):
        from online_neural_cdes_tpu.ops import solvers as _solvers
        from online_neural_cdes_tpu.utils.params import linear_apply

        if model.interpolation != "rectilinear":
            raise ValueError(
                "OnlineNCDEStepper requires interpolation='rectilinear' "
                f"(got {model.interpolation!r}); other schemes are non-causal "
                "or need lookahead."
            )
        if model.solver not in _solvers.FIXED_METHODS:
            raise ValueError("OnlineNCDEStepper requires a fixed-grid solver.")
        if model.vector_field_type != "matmul":
            raise ValueError(
                "OnlineNCDEStepper supports vector_field_type='matmul' only "
                f"(got {model.vector_field_type!r})."
            )
        if model.static_dim is not None and static is None:
            raise ValueError("model has static_dim: pass static features.")
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            # Mesh-sharded streaming: params/static replicate once, the
            # per-stream state shards over the data axis at init, and XLA
            # propagates that sharding through every jitted tick — the
            # same pattern as Predictor(mesh=...), so one stepper scales a
            # stream population over a slice.
            params = replicate(params, mesh)
            if static is not None:
                static = _shard_streams(jnp.asarray(static), mesh)
        self.params = params
        self.static = static
        # Step/init are pure functions of (params, ...) — params ride as a
        # jit argument (and an export argument in serving_export), never a
        # baked-in constant, so checkpoint updates need no re-trace.
        self._step_fn = jax.jit(self._make_step())
        self._init_fn = jax.jit(self._make_init())
        self._block_fn = jax.jit(self._make_step_block())
        self._linear_apply = linear_apply

    def _make_step(self):
        model = self.model
        from online_neural_cdes_tpu.ops import solvers as _solvers
        from online_neural_cdes_tpu.utils.params import linear_apply

        field = model.field
        step = _solvers.tree_fixed_step(model.solver)
        ch = model.rectilinear_time_channel

        def vf(params, dx):
            def f(tt, zz):
                mat = field.apply(params["field"], tt, zz)
                return jnp.einsum("...hi,...i->...h", mat, dx)
            return f

        def one(params, z, dx):
            # Grid spacing is 1 per rectilinear knot (the time CHANNEL
            # carries real time), matching the offline builder's default
            # grid — one solver step per piece (rk4 preset step_size=1).
            return step(
                vf(params, dx), jnp.asarray(0.0, z.dtype),
                jnp.asarray(1.0, z.dtype), z,
            )

        def readout(params, z):
            if model.apply_final_linear:
                return linear_apply(params["final"], z)
            return z

        def advance(params, z, x_prev, x_new):
            filled = jnp.where(jnp.isnan(x_new), x_prev, x_new)
            dx_time = jnp.zeros_like(filled).at[..., ch].set(
                filled[..., ch] - x_prev[..., ch]
            )
            dx_vals = (filled - x_prev).at[..., ch].set(0.0)
            z = one(params, z, dx_time)      # time-advance piece
            z = one(params, z, dx_vals)      # value-update piece
            # Readout inside the jitted step: one dispatch per observation.
            return z, filled, readout(params, z)

        return advance

    def _make_init(self):
        """Pure initial-state function: mirrors the offline _setup_h0
        exactly (models/ncde.py:178-188), including the static-only head
        when use_initial=False.  ``static`` is an argument (None when the
        model has no static head) so the function exports cleanly."""
        model = self.model
        from online_neural_cdes_tpu.utils.params import linear_apply

        def init(params, x0, static):
            x0 = jnp.where(jnp.isnan(x0), 0.0, jnp.asarray(x0))
            if static is None:
                if model.use_initial:
                    z = linear_apply(params["initial"], x0)
                else:
                    z = jnp.zeros(
                        x0.shape[:-1] + (model.hidden_dim,), x0.dtype
                    )
            else:
                if model.use_initial:
                    z = linear_apply(
                        params["initial"],
                        jnp.concatenate([static, x0], axis=-1),
                    )
                else:
                    z = linear_apply(params["initial"], static)
            return z, x0

        return init

    def init(self, x0: jax.Array):
        """State from the first (B, C) observations (NaN -> 0)."""
        x0 = jnp.asarray(x0)
        if self.mesh is not None:
            x0 = _shard_streams(x0, self.mesh)
        z, x0 = self._init_fn(self.params, x0, self.static)
        return {"z": z, "last_obs": x0}

    def step(self, state: dict, x_new: jax.Array):
        """Advance by one observation; returns (new_state, outputs) where
        outputs match the offline model's per-observation rows."""
        x_new = jnp.asarray(x_new)
        if self.mesh is not None:
            x_new = _shard_streams(x_new, self.mesh)
        z, filled, y = self._step_fn(
            self.params, state["z"], state["last_obs"], x_new
        )
        return {"z": z, "last_obs": filled}, y

    def _make_step_block(self):
        advance = self._make_step()

        def block(params, z, x_prev, xs):
            def body(carry, x_new):
                z_, prev_ = carry
                z_, filled, y = advance(params, z_, prev_, x_new)
                return (z_, filled), y

            (z, x_prev), ys = jax.lax.scan(body, (z, x_prev), xs)
            return z, x_prev, ys

        return block

    def step_many(self, state: dict, xs: jax.Array):
        """Catch-up/replay: advance through a BLOCK of K observations
        ``xs`` of shape (K, B, C) in ONE device dispatch (a ``lax.scan``
        of the per-tick body — on a tunneled/remote device this replaces
        K dispatch round-trips with one).  Returns
        ``(new_state, ys)`` with ``ys[k]`` equal to ``step``'s output at
        observation k (exact — same arithmetic, tested).  Each distinct K
        compiles once; chunk a long backlog into fixed-size blocks to
        bound the jit cache."""
        xs = jnp.asarray(xs)
        _check_backlog_layout(xs, state["z"].shape[0])
        if self.mesh is not None:
            # Shard the stream axis (axis 1); the block axis stays local.
            xs = _shard_block(xs, self.mesh)
        z, filled, ys = self._block_fn(
            self.params, state["z"], state["last_obs"], xs
        )
        return {"z": z, "last_obs": filled}, ys

    def readout(self, z: jax.Array):
        if self.model.apply_final_linear:
            return self._linear_apply(self.params["final"], z)
        return z

    def precompile(self, n_streams: int, block_sizes=()) -> int:
        """Warm the jitted init/tick (and optional catch-up-block) caches
        with zero observations so the first real stream pays no compile —
        the stepper analogue of ``Predictor.precompile``.  Returns the
        number of programs compiled."""
        if self.model.static_dim is not None and (
            self.static is None or self.static.shape[0] != n_streams
        ):
            raise ValueError(
                f"precompile(n_streams={n_streams}): static features bind "
                "one stream population "
                f"(shape {None if self.static is None else self.static.shape})"
                " — n_streams must match it"
            )
        c = int(self.model.input_dim)
        x0 = jnp.zeros((n_streams, c), jnp.float32)
        state = self.init(x0)
        state, _ = self.step(state, x0)
        compiled = 2
        for k in block_sizes:
            self.step_many(state, jnp.zeros((int(k), n_streams, c),
                                            jnp.float32))
            compiled += 1
        return compiled
