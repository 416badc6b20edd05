"""AOT-exported serving artifacts.

The live :class:`~online_neural_cdes_tpu.serving.Predictor` needs the
framework and the model code in the serving process, and re-traces every
bucket shape on startup.  This module serialises the predictor's whole
bucket grid — the coefficient build *and* the forward, staged out to
StableHLO via ``jax.export`` — into one self-contained directory artifact:

* ``manifest.json``   — bucket grid + host-side padding policy,
* ``params.npz``      — the trained leaves, saved once (params stay an
  *argument* of every exported module, so one artifact serves updated
  checkpoints of the same architecture without re-export),
* ``modules/*.bin``   — one serialized ``jax.export.Exported`` per
  (batch-bucket, length-bucket) shape.

``load_predictor`` rebuilds a fully functional ``Predictor`` from the
artifact alone — no model class, coefficient builder, or configuration
needed in the serving process, and the computation is pinned to the
exported StableHLO (``jax.export``'s versioned calling convention), not
to whatever the framework's current code does.  Exports are lowered for
``("tpu", "cpu")`` by default, so the same artifact serves on a TPU pod
and in a CPU integration test.

The reference has no serving path at all (training-harness evaluation
only); this is the deployment half of the serving story, beyond-reference
like `serving.py` itself.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.serving import (
    Predictor, _check_backlog_layout, _round_up,
)

__all__ = [
    "export_predictor",
    "load_predictor",
    "export_stepper",
    "load_stepper",
    "update_params",
]

_MANIFEST = "manifest.json"
_PARAMS = "params.npz"
_MODULES = "modules"
# v1: extension-float leaves stored f32-upcast.  v2: stored as raw
# same-width unsigned-int bit patterns (half the payload).  The reader
# accepts both; the writer stamps v2 so a v1-only loader REFUSES a
# bit-pattern artifact instead of value-casting garbage weights.
_FORMAT_VERSION = 2
_READABLE_FORMAT_VERSIONS = (1, 2)


def _shape_key(batch: int, length: int) -> str:
    return f"b{batch}_l{length}"


def _flatten_params(params):
    """Flatten a params pytree for export, validating that every leaf is
    numeric array data (the npz/ShapeDtypeStruct contract).  Extension
    floats (bfloat16 etc., numpy kind 'V') are numeric — the params writer
    upcasts them for npz and the reader casts back per the manifest."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        numeric = arr.dtype.kind in "biufc"
        if not numeric:
            try:
                numeric = bool(jnp.issubdtype(arr.dtype, jnp.number))
            except TypeError:
                numeric = False
        if not numeric:
            raise ValueError(
                f"non-numeric parameter leaf #{i} (dtype {arr.dtype}): "
                f"{leaf!r}"
            )
    return leaves, treedef


def _flat_spec(leaves):
    return [
        jax.ShapeDtypeStruct(np.shape(l), np.asarray(l).dtype) for l in leaves
    ]


def _sha256(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _stage_params(path, leaves):
    """Serialize params.npz to a temp file and return (tmp_path, sha256)
    WITHOUT publishing it — callers os.replace when their commit protocol
    says so.  Extension float dtypes (bfloat16, float8) store as their
    raw bit patterns via a same-width unsigned-int view — lossless AND
    the size win params_dtype='bfloat16' promises (npz would otherwise
    store them as unrestorable void records); the loader views back per
    the manifest's leaf_dtypes."""
    out = {}
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        if arr.dtype.kind not in "biufc":
            arr = arr.view(np.dtype(f"u{arr.dtype.itemsize}"))
        out[f"p{i:04d}"] = arr
    tmp = os.path.join(path, _PARAMS + ".tmp.npz")
    np.savez(tmp, **out)
    return tmp, _sha256(tmp)


def _write_params(path, leaves):
    """Atomically (re)write params.npz; returns its sha256."""
    tmp, sha = _stage_params(path, leaves)
    os.replace(tmp, os.path.join(path, _PARAMS))
    return sha


def _write_artifact(path, leaves, named_modules, manifest):
    """The one artifact writer: modules/*.bin + params.npz + manifest.
    Pre-existing modules from an earlier export into the same directory
    are removed first — a stale shape file would otherwise be loaded by
    the reader's directory sweep and silently served."""
    mod_dir = os.path.join(path, _MODULES)
    os.makedirs(mod_dir, exist_ok=True)
    for fname in os.listdir(mod_dir):
        if fname.endswith(".bin"):
            os.remove(os.path.join(mod_dir, fname))
    module_sha = {}
    for name, exported in named_modules:
        mod_path = os.path.join(mod_dir, name + ".bin")
        with open(mod_path, "wb") as f:
            f.write(exported.serialize())
        module_sha[name] = _sha256(mod_path)
    params_sha = _write_params(path, leaves)
    manifest = dict(
        manifest,
        format_version=_FORMAT_VERSION,
        leaf_dtypes=[str(np.asarray(l).dtype) for l in leaves],
        # Integrity digests: the loader refuses a corrupted/partially-
        # copied artifact instead of serving garbage weights.
        params_sha256=params_sha,
        module_sha256=module_sha,
    )
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)


def _cast_float_leaves(leaves, params_dtype):
    """Cast floating leaves to ``params_dtype`` (int/bool leaves pass
    through).  The serving-storage lever: bfloat16 params halve the
    artifact's params.npz and the weight HBM traffic every serve step —
    compute still runs in the modules' promoted precision (a bf16 weight
    x f32 activation matmul accumulates in f32 on the MXU)."""
    if params_dtype is None:
        return leaves
    dt = jnp.dtype(params_dtype)
    if not jnp.issubdtype(dt, jnp.floating):
        raise ValueError(
            f"params_dtype must be a floating dtype, got {params_dtype!r}"
        )
    return [
        jnp.asarray(l, dt)
        if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
        else jnp.asarray(l)
        for l in leaves
    ]


def update_params(path: str, params) -> int:
    """Roll a new checkpoint into an existing artifact without re-export:
    params are an *argument* of every exported module, so updating the
    same-architecture weights only rewrites ``params.npz``.  The new tree
    must match the artifact's pytree structure (manifest ``treedef``) and
    every leaf's dtype/shape — a mismatched architecture is rejected
    before anything is overwritten, and the rewrite itself is atomic
    (temp file + rename), so a crash mid-update cannot corrupt the live
    artifact.  Returns the number of leaves written."""
    manifest = _load_manifest(path)  # includes the format_version check
    leaves, treedef = _flatten_params(params)
    if len(leaves) != manifest["n_leaves"]:
        raise ValueError(
            f"new params flatten to {len(leaves)} leaves; the artifact was "
            f"exported with {manifest['n_leaves']} — a different "
            "architecture needs a re-export, not a params update"
        )
    if str(treedef) != manifest["treedef"]:
        raise ValueError(
            "new params' pytree structure differs from the artifact's — "
            "same-index leaves would silently reassign weights across "
            "fields; a different architecture needs a re-export.\n"
            f"  artifact: {manifest['treedef']}\n  new:      {treedef}"
        )
    cast = []
    for i, (leaf, dt) in enumerate(zip(leaves, manifest["leaf_dtypes"])):
        arr = jnp.asarray(leaf)
        if str(arr.dtype) != dt:
            want = jnp.dtype(dt)
            if jnp.issubdtype(arr.dtype, jnp.floating) and jnp.issubdtype(
                want, jnp.floating
            ):
                # Float checkpoints roll into a reduced-precision artifact
                # (e.g. f32 training weights -> a bfloat16 params_dtype
                # export): the modules' input spec pins the dtype.
                arr = arr.astype(want)
            else:
                raise ValueError(
                    f"leaf #{i}: new dtype {arr.dtype} != exported {dt} — "
                    "a different architecture needs a re-export, not a "
                    "params update"
                )
        cast.append(arr)
    leaves = cast
    with np.load(os.path.join(path, _PARAMS)) as old:
        for i, leaf in enumerate(leaves):
            if np.shape(leaf) != old[f"p{i:04d}"].shape:
                raise ValueError(
                    f"leaf #{i}: new shape {np.shape(leaf)} != exported "
                    f"{old[f'p{i:04d}'].shape} — a different architecture "
                    "needs a re-export, not a params update"
                )
    # Two-phase commit (crash-safe AND concurrent-load-safe): stage the
    # new params to a temp file, publish a manifest that accepts EITHER
    # digest (new as primary, the old one as `params_sha256_prev`), then
    # atomically replace params.npz.  A crash or a load() between the two
    # replaces sees old params + a manifest that still accepts them; after
    # the final replace the primary digest matches.  The prev digest only
    # ever names a legitimate earlier version of this same artifact.
    tmp_params, params_sha = _stage_params(path, leaves)
    manifest["params_sha256_prev"] = manifest.get("params_sha256")
    manifest["params_sha256"] = params_sha
    if any(np.asarray(l).dtype.kind not in "biufc" for l in leaves):
        # The staged file uses the v2 bit-pattern encoding; stamp the
        # version so a v1-only loader refuses instead of value-casting
        # garbage weights.
        manifest["format_version"] = _FORMAT_VERSION
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(path, _MANIFEST))
    os.replace(tmp_params, os.path.join(path, _PARAMS))
    return len(leaves)


def _read_artifact(path: str, expected_artifact: str):
    """The one artifact reader: (manifest, flat params, deserialized
    modules keyed by file stem)."""
    from jax import export as jax_export

    manifest = _read_manifest(path, expected_artifact)
    # Integrity: digests are stamped at export/update time; a mismatch
    # means a corrupted or partially-copied artifact — refuse loudly
    # instead of serving garbage weights.  (Absent on pre-digest
    # artifacts — nothing to verify against.)
    want_params = manifest.get("params_sha256")
    if want_params is not None:
        got = _sha256(os.path.join(path, _PARAMS))
        # `params_sha256_prev` names the previous legitimate version during
        # update_params' two-phase commit window (manifest replaced before
        # params.npz) — accepting it keeps concurrent loads and crash
        # recovery working without weakening corruption detection.
        accepted = {want_params, manifest.get("params_sha256_prev")}
        if got not in accepted:
            raise ValueError(
                f"artifact integrity check failed: params.npz sha256 "
                f"{got[:12]}… != manifest {want_params[:12]}… — the "
                "artifact is corrupted or was partially copied; re-export "
                "or restore from a good copy"
            )
    for name, want in (manifest.get("module_sha256") or {}).items():
        mod_path = os.path.join(path, _MODULES, name + ".bin")
        if not os.path.exists(mod_path) or _sha256(mod_path) != want:
            raise ValueError(
                f"artifact integrity check failed: module {name!r} is "
                "missing or corrupted — re-export or restore from a good "
                "copy"
            )
    npz = np.load(os.path.join(path, _PARAMS))
    # Restore the exported dtypes: extension floats were written as raw
    # same-width unsigned-int bit patterns (view back, lossless); earlier
    # artifacts stored them f32-upcast (value-cast covers those).
    flat = []
    for i, dt in enumerate(manifest["leaf_dtypes"]):
        raw = npz[f"p{i:04d}"]
        want = np.dtype(dt)  # ml_dtypes registers bfloat16/float8 names
        if (raw.dtype != want and raw.dtype.kind == "u"
                and want.kind not in "biufc"
                and raw.dtype.itemsize == want.itemsize):
            raw = raw.view(want)
        flat.append(jnp.asarray(raw, dtype=want))
    modules = {}
    mod_dir = os.path.join(path, _MODULES)
    listed = manifest.get("module_sha256")
    if listed:
        # The digest map is authoritative: load exactly the exported set
        # (a stray .bin dropped into the directory is never served).
        names = [n + ".bin" for n in listed]
    else:  # pre-digest artifact: directory sweep
        names = [f for f in os.listdir(mod_dir) if f.endswith(".bin")]
    for fname in names:
        with open(os.path.join(mod_dir, fname), "rb") as f:
            modules[fname[: -len(".bin")]] = jax_export.deserialize(f.read())
    return manifest, flat, modules


def export_predictor(
    predictor: Predictor,
    path: str,
    *,
    channels: int,
    max_length: int,
    static_dim: Optional[int] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    params_dtype: Optional[str] = None,
) -> int:
    """Serialize ``predictor``'s full bucket grid to ``path``.

    ``params_dtype``: optional floating dtype (e.g. ``"bfloat16"``) to
    store the parameters in — halves the artifact's weight payload and
    the per-request weight HBM traffic at serve time; outputs then match
    the f32 predictor to reduced-precision tolerance rather than
    bit-exactly.  Updates via :func:`update_params` cast float
    checkpoints to the artifact's dtype automatically.

    Each exported module computes ``model.apply(params, coeff_fn(series))``
    (with the static-feature tuple wrapped in when ``static_dim`` is given)
    from flat parameter leaves and the host-padded raw series — the same
    device computation ``predict`` dispatches, so ``load_predictor(path)``
    serves bit-identically to the live predictor (tested).

    Requires a jit-traceable ``coeff_fn`` (all the shipped coefficient
    builders and bundle ``prepare_batch`` adapters are) and a single-device
    predictor — the artifact itself is mesh-agnostic: shard at serve time
    with ``load_predictor(path, mesh=...)`` (XLA propagates the batch
    sharding through the deserialized module, tested).

    Returns the number of shapes exported.
    """
    from jax import export as jax_export

    if predictor.mesh is not None:
        raise ValueError(
            "cannot export a mesh-sharded Predictor: jax.export stages a "
            "single-device program. Export the plain predictor and shard "
            "at serve time with load_predictor(path, mesh=...) instead."
        )
    if static_dim is not None and not predictor.accept_static:
        raise ValueError(
            "static_dim given but this predictor rejects static features "
            "(accept_static=False)"
        )

    leaves, treedef = _flatten_params(predictor.params)
    leaves = _cast_float_leaves(leaves, params_dtype)
    model, coeff_fn = predictor.model, predictor.coeff_fn

    if static_dim is None:

        def fwd(flat, series):
            params = jax.tree_util.tree_unflatten(treedef, flat)
            return model.apply(params, coeff_fn(series))

    else:

        def fwd(flat, static, series):
            params = jax.tree_util.tree_unflatten(treedef, flat)
            return model.apply(params, (static, coeff_fn(series)))

    flat_spec = _flat_spec(leaves)
    shapes = predictor.bucket_grid(max_length)
    named_modules = []
    for b, L in shapes:
        series_spec = jax.ShapeDtypeStruct((b, L, channels), jnp.float32)
        if static_dim is None:
            args = (flat_spec, series_spec)
        else:
            static_spec = jax.ShapeDtypeStruct((b, static_dim), jnp.float32)
            args = (flat_spec, static_spec, series_spec)
        exported = jax_export.export(jax.jit(fwd), platforms=list(platforms))(
            *args
        )
        named_modules.append((_shape_key(b, L), exported))

    manifest = {
        "artifact": "predictor",
        "treedef": str(treedef),
        "batch_buckets": list(predictor.batch_buckets),
        "length_multiple": predictor.length_multiple,
        "channels": channels,
        "static_dim": static_dim,
        "max_length": _round_up(max_length, predictor.length_multiple),
        "rectilinear_rows": predictor.rectilinear_rows,
        "pad_forward_fill": predictor.pad_forward_fill,
        "return_sequences": bool(
            getattr(predictor.model, "return_sequences", False)
        ),
        "platforms": list(platforms),
        "n_leaves": len(leaves),
    }
    _write_artifact(path, leaves, named_modules, manifest)
    return len(shapes)


def _load_manifest(path: str) -> dict:
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest["format_version"] not in _READABLE_FORMAT_VERSIONS:
        raise ValueError(
            f"artifact format v{manifest['format_version']} not in "
            f"{_READABLE_FORMAT_VERSIONS} supported by this loader"
        )
    return manifest


def _read_manifest(path: str, expected_artifact: str) -> dict:
    manifest = _load_manifest(path)
    artifact = manifest.get("artifact", "predictor")
    if artifact != expected_artifact:
        raise ValueError(
            f"this artifact is a {artifact!r}; use "
            f"load_{artifact}() instead of load_{expected_artifact}()"
        )
    return manifest


def load_predictor(path: str, mesh=None) -> Predictor:
    """Rebuild a serving-ready :class:`Predictor` from an artifact directory
    written by :func:`export_predictor` — no model code required.

    The returned predictor has the artifact's bucket grid and padding
    policy; every shape the grid covers runs the deserialized StableHLO
    (first call per shape compiles it — reuse the persistent compilation
    cache for instant restarts).  Requests outside the grid raise with the
    re-export recipe instead of silently retracing (there is nothing to
    retrace: the artifact carries no Python model).

    ``mesh``: optional data-parallel ``jax.sharding.Mesh`` — the loaded
    params replicate and every bucket batch shards over it, exactly like
    a live ``Predictor(mesh=...)`` (the artifact is single-device
    StableHLO; XLA re-propagates the batch sharding through it at
    compile time, so one exported artifact scales from one chip to a
    slice)."""
    manifest, flat, modules = _read_artifact(path, "predictor")
    static_dim = manifest["static_dim"]
    max_length = manifest["max_length"]

    class _ExportedModel:
        """Shape-dispatching shim: ``apply`` routes each (batch, length)
        bucket to its deserialized module.  The lookup runs at trace time
        (shapes are static under jit), so a missing shape fails loudly at
        dispatch, never on device."""

        return_sequences = manifest["return_sequences"]

        @staticmethod
        def apply(flat_params, inputs):
            if static_dim is not None:
                if not isinstance(inputs, tuple):
                    raise ValueError(
                        f"artifact was exported with static_dim={static_dim}:"
                        " every request must pass static features"
                    )
                static, series = inputs
            else:
                static, series = None, inputs
            key = _shape_key(series.shape[0], series.shape[1])
            if key not in modules:
                raise ValueError(
                    f"shape {tuple(series.shape)} is outside the exported "
                    f"grid (buckets {manifest['batch_buckets']}, lengths "
                    f"<= {max_length}); re-export with export_predictor("
                    "..., max_length=...) covering it"
                )
            if static is None:
                return modules[key].call(flat_params, series)
            return modules[key].call(flat_params, static, series)

    pred = Predictor(
        _ExportedModel,
        flat,
        coeff_fn=None,  # the coefficient build is inside the modules
        batch_buckets=manifest["batch_buckets"],
        length_multiple=manifest["length_multiple"],
        rectilinear_rows=manifest["rectilinear_rows"],
        pad_forward_fill=manifest["pad_forward_fill"],
        accept_static=static_dim is not None,
        mesh=mesh,
    )
    return pred


def export_stepper(
    stepper,
    path: str,
    *,
    batch_sizes: Sequence[int],
    channels: int,
    platforms: Sequence[str] = ("tpu", "cpu"),
    params_dtype: Optional[str] = None,
    block_sizes: Sequence[int] = (),
) -> int:
    """Serialize an :class:`~online_neural_cdes_tpu.serving.OnlineNCDEStepper`
    — the streaming (one-observation-at-a-time) serving surface — for each
    stream-batch size in ``batch_sizes``.  Three modules per size: ``init``
    (first observations -> hidden state), ``step`` (advance one observation
    = the two rectilinear control pieces, returning the per-observation
    output), and ``readout`` (state -> output, for reading y before the
    first step).  Params ride as arguments, exactly like
    :func:`export_predictor`.  Returns the number of modules written.

    ``block_sizes``: optional catch-up block lengths K — each adds a
    ``step_block`` module advancing through (K, B, C) observations in ONE
    dispatch (the live ``step_many``); the loaded stepper's ``step_many``
    chunks a backlog into the largest exported blocks and single steps."""
    from jax import export as jax_export

    leaves, treedef = _flatten_params(stepper.params)
    leaves = _cast_float_leaves(leaves, params_dtype)
    flat_spec = _flat_spec(leaves)
    static = stepper.static
    static_dim = None if static is None else int(static.shape[-1])
    hidden = int(stepper.model.hidden_dim)
    advance = stepper._make_step()
    init_fn = stepper._init_fn

    def step_mod(flat, z, x_prev, x_new):
        params = jax.tree_util.tree_unflatten(treedef, flat)
        return advance(params, z, x_prev, x_new)

    def readout_mod(flat, z):
        params = jax.tree_util.tree_unflatten(treedef, flat)
        model = stepper.model
        if model.apply_final_linear:
            from online_neural_cdes_tpu.utils.params import linear_apply

            return linear_apply(params["final"], z)
        return z

    if static_dim is None:

        def init_mod(flat, x0):
            params = jax.tree_util.tree_unflatten(treedef, flat)
            return init_fn(params, x0, None)

    else:

        def init_mod(flat, x0, st):
            params = jax.tree_util.tree_unflatten(treedef, flat)
            return init_fn(params, x0, st)

    block_fn = stepper._make_step_block()

    def block_mod(flat, z, x_prev, xs):
        params = jax.tree_util.tree_unflatten(treedef, flat)
        return block_fn(params, z, x_prev, xs)

    named_modules = []
    for b in batch_sizes:
        z_spec = jax.ShapeDtypeStruct((b, hidden), jnp.float32)
        x_spec = jax.ShapeDtypeStruct((b, channels), jnp.float32)
        init_args = (flat_spec, x_spec)
        if static_dim is not None:
            init_args += (jax.ShapeDtypeStruct((b, static_dim), jnp.float32),)
        for name, fn, args in (
            ("step", step_mod, (flat_spec, z_spec, x_spec, x_spec)),
            ("init", init_mod, init_args),
            ("readout", readout_mod, (flat_spec, z_spec)),
        ):
            exported = jax_export.export(
                jax.jit(fn), platforms=list(platforms)
            )(*args)
            named_modules.append((f"{name}_b{b}", exported))
        for k in block_sizes:
            xs_spec = jax.ShapeDtypeStruct((int(k), b, channels),
                                           jnp.float32)
            exported = jax_export.export(
                jax.jit(block_mod), platforms=list(platforms)
            )(flat_spec, z_spec, x_spec, xs_spec)
            named_modules.append((f"stepblock{int(k)}_b{b}", exported))

    manifest = {
        "artifact": "stepper",
        "treedef": str(treedef),
        "batch_sizes": sorted(int(b) for b in batch_sizes),
        "block_sizes": sorted(int(k) for k in block_sizes),
        "channels": channels,
        "hidden_dim": hidden,
        "static_dim": static_dim,
        "platforms": list(platforms),
        "n_leaves": len(leaves),
    }
    _write_artifact(path, leaves, named_modules, manifest)
    return len(named_modules)


class _LoadedStepper:
    """Streaming server rebuilt from a stepper artifact: the same
    ``init(x0) -> state``, ``step(state, x_new) -> (state, y)`` and
    ``readout(z)`` API as the live ``OnlineNCDEStepper``, dispatching each
    call to the deserialized module for its stream-batch size."""

    def __init__(self, manifest, flat, modules, static, mesh=None):
        self._manifest = manifest
        self.mesh = mesh
        self._shard = None  # bound once: ticks must not pay import lookups
        if mesh is not None:
            # Mirror OnlineNCDEStepper(mesh=...): replicate the loaded
            # params, shard per-stream arrays over the data axis — XLA
            # propagates the sharding through the deserialized StableHLO.
            from online_neural_cdes_tpu.parallel.mesh import replicate
            from online_neural_cdes_tpu.serving import _shard_streams

            self._shard = lambda x: _shard_streams(x, mesh)
            flat = replicate(flat, mesh)
            if static is not None:
                static = self._shard(jnp.asarray(static, jnp.float32))
        self._flat = flat
        self._modules = modules
        self._jitted = {}  # per-module jit wrapper: steps must not re-trace
        self.static = static

    def _mod(self, name, b):
        key = f"{name}_b{b}"
        if key not in self._modules:
            raise ValueError(
                f"stream-batch size {b} is outside the exported sizes "
                f"{self._manifest['batch_sizes']}; re-export with "
                "export_stepper(..., batch_sizes=...) covering it"
            )
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self._modules[key].call)
        return self._jitted[key]

    def init(self, x0):
        x0 = jnp.asarray(x0, jnp.float32)
        if self._shard is not None:
            x0 = self._shard(x0)
        b = x0.shape[0]
        if self._manifest["static_dim"] is not None:
            if self.static is None:
                raise ValueError(
                    "artifact was exported with static features: pass "
                    "static= to load_stepper"
                )
            z, filled = self._mod("init", b)(
                self._flat, x0, jnp.asarray(self.static, jnp.float32)
            )
        else:
            z, filled = self._mod("init", b)(self._flat, x0)
        return {"z": z, "last_obs": filled}

    def step(self, state, x_new):
        b = state["z"].shape[0]
        x_new = jnp.asarray(x_new, jnp.float32)
        if self._shard is not None:
            x_new = self._shard(x_new)
        z, filled, y = self._mod("step", b)(
            self._flat, state["z"], state["last_obs"], x_new,
        )
        return {"z": z, "last_obs": filled}, y

    def step_many(self, state, xs):
        """Catch-up through a (K, B, C) backlog, mirroring the live
        ``step_many``: greedily dispatch the largest exported
        ``block_sizes`` modules (one round-trip per block), then single
        steps for the remainder.  Exact — same per-tick arithmetic."""
        xs = jnp.asarray(xs, jnp.float32)
        b = state["z"].shape[0]
        _check_backlog_layout(xs, b)
        if xs.shape[0] == 0:
            # Match the live stepper's empty-scan result: (0, B, out),
            # with out read from the step module's output signature.
            y_aval = self._modules[f"step_b{b}"].out_avals[-1]
            return state, jnp.zeros((0,) + tuple(y_aval.shape),
                                    y_aval.dtype)
        if self._shard is not None:
            from online_neural_cdes_tpu.serving import _shard_block

            xs = _shard_block(xs, self.mesh)
        blocks = sorted(self._manifest.get("block_sizes", []), reverse=True)
        parts, k = [], 0  # (size, B, out) chunks; ONE concatenate at the end
        while k < xs.shape[0]:
            rest = xs.shape[0] - k
            size = next((s for s in blocks
                         if s <= rest and f"stepblock{s}_b{b}" in self._modules),
                        None)
            if size is not None:
                z, filled, ys_blk = self._mod(f"stepblock{size}", b)(
                    self._flat, state["z"], state["last_obs"],
                    xs[k:k + size],
                )
                state = {"z": z, "last_obs": filled}
                parts.append(ys_blk)
                k += size
            else:
                state, y = self.step(state, xs[k])
                parts.append(y[None])
                k += 1
        return state, jnp.concatenate(parts, axis=0)

    def readout(self, z):
        return self._mod("readout", z.shape[0])(self._flat, z)

    def precompile(self) -> int:
        """Warm every exported module's jit cache (init/step/readout per
        stream-batch size, plus any catch-up blocks) with zero
        observations, so the first real tick pays no compile.  Returns
        the number of programs compiled."""
        c = int(self._manifest["channels"])
        compiled = 0
        for b in self._manifest["batch_sizes"]:
            if self._manifest["static_dim"] is not None and (
                self.static is None or self.static.shape[0] != b
            ):
                continue  # static binds one stream population size
            x0 = jnp.zeros((b, c), jnp.float32)
            state = self.init(x0)
            self.readout(state["z"])
            state, _ = self.step(state, x0)
            compiled += 3
            for k in self._manifest.get("block_sizes", []):
                if f"stepblock{k}_b{b}" in self._modules:
                    self.step_many(state, jnp.zeros((int(k), b, c),
                                                    jnp.float32))
                    compiled += 1
        return compiled


def load_stepper(path: str, static=None, mesh=None) -> _LoadedStepper:
    """Rebuild a streaming stepper from an artifact written by
    :func:`export_stepper` — no model code required.  ``static`` binds the
    per-stream static features (required iff the artifact was exported
    from a static-featured stepper), mirroring the live constructor.

    ``mesh``: optional data-parallel ``jax.sharding.Mesh`` — the loaded
    params replicate and the per-stream state dict shards over the data
    axis at ``init``, exactly like ``OnlineNCDEStepper(mesh=...)``.  The
    artifact is single-device StableHLO; XLA re-propagates the stream
    sharding through it at compile time, so one exported stepper artifact
    serves a stream population across a slice.  Every exported
    stream-batch size used must divide the mesh size."""
    manifest, flat, modules = _read_artifact(path, "stepper")
    if static is not None and manifest["static_dim"] is None:
        raise ValueError("artifact has no static head; do not pass static")
    return _LoadedStepper(manifest, flat, modules, static, mesh=mesh)
