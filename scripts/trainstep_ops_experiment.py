"""Separate-ops vs vmapped co-residency on the FULL flagship train step.

scripts/interleave_experiment.py found that K independent replica chains
expressed as SEPARATE ops in one program reach 1.10-1.17x aggregate
throughput (fwd interval-kernel chains), while the r5 concurrency_grid's
VMAPPED train step measured 0.88x at K=2 / flat at K=4: XLA co-schedules
distinct op chains across fusion boundaries but serialises the lanes of
one batched dot_general.  This script checks whether that transfers to
the full train step (fwd + interval-adjoint bwd + Adam) at the flagship
shape — the program the co-scheduled sweep (training/wave.py) actually
runs for the 3-seeds-per-config protocol.

Variants (B=512, knots=199, C=21, H=128, adjoint rk4, bce, Adam):

  train_single   — one replica per dispatch (the serial sweep baseline)
  train_vmap_kK  — K replicas vmapped (the current wave.py path)
  train_ops_kK   — K replicas as a Python loop of base_step calls inside
                   ONE jit (stacked trees sliced per replica, results
                   restacked) — identical semantics, separate op chains

If train_ops beats both train_single (aggregate) and train_vmap, wave.py
gains an ops execution mode.  Resumable: rows land in
results/trainstep_ops_experiment.json as they are measured.

Usage (tunnel healthy): python scripts/trainstep_ops_experiment.py [variants...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import (
        linear_interpolation_coeffs,
    )
    from online_neural_cdes_tpu.training.loop import (
        init_adam_state, make_train_step,
    )

    B, L, C, H = 512, 100, 21, 128
    K_MAX = 4
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    static = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
    labels = jnp.asarray(rng.integers(0, 2, size=(B, L)).astype(np.float32))
    inputs = (static, coeffs)

    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=1, static_dim=10,
        hidden_hidden_dim=H, num_layers=2, interpolation="rectilinear",
        return_sequences=True, adjoint=True, solver="rk4", solver_unroll=4,
    )
    base_step = make_train_step(model, loss="bce", lr=5e-4, donate=False)

    def stacked_state(K):
        per_rep = [model.init(jax.random.PRNGKey(s)) for s in range(K)]
        params = jax.tree.map(lambda *xs: jnp.stack(xs), *per_rep)
        opt_state = jax.tree.map(
            lambda v: jnp.broadcast_to(v, (K,) + v.shape),
            init_adam_state(per_rep[0]))
        return params, opt_state

    def make_single():
        params = model.init(jax.random.PRNGKey(0))
        opt_state = init_adam_state(params)
        step = jax.jit(base_step)

        def run(state):
            p, o = state
            p, o, l = step(p, o, inputs, labels, 1.0)
            return (p, o), l

        return run, (params, opt_state)

    def make_vmap(K):
        state = stacked_state(K)
        vstep = jax.jit(jax.vmap(base_step, in_axes=(0, 0, None, None, None)))

        def run(state):
            p, o = state
            p, o, l = vstep(p, o, inputs, labels, 1.0)
            return (p, o), l

        return run, state

    def make_ops(K):
        state = stacked_state(K)

        def ops_step(p, o, inp, lab, lr):
            outs = [
                base_step(jax.tree.map(lambda v: v[k], p),
                          jax.tree.map(lambda v: v[k], o), inp, lab, lr)
                for k in range(K)
            ]
            p2 = jax.tree.map(lambda *vs: jnp.stack(vs),
                              *[out[0] for out in outs])
            o2 = jax.tree.map(lambda *vs: jnp.stack(vs),
                              *[out[1] for out in outs])
            return p2, o2, jnp.stack([out[2] for out in outs])

        jstep = jax.jit(ops_step)

        def run(state):
            p, o = state
            p, o, l = jstep(p, o, inputs, labels, 1.0)
            return (p, o), l

        return run, state

    from online_neural_cdes_tpu.utils.timing import (
        rt_subtracted_chain_s, scaled_chain_len,
    )

    def measure(run, state, n=10):
        # The sanctioned RT-subtracted chain protocol (utils/timing.py —
        # one copy shared with the sibling experiment scripts): without
        # subtracting the chain's one closing round-trip the slower
        # variants look relatively better (the r5 trainstep run first
        # showed phantom 1.1-1.17x aggregate wins this way).
        state, l = run(state)
        np.asarray(l)  # compile + the only true sync on axon
        n = scaled_chain_len(n, cap=60, per_iter_ms_hint=2.0)

        def run_chain(k):
            nonlocal state
            for _ in range(k):
                state, l = run(state)
            np.asarray(l)

        return rt_subtracted_chain_s(run_chain, n) * 1000.0

    path = "results/trainstep_ops_experiment.json"
    os.makedirs("results", exist_ok=True)
    if os.path.exists(path):
        with open(path) as fh:
            out = json.load(fh)
    else:
        out = {"shape": f"B={B} knots={2*L-1} C={C} H={H} adjoint rk4 "
                        "train step (flagship)",
               "backend": jax.default_backend(), "rows": []}
    done = {r["variant"] for r in out["rows"]}
    only = set(sys.argv[1:])

    def land(row):
        out["rows"] = [r for r in out["rows"]
                       if r["variant"] != row["variant"]] + [row]
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(row, flush=True)

    def wants(v):
        return v in only if only else v not in done

    if wants("train_single") or "train_single" not in done:
        if "train_single" not in done or "train_single" in only:
            ms = measure(*make_single())
            land({"variant": "train_single", "K": 1, "wall_ms": round(ms, 2),
                  "per_replica_ms": round(ms, 2), "aggregate_speedup": 1.0})
    t1 = next(r["wall_ms"] for r in out["rows"]
              if r["variant"] == "train_single")
    for K in (2, 4):
        for name, maker in (("vmap", make_vmap), ("ops", make_ops)):
            variant = f"train_{name}_k{K}"
            if not wants(variant):
                continue
            ms = measure(*maker(K))
            land({"variant": variant, "K": K, "wall_ms": round(ms, 2),
                  "per_replica_ms": round(ms / K, 2),
                  "aggregate_speedup": round(K * t1 / ms, 3)})

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
