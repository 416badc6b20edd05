"""Instruction-level multi-replica interleave experiment (post-r5 NEXT #3,
the one untried lever on the flagship latency bound).

Context: the H=128 flagship step is bounded by the dependent RK stage
chain — per-stage ~2/3 VPU (tanh + contraction) and ~1/3 MXU, with each
unit idle while the other works.  Every XLA-level attempt to fill that
idle time is measured and rejected (DESIGN.md §r5): batch (flat mfu_grid),
vmapped K replicas (concurrency_grid: 0.88x at K=2), and a two-way
batch-split pipeline (8-11% worse).  The remaining hypothesis is that the
failure is XLA's scheduling granularity, not the hardware: K independent
replicas' stage chains interleaved INSIDE one Mosaic kernel hand the
static scheduler K independent matmul/VPU streams per RK stage.

Variants timed on the real chip (fwd chains over N unit intervals at the
flagship field shape, B=512, H=HH=128, C=21):

  single          — scan of fused_rk4_interval (1 replica, the measured tie
                    with the production per-stage path)
  k{K}_seq        — K replicas trained back-to-back: K * single (arithmetic)
  k{K}_xla_ops    — one scan whose body runs the K replicas' interval
                    kernels as SEPARATE ops (XLA free to co-schedule whole
                    pallas_calls — the op-granularity control)
  k{K}_interleave — scan of fused_rk4_interval_multi (stage-major
                    replica-minor interleave inside one kernel)

Win condition: k2_interleave wall < ~1.6x single (aggregate >1.25x).
Writes results/interleave_experiment.json; parity-checks the multi kernel
against per-replica kernels on device first.

Usage (tunnel healthy): python scripts/interleave_experiment.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from online_neural_cdes_tpu.models.vector_fields import VectorField
    from online_neural_cdes_tpu.ops.kernels import (
        fused_rk4_interval, fused_rk4_interval_multi, pack_fused_params,
    )

    B, H, C, N = 512, 128, 21, 396
    K_MAX = 4
    field = VectorField(input_dim=C, hidden_dim=H, hidden_hidden_dim=H,
                        num_layers=2, kind="original")
    rng = np.random.default_rng(0)
    packs = [pack_fused_params(field.init(jax.random.PRNGKey(r)), H, C,
                               pad=False)
             for r in range(K_MAX)]
    z0s = jnp.asarray(rng.normal(size=(K_MAX, B, H)), jnp.float32)
    dxs = jnp.asarray(rng.normal(size=(N, K_MAX, B, C)) * 0.05, jnp.float32)

    def stack_packs(K):
        trunk = [
            {"w": jnp.stack([p["trunk"][i]["w"] for p in packs[:K]]),
             "b": jnp.stack([p["trunk"][i]["b"] for p in packs[:K]])}
            for i in range(len(packs[0]["trunk"]))
        ]
        return (trunk, jnp.stack([p["head_w"] for p in packs[:K]]),
                jnp.stack([p["head_b"] for p in packs[:K]]))

    # --- device parity: the multi kernel vs per-replica kernels -----------
    trunk2, hw2, hb2 = stack_packs(2)
    got = fused_rk4_interval_multi(trunk2, hw2, hb2, z0s[:2], dxs[0, :2],
                                   H, C)
    for r in range(2):
        p = packs[r]
        want = fused_rk4_interval(p["trunk"], p["head_w"], p["head_b"],
                                  z0s[r], dxs[0, r], H, C)
        np.testing.assert_allclose(np.asarray(got[r]), np.asarray(want),
                                   atol=1e-4)
    print("device parity ok (K=2 interleave == per-replica kernels)",
          flush=True)

    # --- variants ----------------------------------------------------------
    def make_single(r, unroll=4):
        p = packs[r]

        def run():
            def body(z, dx):
                z = fused_rk4_interval(p["trunk"], p["head_w"], p["head_b"],
                                       z, dx[r], H, C)
                return z, None

            zT, _ = jax.lax.scan(body, z0s[r], dxs, unroll=unroll)
            return jnp.sum(zT)

        return jax.jit(run)

    def make_xla_ops(K, unroll=4):
        def run():
            def body(zs, dx):
                new = tuple(
                    fused_rk4_interval(packs[r]["trunk"], packs[r]["head_w"],
                                       packs[r]["head_b"], zs[r], dx[r], H, C)
                    for r in range(K)
                )
                return new, None

            zT, _ = jax.lax.scan(body, tuple(z0s[r] for r in range(K)),
                                 dxs, unroll=unroll)
            return sum(jnp.sum(z) for z in zT)

        return jax.jit(run)

    def make_interleave(K, unroll=4):
        trunk, hw, hb = stack_packs(K)

        def run():
            def body(z, dx):
                z = fused_rk4_interval_multi(trunk, hw, hb, z, dx[:K], H, C)
                return z, None

            zT, _ = jax.lax.scan(body, z0s[:K], dxs, unroll=unroll)
            return jnp.sum(zT)

        return jax.jit(run)

    from online_neural_cdes_tpu.utils.timing import (
        rt_subtracted_chain_s, scaled_chain_len,
    )

    def measure(fn, n=15):
        # The sanctioned RT-subtracted chain protocol (utils/timing.py —
        # one copy shared with the sibling experiment scripts): without
        # subtracting the chain's one closing round-trip the slower
        # variants look relatively better.
        float(fn())  # compile + the only true sync on axon (host transfer)
        n = scaled_chain_len(n, cap=60, per_iter_ms_hint=2.0)

        def run_chain(k):
            for _ in range(k):
                v = fn()
            float(v)

        return rt_subtracted_chain_s(run_chain, n) * 1000.0

    # Resumable: rows land in the JSON as they are measured (kernel compiles
    # through the tunnel are slow; a budget kill must not lose landed legs).
    path = "results/interleave_experiment.json"
    os.makedirs("results", exist_ok=True)
    if os.path.exists(path):
        with open(path) as fh:
            out = json.load(fh)
    else:
        out = {"shape": f"B={B} H={H} C={C} intervals={N} rk4 fwd chains",
               "backend": jax.default_backend(),
               "seq_baseline_note": "k{K}_seq = K * single by construction",
               "rows": []}
    done = {r["variant"] for r in out["rows"]}
    only = set(sys.argv[1:])

    def land(row):
        out["rows"] = [r for r in out["rows"]
                       if r["variant"] != row["variant"]] + [row]
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(row, flush=True)

    if "single" not in done or "single" in only:
        t1 = measure(make_single(0))
        land({"variant": "single", "K": 1, "wall_ms": round(t1, 2),
              "per_replica_ms": round(t1, 2), "aggregate_speedup": 1.0})
    else:
        t1 = next(r["wall_ms"] for r in out["rows"]
                  if r["variant"] == "single")
    for K in (2, 4):
        for name, maker in (("xla_ops", make_xla_ops),
                            ("interleave", make_interleave)):
            variant = f"k{K}_{name}"
            if (only and variant not in only) or \
                    (not only and variant in done):
                continue
            ms = measure(maker(K))
            land({"variant": variant, "K": K, "wall_ms": round(ms, 2),
                  "per_replica_ms": round(ms / K, 2),
                  "aggregate_speedup": round(K * t1 / ms, 3)})

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
