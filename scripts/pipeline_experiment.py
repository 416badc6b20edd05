"""Software-pipelining attempt on the flagship latency bound (VERDICT r4
stretch #9) — measured accept/reject evidence for DESIGN.md.

The r4 mfu_grid showed the H=128 flagship is LATENCY-bound: the rk4
stage chain (4 dependent field evals per interval x ~400 intervals) keeps
the MXU ~79% idle, and batch cannot buy it back (flat ~19-21% of bf16
peak from B=256-2048).  Two attacks, timed fwd+bwd at the flagship field
shape (B=512, H=HH=128, C=21, ~396 chained rk4 intervals) on the real
chip with the production Pallas fused field:

1. **scan unroll sweep** (1/2/4/8/16): more intervals per loop body lets
   XLA software-pipeline across iterations (weight re-loads, the even
   intervals' cheap time-channel contraction) — the flagship ships
   unroll=4; is there headroom?
2. **two-way batch-interleaved pipeline**: split the batch into two
   independent half-chains advanced in ONE scan at a one-interval phase
   offset — each loop body then holds TWO independent rk4 stage chains
   (256-row matmuls, still full MXU tiles), doubling the independent
   work available to hide stage latency.  Same total FLOPs, same
   gradients per half.

Usage (tunnel healthy):  python scripts/pipeline_experiment.py
Writes results/pipeline_experiment.json and prints the table.
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
        fused_field_available, fused_matmul_field, pack_fused_params,
    )

    use_pallas = fused_field_available()
    B, H, C, N = 512, 128, 21, 396
    field = VectorField(input_dim=C, hidden_dim=H, hidden_hidden_dim=H,
                        num_layers=2, kind="original")
    params = field.init(jax.random.PRNGKey(0))
    packed = pack_fused_params(params, H, C, pad=True)
    rng = np.random.default_rng(0)
    z0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    dxs = jnp.asarray(rng.normal(size=(N, B, C)) * 0.05, jnp.float32)

    def f(pk, z, dx):
        return fused_matmul_field(pk["trunk"], pk["head_w"], pk["head_b"],
                                  z, dx, H, C, use_pallas, "float32")

    def rk4(pk, z, dx):
        k1 = f(pk, z, dx)
        k2 = f(pk, z + 0.5 * k1, dx)
        k3 = f(pk, z + 0.5 * k2, dx)
        k4 = f(pk, z + k3, dx)
        return z + (k1 + 2 * k2 + 2 * k3 + k4) / 6.0

    def make_plain(unroll):
        def loss(pk):
            def body(z, dx):
                z = rk4(pk, z, dx)
                return z, None

            zT, _ = jax.lax.scan(body, z0, dxs, unroll=unroll)
            return jnp.sum(zT ** 2)

        return jax.jit(jax.value_and_grad(loss))

    # Two-way interleave: halves a/b advance at a one-interval phase
    # offset inside ONE body — two INDEPENDENT rk4 chains per iteration.
    z0a, z0b = z0[: B // 2], z0[B // 2:]
    dxa = dxs[:, : B // 2]
    dxb_shift = jnp.concatenate([dxs[:1, B // 2:] * 0.0,
                                 dxs[:-1, B // 2:]], axis=0)

    def make_interleaved(unroll):
        def loss(pk):
            def body(carry, dx2):
                za, zb = carry
                dx_a, dx_b = dx2
                za = rk4(pk, za, dx_a)
                zb = rk4(pk, zb, dx_b)
                return (za, zb), None

            (zTa, zTb), _ = jax.lax.scan(
                body, (z0a, z0b), (dxa, dxb_shift), unroll=unroll)
            # epilogue: half b finishes its last interval
            zTb = rk4(pk, zTb, dxs[-1, B // 2:])
            return jnp.sum(zTa ** 2) + jnp.sum(zTb ** 2)

        return jax.jit(jax.value_and_grad(loss))

    from online_neural_cdes_tpu.utils.timing import (
        rt_subtracted_chain_s, scaled_chain_len,
    )

    def measure(fn, n=15):
        # The sanctioned RT-subtracted chain protocol (utils/timing.py —
        # one copy shared with the sibling experiment scripts).  Here the
        # RT bias is uniform across variants (so the landed record's
        # accept/reject ordering stands — an additive constant only
        # shrinks relative gaps, making the "interleaved is worse" verdict
        # conservative), but subtract it anyway so absolute step times
        # match the siblings' protocol.  Chain length adapts to the RT
        # with a heavy per-iteration hint (each iteration is a full
        # ~36 ms flagship train step).
        v, g = fn(packed)
        float(v)  # host transfer: the only true sync on axon
        n = scaled_chain_len(n, cap=60, per_iter_ms_hint=30.0)

        def run_chain(k):
            for _ in range(k):
                v, _ = fn(packed)
            float(v)

        return rt_subtracted_chain_s(run_chain, n) * 1000.0

    rows = []
    for unroll in (1, 2, 4, 8, 16):
        ms = measure(make_plain(unroll))
        rows.append({"variant": "plain", "unroll": unroll,
                     "fwd_bwd_ms": round(ms, 2)})
        print(rows[-1], flush=True)
    for unroll in (1, 4, 8):
        ms = measure(make_interleaved(unroll))
        rows.append({"variant": "interleaved2", "unroll": unroll,
                     "fwd_bwd_ms": round(ms, 2)})
        print(rows[-1], flush=True)

    out = {"shape": f"B={B} H={H} C={C} intervals={N} rk4 fwd+bwd",
           "use_pallas": use_pallas,
           "backend": jax.default_backend(), "rows": rows}
    os.makedirs("results", exist_ok=True)
    with open("results/pipeline_experiment.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
