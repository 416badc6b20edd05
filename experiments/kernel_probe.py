"""Real-TPU microbenchmark for the fused field kernel variants.

Per-call dispatch through the axon tunnel costs ~0.5 ms, so each variant is
timed as a K-step lax.scan chain inside ONE jit — the per-step time is the
in-graph cost that the CDE solve actually pays.  Synced via host transfer
(block_until_ready is unreliable on the axon backend).

Usage: python experiments/kernel_probe.py [--shapes BxHxHHxI ...] [--steps K]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.models.vector_fields import VectorField
from online_neural_cdes_tpu.ops.kernels import (
    fused_matmul_field,
    pack_fused_params,
)


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def timeit(fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="*",
                    default=["512x64x64x21", "512x128x128x21", "1024x32x48x12"])
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    K = args.steps

    for spec in args.shapes:
        B, H, HH, I = map(int, spec.split("x"))
        rng = np.random.default_rng(0)
        field = VectorField(input_dim=I, hidden_dim=H, hidden_hidden_dim=HH,
                            num_layers=2, kind="original")
        params = field.init(jax.random.PRNGKey(0))
        # Production packs unpadded for the XLA path and lane-padded for
        # Pallas (ncde.py: pad=use_pallas) — probe both the same way.
        packed = pack_fused_params(params, H, I, pad=True)
        packed_x = pack_fused_params(params, H, I, pad=False)
        z = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
        dx = jnp.asarray(rng.normal(size=(B, I)), jnp.float32)
        # FLOPs per field eval (trunk + head matmuls).
        flops = 2 * B * (H * HH + (1) * HH * HH + HH * I * H)

        def chain(step_fn):
            """z -> K repeated field applications (scan, unrolled 4)."""
            def body(zz, _):
                k = step_fn(zz)
                return zz + 0.125 * k, None

            @jax.jit
            def run(z0):
                out, _ = jax.lax.scan(body, z0, None, length=K, unroll=4)
                return out
            return run

        def chain_grad(step_fn):
            def body(zz, _):
                return zz + 0.125 * step_fn(zz), None

            def loss(z0):
                out, _ = jax.lax.scan(body, z0, None, length=K, unroll=4)
                return jnp.sum(out ** 2)

            return jax.jit(jax.grad(loss))

        variants = {
            "unfused XLA": lambda zz: jnp.einsum(
                "bhi,bi->bh", field.apply(params, 0.0, zz), dx),
            "xla-fused": lambda zz: fused_matmul_field(
                packed_x["trunk"], packed_x["head_w"], packed_x["head_b"],
                zz, dx, H, I, False, "float32"),
            "pallas/f32": lambda zz: fused_matmul_field(
                packed["trunk"], packed["head_w"], packed["head_b"], zz, dx,
                H, I, True, "float32"),
            "pallas/bf16": lambda zz: fused_matmul_field(
                packed["trunk"], packed["head_w"], packed["head_b"], zz, dx,
                H, I, True, "bfloat16"),
        }

        print(f"== B={B} H={H} HH={HH} I={I}  ({K}-step chain) ==")
        for name, step_fn in variants.items():
            try:
                t = timeit(chain(step_fn), z, reps=args.reps)
                per = t / K
                tfs = flops / (per * 1e-3) / 1e12
                print(f"  fwd {name:12s}: {per*1e3:8.2f} us/eval  ({tfs:6.2f} TF/s)")
            except Exception as e:
                print(f"  fwd {name:12s}: FAILED {type(e).__name__}: {e}")
        for name, step_fn in variants.items():
            try:
                t = timeit(chain_grad(step_fn), z, reps=args.reps)
                per = t / K
                tfs = 3 * flops / (per * 1e-3) / 1e12
                print(f"  f+b {name:12s}: {per*1e3:8.2f} us/eval  ({tfs:6.2f} TF/s eff)")
            except Exception as e:
                print(f"  f+b {name:12s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
