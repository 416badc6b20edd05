"""Microbenchmark: fused-field forward vs backward cost at flagship shapes.

Run on the TPU (cwd /root/repo): times the Pallas forward, the XLA
reference forward, the current recompute-based backward, and the full
value_and_grad, at B=512 H=HH=128 I=21 (the MIMIC flagship per-stage op).
Sync discipline: host transfer per chain (axon block_until_ready caveat).
"""

import sys
import time

sys.path.insert(0, "/root/repo")   # run as `python scripts/bwd_probe.py`

import jax
import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.models.vector_fields import VectorField
from online_neural_cdes_tpu.ops.kernels import (
    fused_matmul_field, pack_fused_params,
)

B, H, HH, I = 512, 128, 128, 21
N_INNER = 2000  # op calls chained per dispatch
CHAINS = 3


def timeit(fn, *args):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    times = []
    for _ in range(CHAINS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].sum())
        times.append((time.perf_counter() - t0) / N_INNER)
    return float(np.median(times)) * 1e6  # us per op call


def main():
    rng = np.random.default_rng(0)
    field = VectorField(input_dim=I, hidden_dim=H, hidden_hidden_dim=HH,
                        num_layers=2, kind="original")
    params = field.init(jax.random.PRNGKey(0))
    packed = pack_fused_params(params, H, I, pad=True)
    z = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    dx = jnp.asarray(rng.normal(size=(B, I)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)

    flops_fwd = 2 * B * (H * HH + HH * HH + HH * I * 128)

    def chain(body):
        @jax.jit
        def run(pk, z_, dx_, g_):
            def one(c, _):
                out = body(pk, c, dx_, g_)
                # keep a (B, H) carry so the chain cannot collapse
                return out, None

            c, _ = jax.lax.scan(one, z_, None, length=N_INNER)
            return c

        return run

    def fwd_pallas(pk, z_, dx_, g_):
        return fused_matmul_field(pk["trunk"], pk["head_w"], pk["head_b"],
                                  z_, dx_, H, I, True, "float32")

    def fwd_xla(pk, z_, dx_, g_):
        return fused_matmul_field(pk["trunk"], pk["head_w"], pk["head_b"],
                                  z_, dx_, H, I, False, "float32")

    def vjp_full(pk, z_, dx_, g_):
        def f(z__):
            return fused_matmul_field(pk["trunk"], pk["head_w"], pk["head_b"],
                                      z__, dx_, H, I, True, "float32")

        out, pull = jax.vjp(f, z_)
        (dz,) = pull(g_)
        return dz + out

    def vjp_params(pk, z_, dx_, g_):
        def f(pk__, z__):
            return fused_matmul_field(pk__["trunk"], pk__["head_w"],
                                      pk__["head_b"], z__, dx_, H, I, True,
                                      "float32")

        out, pull = jax.vjp(f, pk, z_)
        dpk, dz = pull(g_)
        return dz + out + dpk["head_b"][:H] * 0

    for name, body in (
        ("fwd_pallas", fwd_pallas),
        ("fwd_xla", fwd_xla),
        ("fwd+bwd(z only)", vjp_full),
        ("fwd+bwd(all)", vjp_params),
    ):
        us = timeit(chain(body), packed, z, dx, g)
        eff = flops_fwd / (us * 1e-6) / 1e12
        print(f"{name:18s}: {us:8.1f} us/call   (fwd-flops eff {eff:6.1f} TF/s)")


def probe_bf16():
    rng = np.random.default_rng(0)
    field = VectorField(input_dim=I, hidden_dim=H, hidden_hidden_dim=HH,
                        num_layers=2, kind="original")
    params = field.init(jax.random.PRNGKey(0))
    packed = pack_fused_params(params, H, I, pad=True)
    z = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    dx = jnp.asarray(rng.normal(size=(B, I)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    flops_fwd = 2 * B * (H * HH + HH * HH + HH * I * 128)

    def chain(body):
        @jax.jit
        def run(pk, z_, dx_, g_):
            def one(c, _):
                return body(pk, c, dx_, g_), None

            c, _ = jax.lax.scan(one, z_, None, length=N_INNER)
            return c

        return run

    for prec in ("float32", "bfloat16"):
        for use_pallas in (True, False):
            def fwd(pk, z_, dx_, g_, _p=prec, _up=use_pallas):
                return fused_matmul_field(pk["trunk"], pk["head_w"],
                                          pk["head_b"], z_, dx_, H, I, _up, _p)

            us = timeit(chain(fwd), packed, z, dx, g)
            print(f"fwd {prec:8s} pallas={use_pallas}: {us:7.1f} us "
                  f"({flops_fwd / us / 1e6:6.1f} TF/s)")

        def vjp_all(pk, z_, dx_, g_, _p=prec):
            def f(pk__, z__):
                return fused_matmul_field(pk__["trunk"], pk__["head_w"],
                                          pk__["head_b"], z__, dx_, H, I,
                                          True, _p)

            out, pull = jax.vjp(f, pk, z_)
            dpk, dz = pull(g_)
            return dz + out + dpk["head_b"][:H] * 0

        us = timeit(chain(vjp_all), packed, z, dx, g)
        print(f"fwd+bwd(all) {prec:8s}: {us:7.1f} us "
              f"(3x-fwd eff {3 * flops_fwd / us / 1e6:6.1f} TF/s)")


def probe_flagship_split():
    """Forward-only vs train-step at the flagship config to locate time."""
    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

    Bf, L, C, Hf = 512, 100, 21, 128
    model = NeuralCDE(
        input_dim=C, hidden_dim=Hf, output_dim=1, static_dim=10,
        hidden_hidden_dim=Hf, num_layers=2, interpolation="rectilinear",
        return_sequences=True, adjoint=True, solver="rk4", solver_unroll=4,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(Bf, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    static = jnp.asarray(rng.normal(size=(Bf, 10)).astype(np.float32))
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
    labels = jnp.asarray(rng.integers(0, 2, size=(Bf, L)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0))

    import optax

    @jax.jit
    def fwd_only(p):
        return model.apply(p, (static, coeffs)).sum()

    def loss_fn(p):
        preds = model.apply(p, (static, coeffs))[..., 0]
        return optax.sigmoid_binary_cross_entropy(preds, labels).mean()

    @jax.jit
    def step(p):
        return jax.grad(loss_fn)(p)

    def time_n(fn, arg, n=20):
        out = fn(arg)
        float(jax.tree.leaves(out)[0].sum())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(arg)
        float(jax.tree.leaves(out)[0].sum())
        return (time.perf_counter() - t0) / n * 1e3

    print(f"flagship fwd-only : {time_n(fwd_only, params):7.2f} ms")
    print(f"flagship fwd+bwd  : {time_n(step, params):7.2f} ms")


if __name__ == "__main__":
    import sys as _sys

    if "--bf16" in _sys.argv:
        probe_bf16()
    elif "--flagship" in _sys.argv:
        probe_flagship_split()
