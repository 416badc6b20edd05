"""Even-interval cost: XLA per-stage chain vs whole-interval fused kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.models.vector_fields import VectorField
from online_neural_cdes_tpu.ops.kernels import (
    _forward_reference, fused_rk4_interval, pack_fused_params,
)
from online_neural_cdes_tpu.ops.solvers import tree_fixed_step

B, H, HH, I = 512, 128, 128, 21
N, CHAINS = 1000, 3


def timeit(fn, *args):
    out = fn(*args)
    float(out.sum())
    ts = []
    for _ in range(CHAINS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out.sum())
        ts.append((time.perf_counter() - t0) / N)
    return float(np.median(ts)) * 1e6


def chain(body):
    @jax.jit
    def run(z):
        def one(c, _):
            return body(c), None
        c, _ = jax.lax.scan(one, z, None, length=N)
        return c
    return run


def main():
    rng = np.random.default_rng(0)
    field = VectorField(input_dim=I, hidden_dim=H, hidden_hidden_dim=HH,
                        num_layers=2, kind="original")
    params = field.init(jax.random.PRNGKey(0))
    packed = pack_fused_params(params, H, I, pad=False)
    hp = H
    k = 0
    hw_t = packed["head_w"][:, k * hp:(k + 1) * hp]   # time-channel head
    hb_t = packed["head_b"][k * hp:(k + 1) * hp]
    z = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    dxt = jnp.asarray(rng.normal(size=(B, 1)), jnp.float32)
    dx_full = jnp.asarray(rng.normal(size=(B, I)), jnp.float32)
    step = tree_fixed_step("rk4")

    def even_xla(c):
        def f(t, zz):
            return _forward_reference(packed["trunk"], hw_t, hb_t, zz, dxt,
                                      H, 1)
        return step(f, 0.0, 1.0, c)

    def even_fused(c):
        return fused_rk4_interval(packed["trunk"], hw_t, hb_t, c, dxt, H, 1)

    def odd_xla(c):
        def f(t, zz):
            return _forward_reference(packed["trunk"], packed["head_w"],
                                      packed["head_b"], zz, dx_full, H, I)
        return step(f, 0.0, 1.0, c)

    def odd_fused(c):
        return fused_rk4_interval(packed["trunk"], packed["head_w"],
                                  packed["head_b"], c, dx_full, H, I)

    def pair_xla(c):
        return odd_xla(even_xla(c))

    def pair_fused(c):
        return odd_fused(even_fused(c))

    for name, body in (("even_xla(4stg)", even_xla),
                       ("even_fusedint", even_fused),
                       ("odd_xla(4stg)", odd_xla),
                       ("odd_fusedint", odd_fused),
                       ("pair_xla", pair_xla),
                       ("pair_fused", pair_fused)):
        print(f"{name:16s}: {timeit(chain(body), z):7.1f} us/interval(pair)")


if __name__ == "__main__":
    main()
