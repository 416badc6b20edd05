"""TPU: parity + timing of the Pallas backward vs the XLA recompute vjp."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.models.vector_fields import VectorField
from online_neural_cdes_tpu.ops.kernels import (
    _backward_pallas, _forward_reference, fused_matmul_field,
    pack_fused_params,
)

_args = [int(a) for a in sys.argv[1:5]]
B, H, HH, I = _args + [512, 128, 128, 21][len(_args):]
N_INNER, CHAINS = 1000, 3


def timeit(fn, *args):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    ts = []
    for _ in range(CHAINS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].sum())
        ts.append((time.perf_counter() - t0) / N_INNER)
    return float(np.median(ts)) * 1e6


def main():
    rng = np.random.default_rng(0)
    field = VectorField(input_dim=I, hidden_dim=H, hidden_hidden_dim=HH,
                        num_layers=2, kind="original")
    params = field.init(jax.random.PRNGKey(0))
    packed = pack_fused_params(params, H, I, pad=True)
    z = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    dx = jnp.asarray(rng.normal(size=(B, I)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)

    # ---- hardware parity ----
    def xla_bwd(pk, z_, dx_, g_):
        def ref(trunk_, hw_, hb_, z__, dx__):
            return _forward_reference(trunk_, hw_, hb_, z__, dx__, H, I)
        _, vjp = jax.vjp(ref, pk["trunk"], pk["head_w"], pk["head_b"], z_, dx_)
        return vjp(g_)

    def pl_bwd(pk, z_, dx_, g_):
        return _backward_pallas(pk["trunk"], pk["head_w"], pk["head_b"],
                                z_, dx_, g_, H, I, "float32")

    ex = jax.jit(xla_bwd)(packed, z, dx, g)
    got = jax.jit(pl_bwd)(packed, z, dx, g)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ex)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(b)) + 1e-12
        err = np.max(np.abs(a - b)) / scale
        assert err < 2e-3, (a.shape, err)
    print("hardware parity ok")

    # ---- timing: chained through a z-carry like the adjoint scan ----
    def chain(body):
        @jax.jit
        def run(pk, z_, dx_, g_):
            def one(c, _):
                outs = body(pk, c, dx_, g_)
                dz = outs[3] if isinstance(outs, tuple) and len(outs) == 5 else outs[3]
                return c + 1e-6 * dz, None
            c, _ = jax.lax.scan(one, z_, None, length=N_INNER)
            return c
        return run

    def xla_bwd_t(pk, c, dx_, g_):
        dt, dhw, dhb, dz, ddx = xla_bwd(pk, c, dx_, g_)
        return (dt, dhw, dhb, dz, ddx)

    def pl_bwd_t(pk, c, dx_, g_):
        dt, dhw, dhb, dz, ddx = pl_bwd(pk, c, dx_, g_)
        return (dt, dhw, dhb, dz, ddx)

    us_x = timeit(chain(xla_bwd_t), packed, z, dx, g)
    us_p = timeit(chain(pl_bwd_t), packed, z, dx, g)
    print(f"bwd XLA recompute : {us_x:7.1f} us/call")
    print(f"bwd Pallas fused  : {us_p:7.1f} us/call")

    # full fwd+bwd through the custom_vjp (pallas bwd now wired)
    def full_vjp(pk, c, dx_, g_):
        def f(pk__, z__):
            return fused_matmul_field(pk__["trunk"], pk__["head_w"],
                                      pk__["head_b"], z__, dx_, H, I, True,
                                      "float32")
        out, pull = jax.vjp(f, pk, c)
        dpk, dz = pull(g_)
        return (dpk["trunk"], dpk["head_w"], dpk["head_b"], dz, out)

    us_f = timeit(chain(full_vjp), packed, z, dx, g)
    print(f"fwd+bwd custom_vjp: {us_f:7.1f} us/call (was ~35 us with XLA bwd)")


if __name__ == "__main__":
    main()
