"""Isolate the fused field's bound: tanh ablation + batch scaling."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

H, HH, I = 128, 128, 21
HEAD = I * 128
N_INNER, CHAINS = 2000, 3


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


def chain(body, *const):
    @jax.jit
    def run(z):
        def one(c, _):
            return body(c, *const), None
        c, _ = jax.lax.scan(one, z, None, length=N_INNER)
        return c
    return run


def main():
    rng = np.random.default_rng(0)
    for B in (256, 512, 1024):
        z = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
        w0 = jnp.asarray(rng.normal(size=(H, HH)) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(HH, HH)) * 0.1, jnp.float32)
        wh = jnp.asarray(rng.normal(size=(HH, HEAD)) * 0.1, jnp.float32)
        dx = jnp.asarray(rng.normal(size=(B, I)), jnp.float32)

        def full(c, act):
            u = jax.nn.relu(c @ w0)
            u = jax.nn.relu(u @ w1)
            a = act(u @ wh).reshape(B, I, 128)
            return jnp.sum(a * dx[:, :, None], axis=1)

        variants = {
            "tanh": lambda c: full(c, jnp.tanh),
            "identity": lambda c: full(c, lambda x: x * 0.99),
            "sigmoid": lambda c: full(c, jax.nn.sigmoid),
            "clip-rational": lambda c: full(
                c, lambda x: jnp.clip(
                    x * (27.0 + x * x) / (27.0 + 9.0 * x * x), -1.0, 1.0)),
            "head-mm-only": lambda c: (c @ w0 @ w1 @ wh)[:, :H] * 1e-3,
            "tanh-only": lambda c: jnp.tanh(
                jnp.broadcast_to(c, (B, H)) @ wh[:H])[:, :H] * 0.1,
        }
        for name, body in variants.items():
            us = timeit(chain(body), z)
            print(f"B={B} {name:14s}: {us:7.1f} us")
        print()


if __name__ == "__main__":
    main()
