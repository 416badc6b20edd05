"""Pallas TPU kernels for the CDE hot path.

The innermost operation of a matmul-type Neural CDE solve is, per RK stage
(reference solver.py:128-135 + vector_fields/base.py:83-92):

    u   = relu(z @ W_t + b_t)            # trunk, possibly several layers
    A   = tanh(u @ W_o + b_o)            # (B, H*I) field matrix
    out = einsum('bhi,bi->bh', A, dX)    # contraction with the control

XLA executes this as two MXU matmuls plus a separate contraction fusion —
the (B, H*I) intermediate ``A`` round-trips HBM twice per stage.  The
fused kernel here keeps ``A`` in VMEM: one ``pallas_call`` per stage
computes trunk -> head -> contraction for a batch tile and writes only the
(B, H) result.  The head weight is held in a contraction-major (HH, I*H)
layout so the in-kernel reshape keeps H (lane-aligned) as the minor axis
and the I-reduction runs over sublanes.

The op is a ``custom_vjp``: the backward pass is expressed with XLA
einsums (recomputing activations — nothing is stashed in HBM), so the
fused op composes with both direct autodiff and the interval adjoint.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_matmul_field", "pack_fused_params", "fused_field_available"]


def _pick_batch_tile(batch: int, head_cols: int, hh: int,
                     budget_bytes: int = 12 * 1024 * 1024) -> int:
    """Largest batch tile whose VMEM working set stays under the budget."""
    for tile in (512, 256, 128, 64, 32, 16, 8):
        if batch % tile != 0:
            continue
        # A tile + u tile + z tile + out tile (f32 words)
        words = tile * (head_cols + hh + 2 * 256) + hh * head_cols
        if words * 4 < budget_bytes:
            return tile
    return batch


def fused_field_available(backend: str | None = None) -> bool:
    if backend is None:
        backend = jax.default_backend()
    return backend in ("tpu",)


def lane_pad(hidden_dim: int, lanes: int = 128) -> int:
    """Hidden padded up to a full lane register so the in-kernel
    (B, I*Hp) -> (B, I, Hp) reshape is layout-free."""
    return ((hidden_dim + lanes - 1) // lanes) * lanes


def pack_fused_params(field_params: dict, hidden_dim: int, input_dim: int,
                      pad: bool = True) -> dict:
    """Re-layout an 'original' VectorField's parameters for the fused kernel:
    the head weight (HH, H*I) becomes contraction-major (HH, I*Hp) with the
    hidden axis zero-padded to a full 128-lane register.  Padded columns
    produce tanh(0) = 0 and contribute nothing to the contraction; the
    caller slices the (B, Hp) output back to (B, H).  This is what lets the
    kernel fire for the hyperopt-sampled hidden sizes (32..256,
    configurations.json5:32-37) instead of only multiples of 128."""
    w = field_params["out"]["w"]  # (HH, H*I)
    hh = w.shape[0]
    hp = lane_pad(hidden_dim) if pad else hidden_dim
    w_ih = w.reshape(hh, hidden_dim, input_dim).transpose(0, 2, 1)
    b_ih = field_params["out"]["b"].reshape(hidden_dim, input_dim).T
    if hp != hidden_dim:
        pad_cols = ((0, 0), (0, 0), (0, hp - hidden_dim))
        w_ih = jnp.pad(w_ih, pad_cols)
        b_ih = jnp.pad(b_ih, pad_cols[1:])
    return {
        "trunk": field_params["trunk"],
        "head_w": w_ih.reshape(hh, input_dim * hp),
        "head_b": b_ih.reshape(-1),
    }


def _mm(a, b, precision):
    """MXU matmul with optional bf16 inputs and f32 accumulation (params
    stay f32 in HBM; the cast is a VPU op amortised by the matmul)."""
    if precision == "bfloat16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _forward_reference(trunk, head_w, head_b, z, dx, hidden_dim, input_dim,
                       precision="float32"):
    """Pure-XLA forward with identical semantics (non-TPU fallback and the
    backward-pass recomputation).  Handles lane-padded heads: the padded
    hidden width is derived from the head shape and sliced off."""
    hp = head_w.shape[-1] // input_dim
    u = z
    for layer in trunk:
        u = jax.nn.relu(_mm(u, layer["w"], precision) + layer["b"])
    a = jnp.tanh(_mm(u, head_w, precision) + head_b)  # (B, I*Hp)
    a = a.reshape(a.shape[:-1] + (input_dim, hp))
    out = jnp.sum(a * dx[..., :, None], axis=-2)
    return out[..., :hidden_dim]


def _kernel_mm(a, b, precision):
    if precision == "bfloat16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _make_kernel(n_trunk: int, hidden_pad: int, input_dim: int,
                 precision: str):
    def kernel(*refs):
        z_ref, dx_ref = refs[0], refs[1]
        trunk_refs = refs[2: 2 + 2 * n_trunk]
        head_w_ref, head_b_ref, out_ref = refs[2 + 2 * n_trunk:]

        u = z_ref[:]
        for i in range(n_trunk):
            w = trunk_refs[2 * i][:]
            b = trunk_refs[2 * i + 1][:]
            u = jnp.maximum(_kernel_mm(u, w, precision) + b, 0.0)
        a = jnp.tanh(
            _kernel_mm(u, head_w_ref[:], precision) + head_b_ref[:]
        )  # (Bt, I*Hp) in f32
        bt = a.shape[0]
        a = a.reshape(bt, input_dim, hidden_pad)
        dx = dx_ref[:].astype(jnp.float32)  # (Bt, I)
        out = jnp.sum(a * dx[:, :, None], axis=1)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


def _forward_pallas(trunk, head_w, head_b, z, dx, hidden_dim, input_dim,
                    precision="float32"):
    batch = z.shape[0]
    hh = head_w.shape[0]
    head_cols = head_w.shape[1]
    hidden_pad = head_cols // input_dim
    tile = _pick_batch_tile(batch, head_cols, hh)
    n_trunk = len(trunk)

    def full(_ndim):
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((tile, z.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, dx.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [z, dx]
    for layer in trunk:
        in_specs += [full(2), full(1)]
        operands += [layer["w"], layer["b"][None, :]]
    in_specs += [full(2), full(1)]
    operands += [head_w, head_b[None, :]]

    flops = 2 * batch * (
        sum(l["w"].shape[0] * l["w"].shape[1] for l in trunk)
        + hh * head_cols
        + head_cols
    )
    out = pl.pallas_call(
        _make_kernel(n_trunk, hidden_pad, input_dim, precision),
        grid=(batch // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile, hidden_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, hidden_pad), z.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (z.size + dx.size + hh * head_cols + batch * hidden_pad),
            transcendentals=batch * head_cols,
        ),
    )(*operands)
    return out[:, :hidden_dim]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_matmul_field(trunk, head_w, head_b, z, dx, hidden_dim, input_dim,
                       use_pallas, precision="float32"):
    """out = einsum('bih,bi->bh', tanh(trunk(z) @ head_w + head_b), dx).

    trunk: list of {'w','b'} relu layers; head_w: (HH, I*Hp)
    contraction-major (Hp = lane-padded hidden); z: (B, H_in); dx: (B, I).
    Returns (B, H).  ``precision='bfloat16'`` runs the MXU passes in bf16
    with f32 accumulation (params stay f32).
    """
    if use_pallas:
        return _forward_pallas(trunk, head_w, head_b, z, dx, hidden_dim,
                               input_dim, precision)
    return _forward_reference(trunk, head_w, head_b, z, dx, hidden_dim,
                              input_dim, precision)


def _fused_fwd(trunk, head_w, head_b, z, dx, hidden_dim, input_dim,
               use_pallas, precision="float32"):
    out = fused_matmul_field(
        trunk, head_w, head_b, z, dx, hidden_dim, input_dim, use_pallas,
        precision,
    )
    return out, (trunk, head_w, head_b, z, dx)


def _fused_bwd(hidden_dim, input_dim, use_pallas, precision, residuals, g):
    trunk, head_w, head_b, z, dx = residuals

    def ref(trunk_, head_w_, head_b_, z_, dx_):
        return _forward_reference(
            trunk_, head_w_, head_b_, z_, dx_, hidden_dim, input_dim,
            precision,
        )

    _, vjp = jax.vjp(ref, trunk, head_w, head_b, z, dx)
    return vjp(g)


fused_matmul_field.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Whole-interval fused RK4(3/8) kernel: all four stages of one knot interval
# in a single pallas_call — the state and trunk/head weights stay resident
# in VMEM across stages, so per-interval HBM traffic is one weight fetch
# and one (B, H) state round-trip instead of four of each.  Valid when the
# control's derivative is constant within the interval (linear /
# rectilinear splines — the paper's online configuration).
# ---------------------------------------------------------------------------

def _make_rk4_kernel(n_trunk: int, hidden_dim: int, input_dim: int):
    third = 1.0 / 3.0

    def kernel(*refs):
        z_ref, dx_ref = refs[0], refs[1]
        trunk_refs = refs[2: 2 + 2 * n_trunk]
        head_w_ref, head_b_ref, out_ref = refs[2 + 2 * n_trunk:]

        head_w = head_w_ref[:]
        head_b = head_b_ref[:]
        dx = dx_ref[:]                      # (Bt, I)
        bt = dx.shape[0]

        def field(z):
            u = z
            for i in range(n_trunk):
                w = trunk_refs[2 * i][:]
                b = trunk_refs[2 * i + 1][:]
                u = jnp.maximum(
                    jnp.dot(u, w, preferred_element_type=jnp.float32) + b, 0.0
                )
            a = jnp.tanh(
                jnp.dot(u, head_w, preferred_element_type=jnp.float32) + head_b
            ).reshape(bt, input_dim, hidden_dim)
            return jnp.sum(a * dx[:, :, None].astype(jnp.float32), axis=1)

        z = z_ref[:].astype(jnp.float32)
        k1 = field(z)
        k2 = field(z + third * k1)
        k3 = field(z + k2 - third * k1)
        k4 = field(z + k1 - k2 + k3)
        out = z + (k1 + 3.0 * (k2 + k3) + k4) * 0.125
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


def fused_rk4_interval(trunk, head_w, head_b, z, dx, hidden_dim, input_dim):
    """z_{i+1} = RK4_38(z_i; f(z) = field(z) @ dx) over one unit interval,
    entirely in VMEM.  Shapes as in :func:`fused_matmul_field`.

    Measured note (TPU v5e, B=512, H=HH=128, C=21): this whole-interval
    fusion ties the per-stage kernel chain (~37 TF/s) — at these shapes the
    MXU matmul structure, not per-call overhead or weight refetch, is the
    bound.  Kept as an opt-in building block for shapes where weight
    residency matters (small HH, large stage count)."""
    batch = z.shape[0]
    hh = head_w.shape[0]
    head_cols = head_w.shape[1]
    # The in-kernel state updates need H == Hp: pack with pad=False and use
    # this op only for lane-aligned hidden sizes.
    assert head_cols == input_dim * hidden_dim, (
        "fused_rk4_interval requires unpadded packing "
        "(pack_fused_params(..., pad=False))"
    )
    # Four live stages need headroom on the Mosaic VMEM stack.
    tile = _pick_batch_tile(batch, head_cols, hh, budget_bytes=6 * 1024 * 1024)
    n_trunk = len(trunk)

    in_specs = [
        pl.BlockSpec((tile, z.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, dx.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [z, dx]
    for layer in trunk:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        operands += [layer["w"], layer["b"][None, :]]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    operands += [head_w, head_b[None, :]]

    flops = 4 * 2 * batch * (
        sum(l["w"].shape[0] * l["w"].shape[1] for l in trunk) + hh * head_cols
    )
    return pl.pallas_call(
        _make_rk4_kernel(n_trunk, hidden_dim, input_dim),
        grid=(batch // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile, hidden_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, hidden_dim), z.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (z.size * 2 + dx.size + hh * head_cols),
            transcendentals=4 * batch * head_cols,
        ),
    )(*operands)
