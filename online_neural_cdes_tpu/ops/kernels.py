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
A one-pass Pallas backward (:func:`_backward_pallas` — recompute + all
six cotangent groups with the activation VMEM-resident) exists and is
hardware-parity-checked, but measured SLOWER than the XLA recompute
(56.8 vs 40.4 us/call at the flagship stage shape, r3): XLA overlaps the
independent cotangent matmuls across fusion boundaries, which one Mosaic
kernel serialises.  It stays opt-in via ``ONCDE_PALLAS_BWD=1``
(:func:`fused_backward_pallas_enabled`).
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
    """MXU matmul with optional bf16 inputs and >=f32 accumulation (params
    stay f32 in HBM; the cast is a VPU op amortised by the matmul).  The
    accumulator dtype follows the input dtype so f64 runs (x64 debugging /
    CPU oracle tests) are not silently truncated to f32."""
    if precision == "bfloat16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.promote_types(a.dtype, jnp.float32),
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
    # Match the Pallas path's declared output dtype (z.dtype): _mm
    # accumulates at >=f32, so reduced-precision storage (bf16) would
    # otherwise silently promote here — on the custom_vjp fallback route
    # that shows up as a primal-f32 / cotangent-bf16 VJP dtype clash.
    return out[..., :hidden_dim].astype(z.dtype)


def _kernel_mm(a, b, precision):
    if precision == "bfloat16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b,
                   preferred_element_type=jnp.promote_types(a.dtype, jnp.float32))


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


def _make_bwd_kernel(n_trunk: int, hidden_pad: int, input_dim: int,
                     precision: str):
    """Backward kernel: recompute trunk/head activations in VMEM, then all
    six cotangent groups in one pass — the (B, I*Hp) activation never
    round-trips HBM (the r2 XLA recompute materialised it twice).  Grid is
    over batch tiles; weight-gradient outputs use a constant index map and
    accumulate across the sequential grid steps."""

    def kernel(*refs):
        z_ref, dx_ref, g_ref = refs[0], refs[1], refs[2]
        trunk_refs = refs[3: 3 + 2 * n_trunk]
        head_w_ref, head_b_ref = refs[3 + 2 * n_trunk: 5 + 2 * n_trunk]
        outs = refs[5 + 2 * n_trunk:]
        dz_ref, ddx_ref = outs[0], outs[1]
        dtrunk_refs = outs[2: 2 + 2 * n_trunk]
        dhw_ref, dhb_ref = outs[2 + 2 * n_trunk:]

        first = pl.program_id(0) == 0

        # --- recompute forward (all in VMEM) ---
        us = [z_ref[:]]
        for i in range(n_trunk):
            w = trunk_refs[2 * i][:]
            b = trunk_refs[2 * i + 1][:]
            us.append(jnp.maximum(_kernel_mm(us[-1], w, precision) + b, 0.0))
        head_w = head_w_ref[:]
        a = jnp.tanh(_kernel_mm(us[-1], head_w, precision) + head_b_ref[:])
        bt = a.shape[0]
        a3 = a.reshape(bt, input_dim, hidden_pad)
        dx = dx_ref[:].astype(jnp.float32)            # (Bt, I)
        g = g_ref[:].astype(jnp.float32)              # (Bt, Hp)

        # --- cotangents ---
        ddx = jnp.sum(a3 * g[:, None, :], axis=2)     # (Bt, I)
        ddx_ref[:] = ddx.astype(ddx_ref.dtype)
        # d(pre_head) = (g x dx) * tanh'
        dpre = (dx[:, :, None] * g[:, None, :]).reshape(bt, -1) * (1.0 - a * a)
        dhw = jax.lax.dot_general(
            us[-1], dpre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (HH, I*Hp)
        dhb = jnp.sum(dpre, axis=0, keepdims=True)

        @pl.when(first)
        def _():
            dhw_ref[:] = dhw.astype(dhw_ref.dtype)
            dhb_ref[:] = dhb.astype(dhb_ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _():
            dhw_ref[:] = dhw_ref[:] + dhw.astype(dhw_ref.dtype)
            dhb_ref[:] = dhb_ref[:] + dhb.astype(dhb_ref.dtype)

        du = jax.lax.dot_general(
            dpre, head_w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (Bt, HH)
        for i in range(n_trunk - 1, -1, -1):
            du = du * (us[i + 1] > 0.0)
            w = trunk_refs[2 * i][:]
            dw = jax.lax.dot_general(
                us[i], du, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db = jnp.sum(du, axis=0, keepdims=True)
            dw_ref = dtrunk_refs[2 * i]
            db_ref = dtrunk_refs[2 * i + 1]

            @pl.when(first)
            def _(dw_ref=dw_ref, db_ref=db_ref, dw=dw, db=db):
                dw_ref[:] = dw.astype(dw_ref.dtype)
                db_ref[:] = db.astype(db_ref.dtype)

            @pl.when(jnp.logical_not(first))
            def _(dw_ref=dw_ref, db_ref=db_ref, dw=dw, db=db):
                dw_ref[:] = dw_ref[:] + dw.astype(dw_ref.dtype)
                db_ref[:] = db_ref[:] + db.astype(db_ref.dtype)

            du = jax.lax.dot_general(
                du, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dz_ref[:] = du.astype(dz_ref.dtype)

    return kernel


def _backward_pallas(trunk, head_w, head_b, z, dx, g, hidden_dim, input_dim,
                     precision):
    batch = z.shape[0]
    hh = head_w.shape[0]
    head_cols = head_w.shape[1]
    hidden_pad = head_cols // input_dim
    n_trunk = len(trunk)
    # Working set per tile ~4 (Bt, head_cols) f32 arrays + weights + dW
    # accumulators; smaller tiles than the forward keep Mosaic under the
    # VMEM ceiling with the extra live tensors.
    tile = _pick_batch_tile(batch, head_cols, hh,
                            budget_bytes=5 * 1024 * 1024)

    def batch_spec(cols):
        return pl.BlockSpec((tile, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def acc_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [batch_spec(z.shape[1]), batch_spec(dx.shape[1]),
                batch_spec(g.shape[1])]
    operands = [z, dx, g]
    for layer in trunk:
        in_specs += [full, full]
        operands += [layer["w"], layer["b"][None, :]]
    in_specs += [full, full]
    operands += [head_w, head_b[None, :]]

    out_shape = [
        jax.ShapeDtypeStruct((batch, z.shape[1]), z.dtype),        # dz
        jax.ShapeDtypeStruct((batch, dx.shape[1]), dx.dtype),      # ddx
    ]
    out_specs = [batch_spec(z.shape[1]), batch_spec(dx.shape[1])]
    for layer in trunk:
        out_shape += [
            jax.ShapeDtypeStruct(layer["w"].shape, layer["w"].dtype),
            jax.ShapeDtypeStruct((1,) + layer["b"].shape, layer["b"].dtype),
        ]
        out_specs += [acc_spec(layer["w"].shape),
                      acc_spec((1,) + layer["b"].shape)]
    out_shape += [
        jax.ShapeDtypeStruct(head_w.shape, head_w.dtype),
        jax.ShapeDtypeStruct((1,) + head_b.shape, head_b.dtype),
    ]
    out_specs += [acc_spec(head_w.shape), acc_spec((1,) + head_b.shape)]

    flops = 3 * 2 * batch * (
        sum(l["w"].shape[0] * l["w"].shape[1] for l in trunk) + hh * head_cols
    )
    outs = pl.pallas_call(
        _make_bwd_kernel(n_trunk, hidden_pad, input_dim, precision),
        grid=(batch // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * z.size + 2 * dx.size + g.size
                                + 2 * hh * head_cols),
            transcendentals=batch * head_cols,
        ),
    )(*operands)
    dz, ddx = outs[0], outs[1]
    dtrunk = [
        {"w": outs[2 + 2 * i], "b": outs[3 + 2 * i][0]}
        for i in range(n_trunk)
    ]
    dhw, dhb = outs[2 + 2 * n_trunk], outs[3 + 2 * n_trunk][0]
    return dtrunk, dhw, dhb, dz, ddx


def fused_backward_pallas_enabled() -> bool:
    """Opt-in switch for the one-pass Pallas backward (see module note).
    Measured policy (TPU v5e, B=512, H=HH=128, I=21, 1000-call chains, r3):
    the monolithic Pallas backward runs 56.8 us/call vs 40.4 us for the
    XLA recompute vjp — XLA's scheduler overlaps the six independent
    cotangent matmuls across fusion boundaries, which a single Mosaic
    kernel serialises.  The kernel stays available (hardware-parity-
    checked every bench run) for shapes where VMEM residency wins —
    enable via ONCDE_PALLAS_BWD=1."""
    import os

    return os.environ.get("ONCDE_PALLAS_BWD", "0") == "1"


def _fused_bwd(hidden_dim, input_dim, use_pallas, precision, residuals, g):
    trunk, head_w, head_b, z, dx = residuals
    if use_pallas and fused_backward_pallas_enabled():
        # One-pass Pallas backward: recompute + all cotangents with the
        # (B, I*Hp) activation resident in VMEM.  g arrives sliced to the
        # true hidden width; the kernel works in the padded width.
        hp = head_w.shape[1] // input_dim
        g_p = g
        if hp != hidden_dim:
            g_p = jnp.pad(g, ((0, 0), (0, hp - hidden_dim)))
        return _backward_pallas(trunk, head_w, head_b, z, dx, g_p,
                                hidden_dim, input_dim, precision)

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


# ---------------------------------------------------------------------------
# Multi-replica interleaved whole-interval RK4 kernel (r5 experiment).
#
# Hypothesis under test: the flagship H=128 step is bounded by the dependent
# stage chain's per-matmul MXU pipeline latency, with ~2/3 of each eval spent
# on VPU work (tanh + contraction) during which the MXU idles — and vice
# versa.  XLA-level co-residency (vmapped K replicas, r5 concurrency_grid)
# measured FLAT because batched dot_generals serialise; but K *independent*
# replicas' stage chains interleaved INSIDE one Mosaic kernel give the
# static scheduler K independent matmul/VPU streams per RK stage, so one
# replica's MXU pass can overlap another's tanh/contraction.  If that
# overlap materialises, K co-trained models (the 3-seeds-per-config sweep
# protocol) cost ≪ K× one model.  Measured by scripts/interleave_experiment.py.
# ---------------------------------------------------------------------------


def _make_rk4_multi_kernel(n_replicas: int, n_trunk: int, hidden_dim: int,
                           input_dim: int):
    third = 1.0 / 3.0

    def kernel(*refs):
        z_ref, dx_ref = refs[0], refs[1]
        trunk_refs = refs[2: 2 + 2 * n_trunk]
        head_w_ref, head_b_ref, out_ref = refs[2 + 2 * n_trunk:]

        bt = z_ref.shape[1]
        dx = [dx_ref[r].astype(jnp.float32) for r in range(n_replicas)]

        def field(r, z):
            u = z
            for i in range(n_trunk):
                w = trunk_refs[2 * i][r]
                b = trunk_refs[2 * i + 1][r]
                u = jnp.maximum(
                    jnp.dot(u, w, preferred_element_type=jnp.float32) + b, 0.0
                )
            a = jnp.tanh(
                jnp.dot(u, head_w_ref[r], preferred_element_type=jnp.float32)
                + head_b_ref[r]
            ).reshape(bt, input_dim, hidden_dim)
            return jnp.sum(a * dx[r][:, :, None], axis=1)

        # Stage-major, replica-minor: each RK stage is a Python loop over the
        # K replicas' INDEPENDENT field evals — the instruction scheduler may
        # interleave replica r+1's matmuls with replica r's VPU epilogue.
        z = [z_ref[r].astype(jnp.float32) for r in range(n_replicas)]
        k1 = [field(r, z[r]) for r in range(n_replicas)]
        k2 = [field(r, z[r] + third * k1[r]) for r in range(n_replicas)]
        k3 = [field(r, z[r] + k2[r] - third * k1[r])
              for r in range(n_replicas)]
        k4 = [field(r, z[r] + k1[r] - k2[r] + k3[r])
              for r in range(n_replicas)]
        for r in range(n_replicas):
            out = z[r] + (k1[r] + 3.0 * (k2[r] + k3[r]) + k4[r]) * 0.125
            out_ref[r] = out.astype(out_ref.dtype)

    return kernel


def fused_rk4_interval_multi(trunk, head_w, head_b, z, dx, hidden_dim,
                             input_dim):
    """K independent replicas' unit RK4(3/8) intervals in ONE kernel,
    stage-interleaved so the Mosaic scheduler can overlap one replica's MXU
    matmuls with another's VPU (tanh/contraction) work.

    Stacked-replica layouts: ``trunk`` is a list of ``{'w': (K, din, dout),
    'b': (K, dout)}``; ``head_w`` is ``(K, HH, I*H)`` contraction-major
    UNPADDED (``pack_fused_params(..., pad=False)`` per replica, stacked);
    ``head_b``: ``(K, I*H)``; ``z``: ``(K, B, H)``; ``dx``: ``(K, B, I)``.
    Returns ``(K, B, H)``.  Weights differ per replica (co-trained seeds /
    configs); only shapes are shared."""
    n_replicas, batch = z.shape[0], z.shape[1]
    hh = head_w.shape[1]
    head_cols = head_w.shape[2]
    assert head_cols == input_dim * hidden_dim, (
        "fused_rk4_interval_multi requires unpadded packing "
        "(pack_fused_params(..., pad=False))"
    )
    n_trunk = len(trunk)
    # K replicas' weights + live stage tensors all resident: scale the
    # single-replica budget accounting by K.
    tile = batch
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if batch % cand != 0:
            continue
        words = n_replicas * (
            cand * (head_cols + hh + 6 * hidden_dim)
            + hh * head_cols
            + sum(l["w"].shape[1] * l["w"].shape[2] for l in trunk)
        )
        if words * 4 < 10 * 1024 * 1024:
            tile = cand
            break

    def rep_spec(cols):
        return pl.BlockSpec((n_replicas, tile, cols), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [rep_spec(z.shape[2]), rep_spec(dx.shape[2])]
    operands = [z, dx]
    for layer in trunk:
        in_specs += [full, full]
        operands += [layer["w"], layer["b"][:, None, :]]
    in_specs += [full, full]
    operands += [head_w, head_b[:, None, :]]

    flops = n_replicas * 4 * 2 * batch * (
        sum(l["w"].shape[1] * l["w"].shape[2] for l in trunk) + hh * head_cols
    )
    return pl.pallas_call(
        _make_rk4_multi_kernel(n_replicas, n_trunk, hidden_dim, input_dim),
        grid=(batch // tile,),
        in_specs=in_specs,
        out_specs=rep_spec(hidden_dim),
        out_shape=jax.ShapeDtypeStruct((n_replicas, batch, hidden_dim),
                                       z.dtype),
        # The interleaved schedule deliberately keeps K replicas' stage
        # tensors (incl. the (Bt, I*H) field activations) live at once —
        # that is the whole point — so the default 16 MB scoped-VMEM cap
        # is too small at K>=2.  v5e VMEM is 128 MB; give the scheduler
        # room and let the tile picker bound the true working set.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (z.size * 2 + dx.size
                                + n_replicas * hh * head_cols),
            transcendentals=n_replicas * 4 * batch * head_cols,
        ),
    )(*operands)
