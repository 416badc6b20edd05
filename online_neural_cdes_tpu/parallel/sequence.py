"""Sequence-sharded CDE solve over ICI: time-pipelined piece scan.

The genuinely TPU-new long-context capability (SURVEY.md §5): a Neural CDE
solve is a *sequential* recurrence over knot intervals, so classic sequence
parallelism (associative scan, ring attention) does not apply.  What does
apply is a **pipeline over time**: shard the knot axis of the per-piece
coefficients across the mesh's ``seq`` axis, split the batch into
microbatches, and stream each microbatch's hidden state through the
devices with ``lax.ppermute`` — device k integrates knot chunk k.  While
device k advances microbatch m through chunk k, device k+1 advances
microbatch m-1 through chunk k+1 (GPipe over time).

What this buys on hardware:

- **Memory**: each chip holds only ``1/n`` of the control's coefficient
  arrays — sequences n× longer fit (the rectilinear 2L−1 blow-up on long
  MIMIC stays feasible).
- **Wall-clock**: the sequential scan is latency-bound at small per-step
  batch; with M microbatches the pipeline runs ``(M + n − 1)`` ticks of
  ``L/n`` intervals each, i.e. ≈ ``n×`` fewer sequential interval-latencies
  than the plain scan for ``M ≫ n``.

Utilisation is ``M / (M + n − 1)``: devices compute masked garbage during
fill/drain ticks (values are ignored; a ``jnp.where`` selects real
injections).  Reverse-mode AD crosses ``shard_map``/``ppermute``
transparently, so the solve is trainable.

No reference counterpart: the reference handles long sequences only
algorithmically (adjoint, log-ODE windows — SURVEY §5 'long-context').
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from online_neural_cdes_tpu.ops import solvers
from online_neural_cdes_tpu.ops.cdeint import (
    _interval_adjoint_bwd,
    _one_interval,
    _piece_field,
    _split_pairs,
)

__all__ = ["make_sequence_mesh", "ncde_apply_pipelined", "pipelined_cde_solve"]


def make_sequence_mesh(n_seq: Optional[int] = None, axis: str = "seq") -> Mesh:
    import numpy as np

    devices = jax.devices()
    n = n_seq or len(devices)
    return Mesh(np.array(devices[:n]).reshape(n), (axis,))


def _fwd_slots(s, k, n, M):
    """Forward pipeline schedule (ONE copy — shared by the plain pipeline,
    the adjoint's forward replica, and, inverted, the reverse schedule):
    at tick ``s`` device ``k`` holds microbatch ``s - k`` (valid when in
    [0, M)); device n-1 finishes microbatch ``s - (n-1)``."""
    m_here = jnp.clip(s - k, 0, M - 1)
    here_valid = (s - k >= 0) & (s - k < M)
    m_out = s - (n - 1)
    return m_here, here_valid, m_out


def _make_fwd_tick(axis, k, n, M, z0_mb, chunk_solve, *, stash_boundary,
                   stash_seq):
    """The forward pipeline tick body (ONE copy — shared by the plain
    pipeline and the adjoint's forward replica, which must stay
    schedule-identical because the stored boundary states feed the reverse
    schedule).  Carry is ``(buf, outs, bnd, seqb)``; a caller that does
    not stash a buffer passes a 0-sized dummy for it and it flows through
    untouched.

    - ``stash_boundary``: record the chunk-boundary state ``x_in`` this
      device consumed for microbatch ``m_here`` (the adjoint's backward
      pass hands it down the reverse schedule so stage k-1 starts from the
      exact forward state).
    - ``stash_seq``: record the per-interval states ``zs`` of the chunk.
    """
    fwd_perm = [(i, i + 1) for i in range(n - 1)]
    b_loc = z0_mb.shape[1]

    def tick(carry, s):
        buf, outs, bnd, seqb = carry
        inject = z0_mb[jnp.clip(s, 0, M - 1)]
        x_in = jnp.where(k == 0, inject, buf)
        # Microbatch index this device holds at tick s is (s - k);
        # clamped for the fill/drain ticks (garbage, masked below).
        m_here, here_valid, m_out = _fwd_slots(s, k, n, M)
        if stash_boundary:
            cur_b = jax.lax.dynamic_slice_in_dim(bnd, m_here, 1, 0)[0]
            bnd = jax.lax.dynamic_update_slice_in_dim(
                bnd, jnp.where(here_valid, x_in, cur_b)[None], m_here, 0
            )
        y, zs = chunk_solve(x_in, m_here * b_loc)
        if stash_seq:
            cur_s = jax.lax.dynamic_slice_in_dim(seqb, m_here, 1, 0)[0]
            seqb = jax.lax.dynamic_update_slice_in_dim(
                seqb, jnp.where(here_valid, zs, cur_s)[None], m_here, 0
            )
        buf = jax.lax.ppermute(y, axis, fwd_perm) if n > 1 else y
        # Device n-1 finishes microbatch (s - (n-1)) at this tick.
        slot = jnp.clip(m_out, 0, M - 1)
        valid = (m_out >= 0) & (k == n - 1)
        current = jax.lax.dynamic_slice_in_dim(outs, slot, 1, 0)[0]
        outs = jax.lax.dynamic_update_slice_in_dim(
            outs, jnp.where(valid, y, current)[None], slot, 0
        )
        return (buf, outs, bnd, seqb), None

    return tick


def _bwd_slots(s, k, n, M):
    """Reverse pipeline schedule: device k processes microbatch
    ``M-1 - (s - (n-1-k))`` at reverse tick ``s`` (the forward schedule
    run backwards: m at device k at forward tick m + k)."""
    m_here = M - 1 - (s - (n - 1 - k))
    valid = (m_here >= 0) & (m_here < M)
    return jnp.clip(m_here, 0, M - 1), valid


def _chunk_solve(step, pf, pf_e, z, p_mb, t0s_l, t1s_l, args_l, substeps):
    """Integrate one microbatch's (b, H) state through a device's chunk.
    With ``pf_e`` the chunk runs as (even, odd) interval PAIRS — the
    rectilinear time-advance intervals contract only the control's time
    channel (ops/cdeint.py's paired scan, chunk-local; requires an even
    chunk length so pairs never straddle devices).  Returns
    ``(z_end, per-knot zs)`` with zs[i] = state after local interval i."""
    if pf_e is None:

        def interval(zz, inp):
            piece, t0, t1 = inp
            zz = _one_interval(step, pf, piece, t0, t1, zz, args_l, substeps)
            return zz, zz

        return jax.lax.scan(interval, z, (p_mb, t0s_l, t1s_l))

    pe, po = _split_pairs(p_mb)

    def pair(zz, inp):
        ppe, ppo, ta, tb, tc = inp
        z_mid = _one_interval(step, pf_e, ppe, ta, tb, zz, args_l, substeps)
        z_end = _one_interval(step, pf, ppo, tb, tc, z_mid, args_l, substeps)
        return z_end, (z_mid, z_end)

    z, (mids, ends) = jax.lax.scan(
        pair, z, (pe, po, t0s_l[0::2], t1s_l[0::2], t1s_l[1::2])
    )
    return z, _interleave_pairs(mids, ends)


def _interleave_pairs(pb_e, pb_o):
    return jax.tree.map(
        lambda e, o: jnp.stack([e, o], axis=1).reshape((-1,) + e.shape[1:]),
        pb_e, pb_o,
    )


def _chunk_adjoint(bwd_step, pf, pf_e, z_end, a, args_bar, p_mb, t0s_l, t1s_l,
                   args_l, substeps, g_chunk):
    """Reverse one device's chunk of the augmented adjoint state; per-knot
    cotangents ``g_chunk[i]`` join ``a`` before their interval reverses.
    Paired variant mirrors :func:`_chunk_solve`'s pairing."""
    if pf_e is None:

        def interval_bwd(carry, inp):
            z, a_, ab = carry
            piece, t0, t1, g_knot = inp
            a_ = a_ + g_knot
            z, a_, ab, pb = _interval_adjoint_bwd(
                bwd_step, pf, piece, t0, t1, z, a_, args_l, ab, substeps,
                return_state=True,
            )
            return (z, a_, ab), pb

        return jax.lax.scan(
            interval_bwd, (z_end, a, args_bar),
            (p_mb, t0s_l, t1s_l, g_chunk), reverse=True,
        )

    pe, po = _split_pairs(p_mb)

    def pair_bwd(carry, inp):
        z, a_, ab = carry
        ppe, ppo, ta, tb, tc, g_m, g_e = inp
        a_ = a_ + g_e
        z, a_, ab, pb_o = _interval_adjoint_bwd(
            bwd_step, pf, ppo, tb, tc, z, a_, args_l, ab, substeps,
            return_state=True,
        )
        a_ = a_ + g_m
        z, a_, ab, pb_e = _interval_adjoint_bwd(
            bwd_step, pf_e, ppe, ta, tb, z, a_, args_l, ab, substeps,
            return_state=True,
        )
        return (z, a_, ab), (pb_e, pb_o)

    carry, (pb_e, pb_o) = jax.lax.scan(
        pair_bwd, (z_end, a, args_bar),
        (pe, po, t0s_l[0::2], t1s_l[0::2], t1s_l[1::2],
         g_chunk[0::2], g_chunk[1::2]),
        reverse=True,
    )
    return carry, _interleave_pairs(pb_e, pb_o)


def _pipelined_adjoint(pf, pf_e, step, bwd_step, mesh, axis, data_axis,
                       n, M, substeps, seq: bool):
    """O(1)-activation-memory training through the time pipeline: a
    ``custom_vjp`` whose backward pass runs the pipeline in REVERSE —
    hidden-state/adjoint pairs stream device n-1 -> 0 over a backward
    ``ppermute`` schedule while each stage re-integrates the augmented
    state ``(z, a_z, a_piece, a_args)`` through its own knot chunk via
    :func:`ops.cdeint._interval_adjoint_bwd`.  The only forward residual
    beyond the outputs is each device's (M, b, H) chunk-BOUNDARY states —
    one batch-worth per device, independent of the chunk length — handed
    down the reverse schedule so every stage starts its adjoint from the
    exact forward state (only the within-chunk ``z`` is
    reverse-integrated; gradients agree with the stored-state interval
    adjoint to solver order — tested).  Activation memory is O(carries),
    independent of ticks x chunk work (builder NEXT.md r2 #5 / VERDICT r2
    next #3).

    With ``seq=True`` (online tasks) the solve also emits per-knot states,
    and the backward injects each knot's cotangent at the device that owns
    it: inside a stage's reverse interval scan, ``a += g_knot[i]`` before
    interval i is re-integrated — the pipelined analogue of the plain
    interval adjoint's per-output ``a += g_r`` (ops/cdeint.py)."""
    bwd_perm = [(i, i - 1) for i in range(1, n)]

    def _local_slice(pieces_l, mb_start, b_loc):
        return jax.tree.map(
            lambda leaf: leaf if leaf.ndim < 2 else
            jax.lax.dynamic_slice_in_dim(leaf, mb_start, b_loc, axis=1),
            pieces_l,
        )

    def local_fwd(z0_mb, t0s_l, t1s_l, pieces_l, args_l):
        # The tick body is the SHARED _make_fwd_tick (schedule-identical to
        # the plain pipeline by construction); this replica additionally
        # stashes the chunk-boundary state z_{m,k} each device consumed —
        # the backward pass hands it down the reverse schedule so stage
        # k-1 starts its adjoint from the exact forward state.
        k = jax.lax.axis_index(axis)
        b_loc = z0_mb.shape[1]
        Tc = t0s_l.shape[0]

        def chunk_solve(z, mb_start):
            p_mb = _local_slice(pieces_l, mb_start, b_loc)
            return _chunk_solve(step, pf, pf_e, z, p_mb, t0s_l, t1s_l,
                                args_l, substeps)

        tick = _make_fwd_tick(axis, k, n, M, z0_mb, chunk_solve,
                              stash_boundary=True, stash_seq=seq)
        seq0 = (
            jnp.zeros((M, Tc) + z0_mb.shape[1:], z0_mb.dtype)
            if seq else jnp.zeros((0,), z0_mb.dtype)
        )
        (_, outs, bnd, seqb), _ = jax.lax.scan(
            tick,
            (jnp.zeros_like(z0_mb[0]), jnp.zeros_like(z0_mb),
             jnp.zeros_like(z0_mb), seq0),
            jnp.arange(M + n - 1),
        )
        outs = jax.lax.psum(jnp.where(k == n - 1, outs, 0.0), axis)
        if seq:
            return outs, bnd[None], seqb
        return outs, bnd[None]

    def local_bwd(g_mb, g_seq_l, zout_mb, bnd_l, t0s_l, t1s_l, pieces_l,
                  args_l):
        k = jax.lax.axis_index(axis)
        b_loc = g_mb.shape[1]
        bnd_l = bnd_l[0]                    # (M, b_loc, H) own boundaries

        def chunk_adjoint(z_end, a, args_bar, mb_start, g_chunk):
            p_mb = _local_slice(pieces_l, mb_start, b_loc)
            (z, a, args_bar), pbs = _chunk_adjoint(
                bwd_step, pf, pf_e, z_end, a, args_bar, p_mb, t0s_l, t1s_l,
                args_l, substeps, g_chunk,
            )
            return z, a, args_bar, pbs

        zero_args = jax.tree.map(jnp.zeros_like, args_l)
        pb_buf0 = jax.tree.map(jnp.zeros_like, pieces_l)
        Tc = t0s_l.shape[0]
        zero_gchunk = jnp.zeros((Tc,) + g_mb.shape[1:], g_mb.dtype)

        def tick(carry, s):
            zbuf, abuf, args_bar, pb_buf, z0_bar = carry
            # Device n-1 injects microbatch M-1-s; device k processes
            # microbatch m at reverse tick s = (M-1-m) + (n-1-k).
            m_inj = jnp.clip(M - 1 - s, 0, M - 1)
            z_in = jnp.where(k == n - 1, zout_mb[m_inj], zbuf)
            a_in = jnp.where(k == n - 1, g_mb[m_inj], abuf)
            mc, valid = _bwd_slots(s, k, n, M)
            g_chunk = (
                jax.lax.dynamic_slice_in_dim(g_seq_l, mc, 1, 0)[0]
                if seq else zero_gchunk
            )
            z, a, args_bar_new, pbs = chunk_adjoint(
                z_in, a_in, args_bar, mc * b_loc, g_chunk
            )
            args_bar = jax.tree.map(
                lambda new, old: jnp.where(valid, new, old),
                args_bar_new, args_bar,
            )

            def upd_pb(buf, pb):
                if buf.ndim < 2:
                    # Batch-free per-piece leaves (e.g. smoothing flags):
                    # cotangents sum over microbatches.
                    return buf + jnp.where(valid, pb, jnp.zeros_like(pb))
                cur = jax.lax.dynamic_slice_in_dim(buf, mc * b_loc, b_loc, 1)
                return jax.lax.dynamic_update_slice_in_dim(
                    buf, jnp.where(valid, pb, cur), mc * b_loc, 1
                )

            pb_buf = jax.tree.map(upd_pb, pb_buf, pbs)
            # Hand the EXACT stored boundary state z_{m,k} (this chunk's
            # forward input) downstream — not the reverse-integrated z —
            # so stage k-1's adjoint starts drift-free.
            z_send = jax.lax.dynamic_slice_in_dim(bnd_l, mc, 1, 0)[0]
            zbuf = jax.lax.ppermute(z_send, axis, bwd_perm) if n > 1 else z_send
            abuf = jax.lax.ppermute(a, axis, bwd_perm) if n > 1 else a
            del z
            # Device 0 finished microbatch m_here: a at t=0 is dL/dz0[m].
            done = valid & (k == 0)
            cur0 = jax.lax.dynamic_slice_in_dim(z0_bar, mc, 1, 0)[0]
            z0_bar = jax.lax.dynamic_update_slice_in_dim(
                z0_bar, jnp.where(done, a, cur0)[None], mc, 0
            )
            return (zbuf, abuf, args_bar, pb_buf, z0_bar), None

        carry0 = (
            jnp.zeros_like(g_mb[0]), jnp.zeros_like(g_mb[0]),
            zero_args, pb_buf0, jnp.zeros_like(g_mb),
        )
        (_, _, args_bar, pb_buf, z0_bar), _ = jax.lax.scan(
            tick, carry0, jnp.arange(M + n - 1)
        )
        # Each device holds its own chunk's piece cotangents; args/z0
        # cotangents accumulate across stages (and the data axis holds
        # distinct batch rows, so batch-free piece leaves must sum there).
        args_bar = jax.lax.psum(args_bar, axis)
        if data_axis is not None:
            args_bar = jax.lax.psum(args_bar, data_axis)
            pb_buf = jax.tree.map(
                lambda leaf: leaf if leaf.ndim >= 2
                else jax.lax.psum(leaf, data_axis),
                pb_buf,
            )
        z0_bar = jax.lax.psum(jnp.where(k == 0, z0_bar, 0.0), axis)
        return z0_bar, pb_buf, args_bar

    seq_spec = P(axis)
    repl = P()

    def specs(pieces):
        if data_axis is None:
            z_spec, out_spec = repl, repl
            bnd_spec = P(axis)
            seq_out_spec = P(None, axis)
            pieces_spec = jax.tree.map(
                lambda leaf: seq_spec if leaf.ndim < 2 else P(axis, None),
                pieces,
            )
        else:
            z_spec, out_spec = P(None, data_axis), P(None, data_axis)
            bnd_spec = P(axis, None, data_axis)
            seq_out_spec = P(None, axis, data_axis)
            pieces_spec = jax.tree.map(
                lambda leaf: P(axis, data_axis) if leaf.ndim >= 2 else P(axis),
                pieces,
            )
        return z_spec, out_spec, bnd_spec, seq_out_spec, pieces_spec

    def run_fwd(z0_mb, t0s, t1s, pieces, args):
        z_spec, out_spec, bnd_spec, seq_out_spec, pieces_spec = specs(pieces)
        out_specs = (
            (out_spec, bnd_spec, seq_out_spec) if seq
            else (out_spec, bnd_spec)
        )
        run = jax.shard_map(
            local_fwd, mesh=mesh,
            in_specs=(z_spec, seq_spec, seq_spec, pieces_spec, repl),
            out_specs=out_specs, check_vma=False,
        )
        return jax.jit(run)(z0_mb, t0s, t1s, pieces, args)

    @jax.custom_vjp
    def solve(z0_mb, t0s, t1s, pieces, args):
        res = run_fwd(z0_mb, t0s, t1s, pieces, args)
        return (res[0], res[2]) if seq else res[0]

    def solve_fwd(z0_mb, t0s, t1s, pieces, args):
        res = run_fwd(z0_mb, t0s, t1s, pieces, args)
        if seq:
            outs, bnd, seqb = res
            return (outs, seqb), (outs, bnd, t0s, t1s, pieces, args)
        outs, bnd = res
        return outs, (outs, bnd, t0s, t1s, pieces, args)

    def solve_bwd(res, g):
        outs, bnd, t0s, t1s, pieces, args = res
        if seq:
            g_outs, g_seq = g
        else:
            g_outs, g_seq = g, jnp.zeros((0,), outs.dtype)
        z_spec, out_spec, bnd_spec, seq_out_spec, pieces_spec = specs(pieces)
        g_seq_spec = seq_out_spec if seq else repl
        run = jax.shard_map(
            local_bwd, mesh=mesh,
            in_specs=(z_spec, g_seq_spec, z_spec, bnd_spec, seq_spec,
                      seq_spec, pieces_spec, repl),
            out_specs=(z_spec, pieces_spec, repl), check_vma=False,
        )
        z0_bar, piece_bars, args_bar = jax.jit(run)(
            g_outs, g_seq, outs, bnd, t0s, t1s, pieces, args)
        return z0_bar, jnp.zeros_like(t0s), jnp.zeros_like(t1s), \
            piece_bars, args_bar

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


def pipelined_cde_solve(
    X,
    func: Callable,
    z0: jax.Array,
    args: Any = None,
    *,
    mesh: Mesh,
    axis: str = "seq",
    data_axis: Optional[str] = None,
    method: str = "rk4",
    substeps: int = 1,
    microbatches: Optional[int] = None,
    vector_field_type: str = "matmul",
    return_sequences: bool = False,
    remat: bool = False,
    adjoint: bool = False,
    adjoint_method: Optional[str] = None,
    even_func: Optional[Callable] = None,
) -> jax.Array:
    """Solve dz = f(t, z) dX over ``X.interval`` with the knot axis
    pipelined across ``mesh[axis]``.  Returns the ``(B, H)`` terminal
    states, or with ``return_sequences=True`` the ``(B, L, H)`` states at
    every knot (the online-task output; per-knot rows are computed
    chunk-locally and gathered by the out-sharding).

    Args:
        X: a piece-scan-capable spline (``piece_data`` API) built from
           ``(B, L, C)`` observations.
        func: vector field, same contract as :func:`ops.cdeint.cdeint` for
           the given ``vector_field_type``.
        z0: ``(B, H)`` initial hidden state.
        mesh: mesh whose ``axis`` dimension (size n) shards the knot axis.
        data_axis: optional second mesh axis name sharding the BATCH within
           each pipeline stage — composed data x sequence parallelism on a
           2-D ``Mesh((n_data, n_seq), ("data", "seq"))``: each stage's
           chunk work runs batch-sharded over the ``data`` columns while
           hidden states stream stage-to-stage over ``seq``.  Microbatch
           rows must divide by the data-axis size.
        microbatches: M, the batch split streamed through the pipeline
           (default n).  ``B % M == 0``; utilisation is M/(M+n−1).
        remat: rematerialise each pipeline tick in the backward pass —
           activation memory drops from O(ticks × chunk work) to
           O(ticks × carries), the right trade for the long sequences
           this pipeline exists for.
        adjoint: O(1)-activation-memory training: the backward pass is a
           REVERSE pipeline re-integrating the augmented adjoint state
           stage-locally — no per-tick residuals at all (see
           :func:`_pipelined_adjoint`).  With ``return_sequences`` each
           knot's cotangent is injected at the device that owns it.
           Gradients match the stored-state interval adjoint to solver
           order.

    Returns:
        ``(B, H)`` terminal states — bitwise-comparable to the plain
        piece-scan solve at matching method/substeps.

    Compilation note: the shard_map is jitted at this call boundary
    (required for ``remat``; a no-op inline under an outer jit).  Called
    standalone in a loop it re-traces per call — wrap your train/eval step
    in ``jax.jit`` (as ``make_train_step`` does) so the pipeline compiles
    once.
    """
    shard_map = jax.shard_map

    n = mesh.shape[axis]
    spline_cls = type(X)
    pf = _piece_field(spline_cls, func, vector_field_type)
    step = solvers.tree_fixed_step(method)
    if adjoint_method is not None and adjoint_method not in solvers.FIXED_METHODS:
        # Same contract/message as cdeint's fixed-grid adjoint_options check.
        raise ValueError(
            f"fixed-grid adjoint_options method {adjoint_method!r} must be "
            f"one of {solvers.FIXED_METHODS}"
        )
    pf_e = (
        _piece_field(spline_cls, even_func, vector_field_type)
        if even_func is not None else None
    )

    grid_t = X.grid_points.astype(z0.dtype)
    pieces = X.piece_data()
    n_pieces = grid_t.shape[0] - 1
    if n_pieces % n != 0:
        raise ValueError(
            f"knot pieces ({n_pieces}) must divide evenly over the {n}-way "
            f"'{axis}' mesh axis — pad the series to a multiple."
        )
    # The paired (even/odd) chunk scan needs whole pairs per device: an
    # even chunk length with chunks starting at even piece indices (both
    # hold when Tc = n_pieces/n is even).  Otherwise fall back to the
    # unpaired chunk body (same values, full-field evens) — mirroring the
    # cdeint paired-scan gating.
    if pf_e is not None and (n_pieces // n) % 2 != 0:
        pf_e = None
    B = z0.shape[0]
    M = microbatches or n
    if B % M != 0:
        raise ValueError(f"batch {B} must split into {M} microbatches.")
    b = B // M
    if data_axis is not None:
        n_data = mesh.shape[data_axis]
        if b % n_data != 0:
            raise ValueError(
                f"microbatch rows ({b}) must divide over the {n_data}-way "
                f"'{data_axis}' mesh axis."
            )

    t0s, t1s = grid_t[:-1], grid_t[1:]
    if data_axis is None:
        z0_mb = z0.reshape(M, b, *z0.shape[1:])
    else:
        # The pieces' GLOBAL batch axis shards contiguously over the data
        # axis (device d gets rows [d*B/nd, (d+1)*B/nd)), while z0_mb's
        # axis-1 shard of width b/nd must hand device d the matching rows
        # of each microbatch — permute so local slice (m, i) on device d is
        # global row d*B/nd + m*(b/nd) + i on both operands.
        z0_mb = (
            z0.reshape(n_data, M, b // n_data, *z0.shape[1:])
            .swapaxes(0, 1)
            .reshape(M, b, *z0.shape[1:])
        )

    if adjoint:
        bwd_step = (
            solvers.tree_fixed_step(adjoint_method)
            if adjoint_method is not None else step
        )
        solve_adj = _pipelined_adjoint(
            pf, pf_e, step, bwd_step, mesh, axis, data_axis, n, M, substeps,
            seq=return_sequences,
        )
        feat = z0.shape[1:]
        if not return_sequences:
            outs = solve_adj(z0_mb, t0s, t1s, pieces, args)
            if data_axis is None:
                return outs.reshape(B, *feat)
            return (
                outs.reshape(M, n_data, b // n_data, *feat)
                .swapaxes(0, 1)
                .reshape(B, *feat)
            )
        _, seq = solve_adj(z0_mb, t0s, t1s, pieces, args)
        # (M, n_pieces, b, H) -> (B, n_pieces, H) (+ z0 row), matching the
        # non-adjoint seq layout below; the concat is differentiable, so
        # the z0 row's cotangent reaches z0 directly while per-knot
        # cotangents flow through the reverse pipeline.
        if data_axis is None:
            seq = jnp.moveaxis(seq, 2, 1).reshape(B, n_pieces, *feat)
        else:
            seq = (
                seq.reshape(M, n_pieces, n_data, b // n_data, *feat)
                .transpose(2, 0, 3, 1, *range(4, 4 + len(feat)))
                .reshape(B, n_pieces, *feat)
            )
        return jnp.concatenate([z0[:, None], seq], axis=1)

    def local(z0_mb, t0s_l, t1s_l, pieces_l, args_l):
        # Shapes on each device: t0s_l/t1s_l (Tc,), pieces_l leaves
        # (Tc, B_loc, ..., C), z0_mb (M, b_loc, H) — with a data axis the
        # batch dims arrive pre-sharded, so all indexing below uses the
        # LOCAL microbatch width.
        k = jax.lax.axis_index(axis)
        b_loc = z0_mb.shape[1]

        def chunk_solve(z, mb_start):
            """Integrate one microbatch's (b_loc, H) state through this
            device's Tc intervals, slicing its batch columns out of the
            chunk-local pieces (per-piece leaves carry batch at axis 1;
            <2-D leaves are batch-free and pass through unsliced).
            Delegates to the shared chunk body — paired when pf_e is set."""
            p_mb = jax.tree.map(
                lambda leaf: leaf if leaf.ndim < 2 else
                jax.lax.dynamic_slice_in_dim(leaf, mb_start, b_loc, axis=1),
                pieces_l,
            )
            return _chunk_solve(step, pf, pf_e, z, p_mb, t0s_l, t1s_l,
                                args_l, substeps)

        Tc = t0s_l.shape[0]

        # The SHARED forward tick body (schedule-identical to the adjoint's
        # forward replica by construction; wrapped in jax.checkpoint below
        # when remat=True).
        tick = _make_fwd_tick(axis, k, n, M, z0_mb, chunk_solve,
                              stash_boundary=False, stash_seq=True)

        buf0 = jnp.zeros_like(z0_mb[0])                # carry from device k-1
        outs0 = jnp.zeros_like(z0_mb)                  # final states (device n-1)
        bnd0 = jnp.zeros((0,), z0_mb.dtype)            # unused stash slot
        seq0 = jnp.zeros((M, Tc) + z0_mb.shape[1:], z0_mb.dtype)
        tick_fn = jax.checkpoint(tick) if remat else tick
        (_, outs, _, seq), _ = jax.lax.scan(
            tick_fn, (buf0, outs0, bnd0, seq0), jnp.arange(M + n - 1)
        )
        # Only device n-1 holds real terminal states; sum-broadcast to all.
        outs = jax.lax.psum(jnp.where(k == n - 1, outs, 0.0), axis)
        return outs, seq

    seq_spec = P(axis)
    repl = P()
    if data_axis is None:
        z0_spec, pieces_spec = repl, seq_spec
        out_spec, seq_out_spec = repl, P(None, axis)
    else:
        # Composed data x sequence: batch dims shard over ``data_axis``
        # (axis 1 of z0_mb and of every batched per-piece leaf) while the
        # knot axis shards over ``axis``.
        z0_spec = P(None, data_axis)
        pieces_spec = jax.tree.map(
            lambda leaf: P(axis, data_axis) if leaf.ndim >= 2 else P(axis),
            pieces,
        )
        out_spec, seq_out_spec = P(None, data_axis), P(None, axis, data_axis)
    solve = shard_map(
        local,
        mesh=mesh,
        in_specs=(z0_spec, seq_spec, seq_spec, pieces_spec, repl),
        # seq output: device-local (M, Tc, b_loc, H) chunks concatenate over
        # the knot axis (and batch over the data axis when present).
        out_specs=(out_spec, seq_out_spec),
        check_vma=False,
    )
    # jit the shard_map (required for checkpoint-inside-shard_map; a no-op
    # under an outer jit).
    outs, seq = jax.jit(solve)(z0_mb, t0s, t1s, pieces, args)
    feat = z0.shape[1:]
    if not return_sequences:
        if data_axis is None:
            return outs.reshape(B, *feat)
        # Invert the data-major input permutation (see z0_mb above).
        return (
            outs.reshape(M, n_data, b // n_data, *feat)
            .swapaxes(0, 1)
            .reshape(B, *feat)
        )
    # (M, n_pieces, b, H) -> (B, n_pieces, H), then prepend the z0 row so
    # the layout matches the plain scan's (B, L, H).
    if data_axis is None:
        seq = jnp.moveaxis(seq, 2, 1).reshape(B, n_pieces, *feat)
    else:
        seq = (
            seq.reshape(M, n_pieces, n_data, b // n_data, *feat)
            .transpose(2, 0, 3, 1, *range(4, 4 + len(feat)))
            .reshape(B, n_pieces, *feat)
        )
    return jnp.concatenate([z0[:, None], seq], axis=1)


def ncde_apply_pipelined(
    model,
    params: dict,
    inputs,
    *,
    mesh: Mesh,
    axis: str = "seq",
    data_axis: Optional[str] = None,
    microbatches: Optional[int] = None,
    remat: bool = False,
    adjoint: bool = False,
):
    """NeuralCDE forward with the solve routed through the time pipeline:
    the model-zoo entry point for sequence-sharded long-context inference
    and training.  Mirrors ``model.apply(params, inputs)`` — same h0 setup,
    same output head and rectilinear ``::2`` filtering — but the knot axis
    of the solve is pipelined across ``mesh[axis]``.

    Constraints: fixed-grid solver (rk4/euler/midpoint), knot pieces
    divisible by the mesh axis, batch divisible by ``microbatches``.
    """
    from online_neural_cdes_tpu.ops import solvers as _solvers

    if model.solver not in _solvers.FIXED_METHODS:
        raise ValueError(
            f"pipelined NCDE forward requires a fixed-grid solver, got "
            f"{model.solver!r}."
        )
    spline, h0 = model._setup_h0(params, inputs)
    # Same field routing as model.apply: the fused trunk->head->contraction
    # custom_vjp (+ Pallas where lane-aligned) fires inside the pipeline
    # ticks too — the long-sequence production configuration runs the same
    # per-stage kernel as the plain scan.
    func, even_func, field_args, vf_type = model.make_solve_func(params, h0)

    from online_neural_cdes_tpu.ops.cdeint import _resolve_substeps

    substeps = _resolve_substeps(
        dict(model.solver_settings["options"]), spline.grid_points
    )
    hidden = pipelined_cde_solve(
        spline, func, h0, field_args, mesh=mesh, axis=axis,
        data_axis=data_axis, method=model.solver, substeps=substeps,
        microbatches=microbatches, vector_field_type=vf_type,
        return_sequences=model.return_sequences, remat=remat,
        adjoint=adjoint, adjoint_method=getattr(model, "adjoint_method", None),
        even_func=even_func,
    )
    if not model.return_sequences:
        # _make_outputs expects a time axis at -2.
        hidden = hidden[..., None, :]
    return model._make_outputs(params, hidden)
