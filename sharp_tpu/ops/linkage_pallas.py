"""Single-kernel Pallas Ward linkage — the speed-of-light path.

The XLA implementations (ops/linkage.py) are bounded by per-step kernel
dispatch: every merge runs ~40-70 tiny device ops, ~5us each. Here the
whole agglomeration — row-min cache, lazy revalidation, Lance-Williams
update, merge recording — runs inside ONE `pallas_call`: the distance
matrix is DMA'd into VMEM once and every step is a handful of VPU
passes over on-chip memory with zero dispatch overhead.

TPU-shape notes: scalar state lives in (1, n) lane vectors updated with
masked writes (Mosaic cannot store scalars to VMEM); merges/heights
accumulate in (8, n)-tiled scratch planes flushed to the output once.

Layout: one ensemble member per grid step (grid = (K,)); D lives in a
VMEM scratch of configurable dtype (float32 when it fits — n <= ~1400;
bfloat16 for n = 2048, which halves storage at ~3-digit distance
precision — merge order may differ from the f32 reference on near-ties,
so tests compare f32 bit-exactly and bf16 at clustering level).

Algorithm identical to `ward_linkage_fast` (same lower-bound row-min
invariant, same lazy revalidation, same ward.D arithmetic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sharp_tpu.ops.distance import BIG
from sharp_tpu.ops.linkage import LinkageResult


def _kernel(
    D_any, merges_ref, heights_ref,
    Dv, rowmin, rowarg, act, sizes, sem,
):
    k = pl.program_id(0)
    n = Dv.shape[0]
    store_dt = Dv.dtype

    dma = pltpu.make_async_copy(D_any.at[k], Dv, sem)
    dma.start()
    dma.wait()

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    big = jnp.asarray(BIG, store_dt)
    Dv[:, :] = jnp.where(row_ids == col_ids, big, Dv[:, :])

    Df = Dv[:, :].astype(jnp.float32)
    # D is symmetric: row minima == column minima, and axis-0 reductions
    # land directly in (1, n) lane-vector layout
    rowmin[:, :] = jnp.min(Df, axis=0, keepdims=True)
    rowarg[:, :] = jnp.argmin(Df, axis=0)[None, :].astype(jnp.int32)
    act[:, :] = jnp.ones((1, n), jnp.float32)
    sizes[:, :] = jnp.ones((1, n), jnp.float32)
    merges_ref[0, :, :] = jnp.zeros((8, n), jnp.int32)
    heights_ref[0, :, :] = jnp.zeros((8, n), jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    subl8 = jax.lax.broadcasted_iota(jnp.int32, (8, n), 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, n), 1)

    # bf16 tiles are (16, 128): dynamic single-row slices break tiling, so
    # narrow dtypes go through aligned 16-row blocks with a sublane select
    SUB = 8 if store_dt == jnp.float32 else 16
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, n), 0)
    direct_rows = store_dt == jnp.float32

    def read_row(idx):
        if direct_rows:
            return Dv[pl.ds(idx, 1), :].astype(jnp.float32)
        base = pl.multiple_of((idx // SUB) * SUB, SUB)
        block = Dv[pl.ds(base, SUB), :].astype(jnp.float32)
        r = idx - base
        return jnp.sum(
            jnp.where(sub_iota == r, block, 0.0), axis=0, keepdims=True
        )

    def write_row(idx, row_f32):
        if direct_rows:
            Dv[pl.ds(idx, 1), :] = row_f32.astype(store_dt)
            return
        base = pl.multiple_of((idx // SUB) * SUB, SUB)
        r = idx - base
        block = Dv[pl.ds(base, SUB), :]
        block = jnp.where(sub_iota == r, row_f32.astype(store_dt), block)
        Dv[pl.ds(base, SUB), :] = block

    def lane_of(vec, idx):
        """Scalar read vec[0, idx] as a masked reduction (lane-safe)."""
        return jnp.max(jnp.where(lane == idx, vec[:, :], -jnp.inf))

    def ilane_of(vec, idx):
        return jnp.max(jnp.where(lane == idx, vec[:, :], -(2**30)))

    def step(t, _):
        # --- lazy pop + revalidation ------------------------------------
        def reval_cond(done):
            return jnp.logical_not(done)

        def reval_body(done):
            i0 = jnp.argmin(rowmin[0, :]).astype(jnp.int32)
            row = read_row(i0)
            m = jnp.min(row)
            a = jnp.argmin(row[0, :]).astype(jnp.int32)
            exact = m <= lane_of(rowmin, i0)
            sel = lane == i0
            rowmin[:, :] = jnp.where(sel, m, rowmin[:, :])
            rowarg[:, :] = jnp.where(sel, a, rowarg[:, :])
            return exact

        jax.lax.while_loop(reval_cond, reval_body, False)

        i0 = jnp.argmin(rowmin[0, :]).astype(jnp.int32)
        j0 = ilane_of(rowarg, i0).astype(jnp.int32)
        i = jnp.minimum(i0, j0)
        j = jnp.maximum(i0, j0)
        h = lane_of(rowmin, i0)

        # --- Lance-Williams --------------------------------------------
        ni = lane_of(sizes, i)
        nj = lane_of(sizes, j)
        nk = sizes[:, :]
        dik = read_row(i)
        djk = read_row(j)
        formula = ((ni + nk) * dik + (nj + nk) * djk - nk * h) / (ni + nj + nk)
        valid = (act[:, :] > 0.5) & (lane != i) & (lane != j)
        newrow = jnp.where(valid, formula, BIG)

        write_row(i, newrow)
        # dead row j is never read again (rowmin[j] = BIG blocks pops), so
        # only its COLUMN must die. Mosaic can't store to a dynamic-lane
        # column slice; write columns i (fresh) and j (dead) in one masked
        # full-matrix pass
        newcol = jnp.transpose(newrow, (1, 0)).astype(store_dt)  # (n, 1)
        Dv[:, :] = jnp.where(
            col_ids == i, newcol,
            jnp.where(col_ids == j, big, Dv[:, :]),
        )

        act[:, :] = jnp.where(lane == j, 0.0, act[:, :])
        sizes[:, :] = jnp.where(lane == i, ni + nj, sizes[:, :])
        at_t = lane8 == t
        merges_ref[0, :, :] = jnp.where(
            at_t & (subl8 == 0), i,
            jnp.where(at_t & (subl8 == 1), j, merges_ref[0, :, :]),
        )
        heights_ref[0, :, :] = jnp.where(
            at_t & (subl8 == 0), h, heights_ref[0, :, :]
        )

        # --- cache maintenance ------------------------------------------
        # stored row value: low-precision dtypes round on store, so the
        # cache must hold exactly what a later revalidation reads back
        stored = read_row(i)
        better = stored < rowmin[:, :]
        rowmin[:, :] = jnp.where(better, stored, rowmin[:, :])
        rowarg[:, :] = jnp.where(better, i, rowarg[:, :])
        m_i = jnp.min(stored)
        a_i = jnp.argmin(stored[0, :]).astype(jnp.int32)
        sel_i = lane == i
        rowmin[:, :] = jnp.where(sel_i, m_i, rowmin[:, :])
        rowarg[:, :] = jnp.where(sel_i, a_i, rowarg[:, :])
        rowmin[:, :] = jnp.where(lane == j, BIG, rowmin[:, :])
        return 0

    jax.lax.fori_loop(0, n - 1, step, 0)


def _kernel_deferred(F: int):
    """Ward linkage with deferred column writes — per-step O(n + F·n).

    The full-pass kernel (`_kernel`) spends ~4us/step on one masked
    O(n^2) sweep that writes column i and kills column j. Here a merge
    writes only its row; the symmetric column entries in other rows go
    stale and are corrected AT READ TIME from a ring of the last F
    written rows (`Rbuf`), located by a one-hot slot->lane matrix (`OH`)
    — correction = two small MXU contractions. Every F steps one
    (n, F) x (F, n) matmul + masked pass reconciles all dirty columns
    at once (same scheme as ops/linkage.py ward_linkage_deferred, which
    this matches step-for-step). Dead columns never die in storage:
    reads mask them with the `act` vector instead.
    """

    def kernel(D_any, merges_ref, heights_ref,
               Dv, Rbuf, OH, rowmin, rowarg, act, sizes, ver, sstep, sem):
        k = pl.program_id(0)
        n = Dv.shape[0]
        store_dt = Dv.dtype

        dma = pltpu.make_async_copy(D_any.at[k], Dv, sem)
        dma.start()
        dma.wait()

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        big = jnp.asarray(BIG, store_dt)
        Dv[:, :] = jnp.where(row_ids == col_ids, big, Dv[:, :])

        Df = Dv[:, :].astype(jnp.float32)
        rowmin[:, :] = jnp.min(Df, axis=0, keepdims=True)
        rowarg[:, :] = jnp.argmin(Df, axis=0)[None, :].astype(jnp.int32)
        act[:, :] = jnp.ones((1, n), jnp.float32)
        sizes[:, :] = jnp.ones((1, n), jnp.float32)
        ver[:, :] = jnp.full((1, n), -1, jnp.int32)
        sstep[:, :] = jnp.full((1, F), -1, jnp.int32)
        Rbuf[:, :] = jnp.zeros((F, n), jnp.float32)
        OH[:, :] = jnp.zeros((F, n), jnp.float32)
        merges_ref[0, :, :] = jnp.zeros((8, n), jnp.int32)
        heights_ref[0, :, :] = jnp.zeros((8, n), jnp.float32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        laneF = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
        subF = jax.lax.broadcasted_iota(jnp.int32, (F, n), 0)
        subl8 = jax.lax.broadcasted_iota(jnp.int32, (8, n), 0)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, n), 1)

        SUB = 8 if store_dt == jnp.float32 else 16
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, n), 0)
        direct_rows = store_dt == jnp.float32

        def read_row_raw(idx):
            if direct_rows:
                return Dv[pl.ds(idx, 1), :].astype(jnp.float32)
            base = pl.multiple_of((idx // SUB) * SUB, SUB)
            block = Dv[pl.ds(base, SUB), :].astype(jnp.float32)
            r = idx - base
            return jnp.sum(
                jnp.where(sub_iota == r, block, 0.0), axis=0, keepdims=True
            )

        def write_row(idx, row_f32):
            if direct_rows:
                Dv[pl.ds(idx, 1), :] = row_f32.astype(store_dt)
                return
            base = pl.multiple_of((idx // SUB) * SUB, SUB)
            r = idx - base
            block = Dv[pl.ds(base, SUB), :]
            block = jnp.where(sub_iota == r, row_f32.astype(store_dt), block)
            Dv[pl.ds(base, SUB), :] = block

        def lane_of(vec, idx):
            return jnp.max(jnp.where(lane == idx, vec[:, :], -jnp.inf))

        def ilane_of(vec, idx):
            return jnp.max(jnp.where(lane == idx, vec[:, :], -(2**30)))

        def read_row(idx):
            """Fresh row `idx`: stored row + ring corrections + act mask."""
            raw = read_row_raw(idx)
            vk = ilane_of(ver, idx)
            onehot_k = (lane == idx).astype(jnp.float32)        # (1, n)
            # slot values at lane idx: (1, n) x (F, n)^T -> (1, F)
            # HIGHEST precision: these one-hot contractions must pass f32
            # correction values through bit-exactly — the lazy-cache
            # invariant compares them against stored matrix entries
            vals = jax.lax.dot_general(
                onehot_k, Rbuf[:, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            q = (sstep[:, :] > vk).astype(jnp.float32)           # (1, F)
            both = jnp.concatenate([vals * q, q], axis=0)        # (2, F)
            cm = jax.lax.dot_general(
                both, OH[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                    # (2, n)
            row = jnp.where(cm[1:2, :] > 0.5, cm[0:1, :], raw)
            return jnp.where(
                (act[:, :] > 0.5) & (lane != idx), row, BIG
            )

        def step(t, _):
            def reval_cond(done):
                return jnp.logical_not(done)

            def reval_body(done):
                i0 = jnp.argmin(rowmin[0, :]).astype(jnp.int32)
                row = read_row(i0)
                m = jnp.min(row)
                a = jnp.argmin(row[0, :]).astype(jnp.int32)
                exact = m <= lane_of(rowmin, i0)
                sel = lane == i0
                rowmin[:, :] = jnp.where(sel, m, rowmin[:, :])
                rowarg[:, :] = jnp.where(sel, a, rowarg[:, :])
                return exact

            jax.lax.while_loop(reval_cond, reval_body, False)

            i0 = jnp.argmin(rowmin[0, :]).astype(jnp.int32)
            j0 = ilane_of(rowarg, i0).astype(jnp.int32)
            i = jnp.minimum(i0, j0)
            j = jnp.maximum(i0, j0)
            h = lane_of(rowmin, i0)

            ni = lane_of(sizes, i)
            nj = lane_of(sizes, j)
            nk = sizes[:, :]
            dik = read_row(i)
            djk = read_row(j)
            formula = (
                (ni + nk) * dik + (nj + nk) * djk - nk * h
            ) / (ni + nj + nk)
            valid = (act[:, :] > 0.5) & (lane != i) & (lane != j)
            newrow = jnp.where(valid, formula, BIG)
            stored = newrow.astype(store_dt).astype(jnp.float32)

            write_row(i, newrow)
            s = t % F
            # ring bookkeeping: zero lane i's old slot (if any) and claim
            # slot s for it, in one masked pass each
            at_s = subF == s
            OH[:, :] = jnp.where(
                at_s, (lane == i).astype(jnp.float32),
                jnp.where(lane == i, 0.0, OH[:, :]),
            )
            Rbuf[:, :] = jnp.where(at_s, stored, Rbuf[:, :])
            sstep[:, :] = jnp.where(laneF == s, t, sstep[:, :])
            ver[:, :] = jnp.where(lane == i, t, ver[:, :])

            act[:, :] = jnp.where(lane == j, 0.0, act[:, :])
            sizes[:, :] = jnp.where(lane == i, ni + nj, sizes[:, :])
            at_t = lane8 == t
            merges_ref[0, :, :] = jnp.where(
                at_t & (subl8 == 0), i,
                jnp.where(at_t & (subl8 == 1), j, merges_ref[0, :, :]),
            )
            heights_ref[0, :, :] = jnp.where(
                at_t & (subl8 == 0), h, heights_ref[0, :, :]
            )

            # cache maintenance (lower-bound invariant, stored values only)
            better = stored < rowmin[:, :]
            rowmin[:, :] = jnp.where(better, stored, rowmin[:, :])
            rowarg[:, :] = jnp.where(better, i, rowarg[:, :])
            m_i = jnp.min(stored)
            a_i = jnp.argmin(stored[0, :]).astype(jnp.int32)
            sel_i = lane == i
            rowmin[:, :] = jnp.where(sel_i, m_i, rowmin[:, :])
            rowarg[:, :] = jnp.where(sel_i, a_i, rowarg[:, :])
            rowmin[:, :] = jnp.where(lane == j, BIG, rowmin[:, :])

            # epoch flush: reconcile all dirty columns in one matmul +
            # masked pass; entries whose own row is fresher are kept
            @pl.when(s == F - 1)
            def _():
                C = jax.lax.dot_general(
                    Rbuf[:, :], OH[:, :],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                          # (n, n)
                dirty = jnp.sum(OH[:, :], axis=0, keepdims=True) > 0.5
                verL = ver[:, :]                           # (1, n) -> cols
                verR = jnp.transpose(ver[:, :], (1, 0))    # (n, 1) -> rows
                repl = dirty & (verL > verR)
                Dv[:, :] = jnp.where(repl, C.astype(store_dt), Dv[:, :])

            return 0

        jax.lax.fori_loop(0, n - 1, step, 0)

    return kernel


def _invoke(D_st: jax.Array, interpret: bool, variant: str = "deferred"):
    """Raw pallas call: D_st (K, n, n) already in storage dtype ->
    ((K, 8, n) merges plane, (K, 8, n) heights plane)."""
    K, n, _ = D_st.shape
    if variant == "deferred":
        F = min(32, n)
        kernel = _kernel_deferred(F)
        extra = [
            pltpu.VMEM((F, n), jnp.float32),   # Rbuf (fresh-row ring)
            pltpu.VMEM((F, n), jnp.float32),   # OH (slot -> lane one-hot)
        ]
        tail = [
            pltpu.VMEM((1, n), jnp.int32),     # ver (row version stamps)
            pltpu.VMEM((1, F), jnp.int32),     # sstep (slot version stamps)
        ]
    else:
        kernel = _kernel
        extra = []
        tail = []
    return pl.pallas_call(
        kernel,
        grid=(K,),
        out_shape=(
            jax.ShapeDtypeStruct((K, 8, n), jnp.int32),
            jax.ShapeDtypeStruct((K, 8, n), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, 8, n), lambda k: (k, 0, 0)),
            pl.BlockSpec((1, 8, n), lambda k: (k, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n), D_st.dtype),
            *extra,
            pltpu.VMEM((1, n), jnp.float32),   # rowmin
            pltpu.VMEM((1, n), jnp.int32),     # rowarg
            pltpu.VMEM((1, n), jnp.float32),   # active
            pltpu.VMEM((1, n), jnp.float32),   # sizes
            *tail,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(D_st)


def _make_batchable(interpret: bool, variant: str):
    """vmap folds batch axes into the kernel's K grid axis (Mosaic only
    supports trivially-mapped ANY operands, so the default pallas vmap
    batching rule can't apply)."""

    @jax.custom_batching.custom_vmap
    def call(D_st):
        return _invoke(D_st, interpret, variant)

    @call.def_vmap
    def _rule(axis_size, in_batched, D_st):
        B = D_st.shape[0]
        flat = D_st.reshape((-1,) + D_st.shape[2:])
        m, h = call(flat)
        m = m.reshape((B, -1) + m.shape[1:])
        h = h.reshape((B, -1) + h.shape[1:])
        return (m, h), (True, True)

    return call


_CALLS = {}


def _get_call(interpret: bool, variant: str = "deferred"):
    key = (interpret, variant)
    if key not in _CALLS:
        _CALLS[key] = _make_batchable(interpret, variant)
    return _CALLS[key]


def _rnn_tail_kernel(
    D_any, alive_ref, sizes_ref, gidx_ref, lasth_ref,
    mi_ref, mj_ref, hh_ref,
    Dv, act, sz, lh, sem,
):
    """Batched serial Ward tail: ALL batch lanes advance one merge per step.

    The reciprocal-NN ladder's few-pairs-per-round tail costs ~1.7 ms of
    fixed dispatch overhead per XLA round and needs ~37 rounds to drain a
    256-cluster subproblem (measured; scripts/tune_linkage_rnn.py). Here
    the whole tail is ONE kernel: every step finds each lane's global
    minimum pair with masked VPU passes over the (L, Cn, Cn) VMEM-resident
    matrices — no per-lane dynamic slicing, so the L lanes are genuinely
    data-parallel within a step — and runs the full Cn - 1 steps; invalid
    trailing steps (lane already drained) record garbage that the caller
    masks by its known merge count.

    Semantics: the strict serial full-argmin order of `ward_linkage` on
    the compacted subproblem (the while-loop tail merges mutual-NN pairs
    with a cross-pair fix; both orders agree on tie-free data, and this
    one IS the serial association). Heights are clamped to the merging
    clusters' previous recorded heights (`lasth`), matching the ladder's
    discipline for the post-hoc stable height sort.
    """
    L, Cn, _ = Dv.shape
    store_dt = Dv.dtype
    g = pl.program_id(0)

    dma = pltpu.make_async_copy(D_any.at[pl.ds(g * L, L)], Dv, sem)
    dma.start()
    dma.wait()

    act[:, :] = alive_ref[:, :]
    sz[:, :] = sizes_ref[:, :]
    lh[:, :] = lasth_ref[:, :]
    mi_ref[:, :] = jnp.zeros((L, Cn), jnp.int32)
    mj_ref[:, :] = jnp.zeros((L, Cn), jnp.int32)
    hh_ref[:, :] = jnp.zeros((L, Cn), jnp.float32)

    row3 = jax.lax.broadcasted_iota(jnp.int32, (L, Cn, Cn), 1)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (L, Cn, Cn), 2)
    laneC = jax.lax.broadcasted_iota(jnp.int32, (L, Cn), 1)

    def step(t, _):
        Df = Dv[:, :, :].astype(jnp.float32)
        rowmin = jnp.min(Df, axis=2)                        # (L, Cn)
        m = jnp.min(rowmin, axis=1, keepdims=True)          # (L, 1)
        # first-index argmin via equality select (row-major tie order,
        # matching ward_linkage's flat argmin)
        i0 = jnp.min(
            jnp.where(rowmin == m, laneC, Cn), axis=1, keepdims=True
        )                                                   # (L, 1)
        rowi = jnp.sum(
            jnp.where(row3 == i0[:, :, None], Df, 0.0), axis=1
        )                                                   # (L, Cn)
        j0 = jnp.min(
            jnp.where((rowi == m) & (laneC != i0), laneC, Cn),
            axis=1, keepdims=True,
        )
        i = jnp.minimum(i0, j0)
        j = jnp.maximum(i0, j0)
        # guard degenerate lanes (all-BIG matrix: i0 == j0 == Cn)
        i = jnp.minimum(i, Cn - 1)
        j = jnp.minimum(j, Cn - 1)
        h = m

        ni = jnp.sum(jnp.where(laneC == i, sz[:, :], 0.0), axis=1,
                     keepdims=True)
        nj = jnp.sum(jnp.where(laneC == j, sz[:, :], 0.0), axis=1,
                     keepdims=True)
        dik = jnp.sum(jnp.where(row3 == i[:, :, None], Df, 0.0), axis=1)
        djk = jnp.sum(jnp.where(row3 == j[:, :, None], Df, 0.0), axis=1)
        nk = sz[:, :]
        formula = ((ni + nk) * dik + (nj + nk) * djk - nk * h) / (
            ni + nj + nk
        )
        valid = (act[:, :] > 0.5) & (laneC != i) & (laneC != j)
        # row/col writes in f32 (Mosaic: minor-dim insertion needs 32-bit
        # types); the bf16->f32->bf16 round-trip of untouched entries is
        # exact, and newrow store-rounds exactly as a direct bf16 write
        newrow = jnp.where(valid, formula, BIG)

        ib = i[:, :, None]
        jb = j[:, :, None]
        Dnew = jnp.where(
            row3 == ib, newrow[:, None, :],
            jnp.where(col3 == ib, newrow[:, :, None], Df),
        )
        Dv[:, :, :] = jnp.where(
            (row3 == jb) | (col3 == jb), BIG, Dnew
        ).astype(store_dt)

        act[:, :] = jnp.where(laneC == j, 0.0, act[:, :])
        sz[:, :] = jnp.where(laneC == i, ni + nj, sz[:, :])
        lhi = jnp.sum(jnp.where(laneC == i, lh[:, :], 0.0), axis=1,
                      keepdims=True)
        lhj = jnp.sum(jnp.where(laneC == j, lh[:, :], 0.0), axis=1,
                      keepdims=True)
        hrec = jnp.maximum(h, jnp.maximum(lhi, lhj))
        lh[:, :] = jnp.where(laneC == i, hrec, lh[:, :])

        gi = jnp.sum(jnp.where(laneC == i, gidx_ref[:, :], 0), axis=1,
                     keepdims=True)
        gj = jnp.sum(jnp.where(laneC == j, gidx_ref[:, :], 0), axis=1,
                     keepdims=True)
        att = laneC == t
        mi_ref[:, :] = jnp.where(att, gi, mi_ref[:, :])
        mj_ref[:, :] = jnp.where(att, gj, mj_ref[:, :])
        hh_ref[:, :] = jnp.where(att, hrec, hh_ref[:, :])
        return 0

    jax.lax.fori_loop(0, Cn - 1, step, 0)


# lanes per grid step: bounds VMEM at ~LCHUNK * Cn^2 * (dtype + f32
# intermediates). The budget is LC * Cn^2 <= 16 * 256^2 elements (~8 MB
# f32 working set at the default Cn=256), scaled DOWN for larger tails —
# ward_linkage_rnn(compact_n=512) is a public knob, and an overflowing
# scratch HANGS the Mosaic compile on this toolchain rather than erroring.
_TAIL_BUDGET = 16 * 256 * 256


def _tail_lchunk(Cn: int) -> int:
    return max(1, _TAIL_BUDGET // (Cn * Cn))


def _rnn_tail_invoke(D_st, alive, sizes, gidx, lasth, interpret: bool):
    L, Cn, _ = D_st.shape
    LC = min(_tail_lchunk(Cn), L)
    if L % LC:  # pad to a whole number of chunks (dead lanes: alive=0)
        Lp = ((L + LC - 1) // LC) * LC
        D_st = jnp.concatenate(
            [D_st, jnp.zeros((Lp - L, Cn, Cn), D_st.dtype)]
        )
        alive = jnp.concatenate([alive, jnp.zeros((Lp - L, Cn), alive.dtype)])
        sizes = jnp.concatenate([sizes, jnp.ones((Lp - L, Cn), sizes.dtype)])
        gidx = jnp.concatenate([gidx, jnp.zeros((Lp - L, Cn), gidx.dtype)])
        lasth = jnp.concatenate([lasth, jnp.zeros((Lp - L, Cn), lasth.dtype)])
    else:
        Lp = L
    mi, mj, hh = pl.pallas_call(
        _rnn_tail_kernel,
        grid=(Lp // LC,),
        out_shape=(
            jax.ShapeDtypeStruct((Lp, Cn), jnp.int32),
            jax.ShapeDtypeStruct((Lp, Cn), jnp.int32),
            jax.ShapeDtypeStruct((Lp, Cn), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((LC, Cn), lambda g: (g, 0)),
            pl.BlockSpec((LC, Cn), lambda g: (g, 0)),
            pl.BlockSpec((LC, Cn), lambda g: (g, 0)),
            pl.BlockSpec((LC, Cn), lambda g: (g, 0)),
        ],
        out_specs=(
            pl.BlockSpec((LC, Cn), lambda g: (g, 0)),
            pl.BlockSpec((LC, Cn), lambda g: (g, 0)),
            pl.BlockSpec((LC, Cn), lambda g: (g, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((LC, Cn, Cn), D_st.dtype),
            pltpu.VMEM((LC, Cn), jnp.float32),   # act
            pltpu.VMEM((LC, Cn), jnp.float32),   # sizes
            pltpu.VMEM((LC, Cn), jnp.float32),   # lasth
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(D_st, alive, sizes, gidx, lasth)
    return mi[:L], mj[:L], hh[:L]


_TAIL_CALLS = {}


def _get_tail_call(interpret: bool):
    """custom_vmap wrapper: batch axes fold into the kernel's lane axis L."""
    if interpret not in _TAIL_CALLS:

        @jax.custom_batching.custom_vmap
        def call(D_st, alive, sizes, gidx, lasth):
            return _rnn_tail_invoke(
                D_st, alive, sizes, gidx, lasth, interpret
            )

        @call.def_vmap
        def _rule(axis_size, in_batched, D_st, alive, sizes, gidx, lasth):
            args = []
            for a, b in zip((D_st, alive, sizes, gidx, lasth), in_batched):
                if not b:
                    a = jnp.broadcast_to(a, (axis_size,) + a.shape)
                args.append(a.reshape((-1,) + a.shape[2:]))
            B = axis_size
            mi, mj, hh = call(*args)
            out = tuple(
                o.reshape((B, -1) + o.shape[1:]) for o in (mi, mj, hh)
            )
            return out, (True, True, True)

        _TAIL_CALLS[interpret] = call
    return _TAIL_CALLS[interpret]


def rnn_tail_pallas(
    D_st: jax.Array,     # (Cn, Cn) compacted matrix, storage dtype
    alive: jax.Array,    # (Cn,) f32 1/0
    sizes: jax.Array,    # (Cn,) f32
    gidx: jax.Array,     # (Cn,) int32 global cluster index per slot
    lasth: jax.Array,    # (Cn,) f32 running recorded height per cluster
    interpret: bool = False,
):
    """Serial-drain the ladder's compacted subproblem in one kernel.

    Returns (mi, mj, hh): (Cn,) lane vectors whose entry t is the t-th
    serial merge (global indices, clamped height); entries at
    t >= n_alive - 1 are garbage the caller must mask.
    """
    mi, mj, hh = _get_tail_call(interpret)(
        D_st[None],
        alive.astype(jnp.float32)[None],
        sizes.astype(jnp.float32)[None],
        gidx.astype(jnp.int32)[None],
        lasth.astype(jnp.float32)[None],
    )
    return mi[0], mj[0], hh[0]


def _round_scatter_kernel(
    D_blk, NR_full, NR_strip, OHa_full, OHa_strip,
    cola_f, dying_f, cola_s, dying_s,
    Dout, rmin_out, rarg_out,
):
    """One reciprocal-NN round's row/column scatter + next-round row
    minima, fused into a single streaming pass over the matrix.

    The XLA formulation of a round (ops/linkage.py ward_linkage_rnn)
    costs ~5 full-matrix HBM passes: the rowsfull/colsfull one-hot
    matmuls each materialize an (n, n) product, a where-chain reads
    D + both products and rewrites D, and the next round re-reads D for
    its row minima. Here one grid step processes one (R, n) row strip:
    the merged pairs' fresh rows and columns land via two symmetric
    window contractions against the precomputed slot->lane one-hot OHa
    (leadrows = OHa_win^T-contract NR; colvals = NR_win^T-contract OHa
    — no transposes, no in-kernel one-hot construction), dying
    rows/columns die in the same register pass, the strip is written
    back once, and its row min/argmin (over the STORE-ROUNDED values)
    are emitted as the next round's cache. Per round: 1 read + 1 write
    of D instead of ~5.

    Exactness: the one-hot contractions carry a single nonzero per
    output element, so any matmul precision reproduces the stored
    newrows values bit-exactly — the round is bit-identical to the XLA
    scatter (test-pinned, tests/test_linkage.py).
    """
    R, n = D_blk.shape[1], D_blk.shape[2]
    st = D_blk.dtype

    S = D_blk[0]                                    # (R, n) st
    NR = NR_full[0]                                 # (P, n) st
    NRw = NR_strip[0, 0]                            # (P, R) st
    OHa = OHa_full[0]                               # (P, n) st
    OHw = OHa_strip[0, 0]                           # (P, R) st
    colaF = cola_f[0]                               # (1, n) f32
    dyingF = dying_f[0]
    leadR = jnp.transpose(cola_s[0, 0], (1, 0))     # (R, 1)
    dyingR = jnp.transpose(dying_s[0, 0], (1, 0))

    # f32 operands need HIGHEST (default would round them to bf16);
    # bf16 operands are exact at native precision (single nonzero per
    # output, f32 accumulate) and Mosaic REJECTS fp32 contract_precision
    # on a bf16 lhs ("Bad lhs type")
    hi = jax.lax.Precision.HIGHEST if st == jnp.float32 else None

    # lead rows: row r takes newrows[slot(r), :]
    leadrows = jax.lax.dot_general(
        OHw, NR, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )                                               # (R, n) f32, exact
    # lead columns: entry (r, c) for lead column c is newrows[slot(c), r]
    colvals = jax.lax.dot_general(
        NRw, OHa, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi,
    )                                               # (R, n) f32, exact

    Sf = S.astype(jnp.float32)
    out = jnp.where(
        leadR > 0.5, leadrows,
        jnp.where(colaF > 0.5, colvals, Sf),
    )
    out = jnp.where((dyingR > 0.5) | (dyingF > 0.5), BIG, out)
    out_st = out.astype(st)
    Dout[0] = out_st

    # next-round row cache over the STORED values (first-index argmin,
    # the ladder's deterministic tie rule — ops/linkage.first_argmin)
    of = out_st.astype(jnp.float32)
    mn = jnp.min(of, axis=1, keepdims=True)         # (R, 1)
    colN = jax.lax.broadcasted_iota(jnp.int32, (R, n), 1)
    am = jnp.min(
        jnp.where(of == mn, colN, n), axis=1, keepdims=True
    )                                               # (R, 1)
    rmin_out[0, 0] = jnp.broadcast_to(jnp.transpose(mn, (1, 0)), (8, R))
    rarg_out[0, 0] = jnp.broadcast_to(jnp.transpose(am, (1, 0)), (8, R))


def _round_scatter_invoke(D, NR, OHa, cola, dying, interpret):
    L, n, _ = D.shape
    P = NR.shape[1]
    R = 512 if n % 512 == 0 else (256 if n % 256 == 0 else 128)
    Sg = n // R
    grid = (L, Sg)
    # ALIASING DISCIPLINE (hard-won; the failure was context-dependent):
    # XLA:TPU's custom-call CanShareBuffer hook may silently alias an
    # output with a same-shaped operand. The kernel WRITES its row-cache
    # outputs at every strip while LATER strips still RE-READ the mask
    # operand blocks from HBM — if an output shares a mask operand's
    # buffer, those re-reads see clobbered data (observed: ~174k stale
    # matrix cells, deterministic per compile, appearing only in some
    # surrounding programs). Therefore every output shape+dtype here is
    # DISTINCT from every operand's (the row-cache planes carry 8
    # broadcast sublanes for that reason alone; level_fused requires
    # P >= 16 so (.., 8, R) never collides with a (.., P, R) window).
    # D is NOT aliased either: an explicit {0: 0} alias is correct
    # (strip s's write never overlaps strip s+1's prefetch) but measured
    # +2.4 ms/round — Mosaic serializes the in-place pipeline.
    vec = lambda a: a.reshape(L, 1, n)
    strips = lambda a: a.reshape(L, Sg, 1, R)
    # the lane windows need strip-major layout — real (small) transposes
    NR_str = NR.reshape(L, P, Sg, R).swapaxes(1, 2)      # (L, Sg, P, R)
    OHa_str = OHa.reshape(L, P, Sg, R).swapaxes(1, 2)    # (L, Sg, P, R)
    Dn, rm8, ra8 = pl.pallas_call(
        _round_scatter_kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((L, n, n), D.dtype),
            jax.ShapeDtypeStruct((L, Sg, 8, R), jnp.float32),
            jax.ShapeDtypeStruct((L, Sg, 8, R), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, R, n), lambda l, s: (l, s, 0)),     # D strip
            pl.BlockSpec((1, P, n), lambda l, s: (l, 0, 0)),     # newrows
            pl.BlockSpec((1, 1, P, R), lambda l, s: (l, s, 0, 0)),  # NR win
            pl.BlockSpec((1, P, n), lambda l, s: (l, 0, 0)),     # OHa
            pl.BlockSpec((1, 1, P, R), lambda l, s: (l, s, 0, 0)),  # OHa win
            pl.BlockSpec((1, 1, n), lambda l, s: (l, 0, 0)),     # cola full
            pl.BlockSpec((1, 1, n), lambda l, s: (l, 0, 0)),     # dying full
            pl.BlockSpec((1, 1, 1, R), lambda l, s: (l, s, 0, 0)),  # cola strip
            pl.BlockSpec((1, 1, 1, R), lambda l, s: (l, s, 0, 0)),  # dying strip
        ],
        out_specs=(
            pl.BlockSpec((1, R, n), lambda l, s: (l, s, 0)),
            pl.BlockSpec((1, 1, 8, R), lambda l, s: (l, s, 0, 0)),
            pl.BlockSpec((1, 1, 8, R), lambda l, s: (l, s, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(D, NR, NR_str, OHa, OHa_str, vec(cola), vec(dying),
      strips(cola), strips(dying))
    return Dn, rm8[:, :, 0, :], ra8[:, :, 0, :]


def _round_scatter_flat(D, NR, OHa, cola, dying, interpret):
    Dn, rm, ra = _round_scatter_invoke(D, NR, OHa, cola, dying, interpret)
    L, n, _ = D.shape
    return Dn, rm.reshape(L, n), ra.reshape(L, n)


_ROUND_CALLS = {}


def _get_round_call(interpret: bool):
    """custom_vmap wrapper: batch axes fold into the kernel's lane axis."""
    if interpret not in _ROUND_CALLS:

        @jax.custom_batching.custom_vmap
        def call(D, NR, OHa, cola, dying):
            return _round_scatter_flat(D, NR, OHa, cola, dying, interpret)

        @call.def_vmap
        def _rule(axis_size, in_batched, D, NR, OHa, cola, dying):
            args = []
            for a, b in zip((D, NR, OHa, cola, dying), in_batched):
                if not b:
                    a = jnp.broadcast_to(a, (axis_size,) + a.shape)
                args.append(a.reshape((-1,) + a.shape[2:]))
            B = axis_size
            Dn, rm, ra = call(*args)
            out = tuple(
                o.reshape((B, -1) + o.shape[1:]) for o in (Dn, rm, ra)
            )
            return out, (True, True, True)

        _ROUND_CALLS[interpret] = call
    return _ROUND_CALLS[interpret]


def rnn_round_scatter(
    D_st: jax.Array,      # (n, n) storage dtype, pre-round matrix
    newrows_st: jax.Array,  # (P, n) storage dtype, masked fresh pair rows
    OHa_st: jax.Array,    # (P, n) storage dtype slot->lane one-hot
    cola: jax.Array,      # (n,) f32 1.0 at surviving pair-lead lanes
    dying: jax.Array,     # (n,) f32 1.0 at merged-away lanes
    interpret: bool = False,
):
    """Fused round scatter for the reciprocal-NN ladder.

    Returns (D_new (n, n) st, rowmin (n,) f32, rowarg (n,) int32):
    exactly the matrix the XLA round's rowsfull/colsfull/where sequence
    produces, plus the row min/argmin the NEXT round would compute from
    it. Called under vmap (members x folds); the custom_vmap rule folds
    batches into the kernel's lane grid axis.
    """
    Dn, rm, ra = _get_round_call(interpret)(
        D_st[None], newrows_st[None], OHa_st[None],
        cola.astype(jnp.float32)[None],
        dying.astype(jnp.float32)[None],
    )
    return Dn[0], rm[0], ra[0]


def _cutree_kernel(minN: int, ncand: int, ncand_pad: int):
    def kernel(nr_ref, m_ref, snaps_ref):
        n = m_ref.shape[2]
        nr = nr_ref[pl.program_id(0)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (ncand_pad, n), 0)
        snaps_ref[0, :, :] = jnp.zeros((ncand_pad, n), jnp.int32)
        mi = m_ref[0, 0:1, :]
        mj = m_ref[0, 1:2, :]

        def step(t, labels):
            i = jnp.max(jnp.where(lane == t, mi, -1))
            j = jnp.max(jnp.where(lane == t, mj, -1))
            labels = jnp.where(labels == j, i, labels)
            ci = nr - t - 1 - minN

            @pl.when((ci >= 0) & (ci < ncand))
            def _():
                snaps_ref[0, :, :] = jnp.where(
                    sub == ci, labels, snaps_ref[0, :, :]
                )

            return labels

        jax.lax.fori_loop(0, n - 1, step, lane)

    return kernel


def _cutree_invoke(m: jax.Array, nr: jax.Array, minN, ncand, ncand_pad,
                   interpret):
    G, _, n = m.shape
    return pl.pallas_call(
        _cutree_kernel(minN, ncand, ncand_pad),
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((G, ncand_pad, n), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, n), lambda k: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ncand_pad, n), lambda k: (k, 0, 0)),
        interpret=interpret,
    )(nr, m)


_CUTREE_CALLS = {}


def _get_cutree_call(minN: int, ncand: int, ncand_pad: int, interpret: bool):
    key = (minN, ncand, ncand_pad, interpret)
    if key not in _CUTREE_CALLS:

        @jax.custom_batching.custom_vmap
        def call(m, nr):
            return _cutree_invoke(m, nr, minN, ncand, ncand_pad, interpret)

        @call.def_vmap
        def _rule(axis_size, in_batched, m, nr):
            if not in_batched[0]:
                m = jnp.broadcast_to(m, (axis_size,) + m.shape)
            if not in_batched[1]:
                nr = jnp.broadcast_to(nr, (axis_size,) + nr.shape)
            B = m.shape[0]
            snaps = call(
                m.reshape((-1,) + m.shape[2:]), nr.reshape(-1)
            )
            return snaps.reshape((B, -1) + snaps.shape[1:]), True

        _CUTREE_CALLS[key] = call
    return _CUTREE_CALLS[key]


@functools.partial(
    jax.jit, static_argnames=("minN", "ncand", "nc_pad", "interpret")
)
def cutree_multi_pallas(
    merges: jax.Array,       # (n_pad - 1, 2) int32 merge sequence
    n_real: jax.Array,       # () traced
    real_mask: jax.Array,    # (n_pad,)
    maxN: jax.Array,         # () traced
    *,
    minN: int,
    ncand: int,
    nc_pad: int,
    interpret: bool = False,
):
    """All cuts k = minN .. minN+ncand-1 in one Pallas kernel.

    Same contract as `ops.linkage.cutree_multi` (the reference recomputes
    `cutree(h, k)` per candidate, R/get_opt_hclust.R:113,132), but the
    merge replay runs on-chip: the XLA scan pays per-step loop overhead
    ~50x the O(n) work; here each step is two lane extractions and one
    masked update over VMEM.
    """
    from sharp_tpu.ops.linkage import CutForest, densify_labels

    npad = real_mask.shape[0]
    ncand_pad = ((ncand + 7) // 8) * 8
    # merges (n-1, 2) -> lane-major (2, n) planes, one lane per step
    m = jnp.zeros((2, npad), jnp.int32)
    m = m.at[:, : npad - 1].set(merges.T)
    snaps = _get_cutree_call(minN, ncand, ncand_pad, interpret)(
        m[None], jnp.asarray(n_real, jnp.int32)[None]
    )[0, :ncand]

    dense, k = jax.vmap(lambda l: densify_labels(l, real_mask, nc_pad))(snaps)
    ks = minN + jnp.arange(ncand)
    # nc_pad - 1 caps representable cuts (matches ops.linkage.cutree_multi)
    valid = (ks <= n_real - 1) & (ks <= maxN) & (ks <= nc_pad - 1)
    return CutForest(labels=dense, k=k, valid=valid)


@functools.partial(
    jax.jit, static_argnames=("store_dtype", "interpret", "variant")
)
def ward_linkage_pallas(
    D: jax.Array, *, store_dtype=jnp.float32, interpret: bool = False,
    variant: str = "deferred",
) -> LinkageResult:
    """Batched Ward linkage in one Pallas kernel.

    D: (K, n, n) float32 padded distance matrices (or (n, n), promoted).
    variant: "deferred" (O(n + F·n) per merge, the production path) or
    "full" (one masked O(n^2) sweep per merge — the simpler reference
    kernel both are tested bit-identical to in f32).
    """
    squeeze = D.ndim == 2
    if squeeze:
        D = D[None]
    n = D.shape[-1]

    # outputs packed into (8, n)-tiled planes: rows 0/1 of `merges` hold
    # the merge pair, row 0 of `heights` the merge distance, at lane t
    merges, heights = _get_call(interpret, variant)(
        D.astype(jnp.dtype(store_dtype))
    )

    merges_out = jnp.stack(
        [merges[..., 0, : n - 1], merges[..., 1, : n - 1]], axis=-1
    )
    heights_out = heights[..., 0, : n - 1]
    if squeeze:
        return LinkageResult(merges=merges_out[0], heights=heights_out[0])
    return LinkageResult(merges=merges_out, heights=heights_out)
