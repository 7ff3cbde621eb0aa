"""Pallas TPU kernels: batch-in-lanes Cholesky and Gaussian log-density.

The GPRF hot loop factorizes hundreds of small (m <= ~256) SPD matrices per
step.  XLA's batched Cholesky processes the *matrix* dimensions on the
vector unit and leaves the batch to the outer loop, so the m sequential
panel steps dominate wall time (measured ~0.1% of peak on v5e for
[180, 272, 272]).  These kernels transpose the problem: matrices are laid
out ``[m, m, T]`` with the *batch* in the 128-wide lane dimension, so every
sequential step of the factorization is a full-width VPU operation over T
matrices at once — the recurrence is sequential in m but embarrassingly
parallel in the batch, which is exactly the hardware's vector axis.

Structure: inputs stay in HBM (memory space ANY); the kernel loops over
lane-tiles with explicit async DMA into one VMEM scratch (lane tiles must
be 128 wide on TPU, and double-buffered pipeline blocks at [m, m, 128]
would blow the ~16 MB VMEM budget for m ~ 136).

Provided:
  * :func:`batched_cholesky_pallas` — L for a batch of SPD matrices.
  * :func:`batched_mvn_ll_pallas`   — masked Gaussian log-density
    ``ll_b = -1/2 sum(Y K^-1 Y) - dy/2 logdet K - dy n_b/2 log 2pi`` per
    block, with a custom VJP (the analytic *symmetrized* cotangent
    ``0.5 (alpha alpha^T - dy K^-1)``; K is always a symmetric function of
    the inputs, so end-to-end gradients match autodiff exactly).

Correctness is pinned against ``jnp.linalg.cholesky`` / the masked-linalg
reference in interpret mode (CPU) and on device.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# measurement toggle: compute the W = L^-1 needed inside the custom VJPs
# with the recursive-doubling XLA formulation (O(log m) sequential depth,
# MXU matmuls) instead of the lanes substitution kernel.  Read once at
# import; A/B via bench.py in fresh processes.
_TRI_DOUBLING = os.environ.get("GPRF_TRI_DOUBLING", "0") == "1"

# matmul precision of the custom-VJP pullback einsums (measurement knob,
# read once at import — A/B in fresh processes).  These rules trace
# outside the caller's precision context, and bf16-DEFAULT products here
# corrupt gradients (24% deviation measured) — never drop below "high".
# Default "high" (3 bf16 passes per f32 matmul): it changes only
# *gradient* roundoff, not the objective — distinct from the vetoed
# GPRF_SCHUR_PRECISION=high, which coarsens the forward Schur algebra
# too — and the round-3 A/B (docs/RESULTS.md) measured flagship
# 4.27 -> 3.48 ms/eval with every headline QoR beating the reference
# (flagship mad 0.00332 vs HIGHEST's 0.00325, ref 0.00363; seismic
# 14.45/10.34 km vs 14.71/10.61; 80k 0.00073 unchanged).  Set
# GPRF_VJP_PRECISION=highest to reproduce the old trajectories.
_VJP_PRECISION = os.environ.get("GPRF_VJP_PRECISION", "high")


def _tri_inv_for_vjp(L, interpret: bool):
    if _TRI_DOUBLING:
        from gprf_tpu.linalg.doubling import batched_tri_inv_doubling

        return batched_tri_inv_doubling(L)
    # routes through the block-2x2 split composition (lanes leaves + MXU
    # coupling, gprf_tpu.ops.split_mvn); identical to the plain lanes
    # kernel at m <= the leaf cap, and A/B-able via GPRF_SPLIT_LEAF
    from gprf_tpu.ops.split_mvn import tri_inv_split

    return tri_inv_split(L, interpret)


def _vmappable(core):
    """Make a pallas-invoking core vmap-compatible by batch folding.

    pallas_call's default batching rule adds a grid dimension, which the
    TPU lowering rejects for ANY-memory-space kernels (manual DMA).  Every
    kernel here is batch-oblivious in its leading lane-tile dim, so an
    outer vmap (e.g. the multi-start optimizer, ``optim.device_lbfgs.
    make_multistart_runner``) can simply fold its batch axis into dim 0,
    run the kernel over R*nb tiles, and unfold.

    Applied at two levels: around each raw tiled core (safety net), and —
    the level that matters for performance — around each whole padded
    pipeline (pad + tile + kernel + untile), so an R-replica vmap folds
    [R, B, ...] -> [R*B, ...] BEFORE lane-tiling and the replicas pack
    into shared 128-wide tiles instead of each padding its part-filled
    last tile up to a full one (R=4 at the flagship edge batch: 6 tiles
    instead of 8).  The rule recurses through the wrapped function so
    stacked vmap levels fold repeatedly."""
    from jax import custom_batching

    cv = custom_batching.custom_vmap(core)

    @cv.def_vmap
    def _rule(axis_size, in_batched, *args):
        folded = []
        for a, b in zip(args, in_batched):
            if not b:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            folded.append(a.reshape((-1,) + a.shape[2:]))
        # recurse through the wrapped cv (not the raw core) so a second
        # stacked vmap level folds again instead of hitting pallas_call's
        # default batching rule, which the TPU lowering rejects for
        # ANY-memory-space kernels
        out = cv(*folded)

        def unfold(o):
            return o.reshape((axis_size, -1) + o.shape[1:])

        if isinstance(out, tuple):
            return tuple(unfold(o) for o in out), tuple(True for _ in out)
        return unfold(out), True

    return cv

_LOG_2PI = math.log(2.0 * math.pi)
_LANES = 128

# largest m whose [m, m, 128] f32 scratch (+ the MVN kernel's residual
# buffer) fits comfortably in VMEM; larger matrices fall back to XLA.
# Half-width (T=64) lane tiles would extend the cap to m ~ 224 (e.g. the
# seismic m=192 partition) but Mosaic rejects them: HBM<->VMEM DMA slices
# must be 128-aligned in the minor (lane) dimension ("Slice shape along
# dimension 3 must be aligned to tiling (128)", measured on v5e) — the
# tile width is a hardware tiling constant, not a free parameter.
MAX_M_CHOL = 168
MAX_M_MVN = 144


def _tile_for(m: int, for_mvn: bool = False) -> int | None:
    """Lane-tile width for width m, or None when VMEM can't fit it."""
    if m <= (MAX_M_MVN if for_mvn else MAX_M_CHOL):
        return _LANES
    return None


def pallas_supported(m: int, for_mvn: bool = False) -> bool:
    return _tile_for(m, for_mvn) is not None


def _chol_kernel(k_hbm, lt_hbm):
    nb, m, _, T = k_hbm.shape

    def body(scratch, sem_in, sem_out):
        def tile(i, _):
            cp_in = pltpu.make_async_copy(k_hbm.at[i], scratch, sem_in)
            cp_in.start()
            cp_in.wait()

            def step(k, _):
                akk = scratch[pl.ds(k, 1), pl.ds(k, 1), :]  # [1, 1, T]
                dk_inv = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
                row_k = scratch[pl.ds(k, 1), :, :]  # [1, m, T]
                jidx = jax.lax.broadcasted_iota(jnp.int32, (1, m, T), 1)
                col = jnp.where(jidx >= k, row_k * dk_inv, 0.0)
                scratch[pl.ds(k, 1), :, :] = col  # L^T row k
                colu = jnp.where(jidx > k, col, 0.0)
                iidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1, T), 0)
                lcol = jnp.where(iidx > k, jnp.transpose(colu, (1, 0, 2)), 0.0)
                # trailing update restricted to rows > k (rows <= k hold L^T)
                scratch[:, :, :] = scratch[:, :, :] - lcol * colu
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(m), step, jnp.int32(0))
            cp_out = pltpu.make_async_copy(scratch, lt_hbm.at[i], sem_out)
            cp_out.start()
            cp_out.wait()
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), tile, jnp.int32(0))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((m, m, T), k_hbm.dtype),
        sem_in=pltpu.SemaphoreType.DMA,
        sem_out=pltpu.SemaphoreType.DMA,
    )


@functools.lru_cache(maxsize=None)
def _chol_pipeline(interpret: bool):
    def impl(K):
        B, m, _ = K.shape
        T = _tile_for(m)
        if T is None:
            return jnp.linalg.cholesky(K)  # VMEM-bound: fall back to XLA
        nb = (B + T - 1) // T
        padB = nb * T
        Kp = jnp.concatenate(
            [K, jnp.broadcast_to(jnp.eye(m, dtype=K.dtype), (padB - B, m, m))],
            axis=0,
        )
        Kl = jnp.transpose(Kp.reshape(nb, T, m, m), (0, 2, 3, 1))

        lt = _chol_core(interpret)(Kl)
        Lt = jnp.transpose(lt, (0, 3, 1, 2)).reshape(padB, m, m)[:B]
        return jnp.transpose(Lt, (0, 2, 1))

    return _vmappable(impl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def batched_cholesky_pallas(K, interpret: bool = False):
    """Lower Cholesky factors of a batch of SPD matrices [B, m, m].

    Returns L with L @ L.T == K (zero above the diagonal).  The batch is
    tiled into the 128-wide lane dimension; B pads up to the tile (outer
    vmap axes fold into B before padding — see :func:`_vmappable`).
    """
    return _chol_pipeline(interpret)(K)


@functools.lru_cache(maxsize=None)
def _chol_core(interpret: bool):
    def core(Kl):
        nb, m, _, T = Kl.shape
        return pl.pallas_call(
            _chol_kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nb, m, m, T), Kl.dtype),
            interpret=interpret,
        )(Kl)

    return _vmappable(core)


def _chol_fwd(K, interpret):
    L = batched_cholesky_pallas(K, interpret)
    return L, L


def _chol_bwd(interpret, L, dL):
    """Standard Cholesky pullback (the same symmetric-output formula XLA
    uses): with P = phi(L^T dL) (lower triangle, halved diagonal),
    dK = L^-T (P + P^T)/2 L^-1 symmetrized.

    The two triangular solves are evaluated as W^T sym W with W = L^-1 from
    the lanes triangular-inverse kernel — XLA's batched triangular_solve
    serializes over the batch, the matmul rides the MXU."""
    m = L.shape[-1]
    with jax.default_matmul_precision(_VJP_PRECISION):
        P = jnp.einsum("bki,bkj->bij", L, dL)
        tril = jnp.tril(jnp.ones((m, m), dtype=L.dtype))
        phi = P * tril - 0.5 * jnp.eye(m, dtype=L.dtype) * P
        sym = 0.5 * (phi + jnp.swapaxes(phi, -1, -2))
        W = _tri_inv_for_vjp(L, interpret)
        dK = jnp.einsum("bki,bkl,blj->bij", W, sym, W)  # W^T sym W
        dK = 0.5 * (dK + jnp.swapaxes(dK, -1, -2))
    return (dK,)


batched_cholesky_pallas.defvjp(_chol_fwd, _chol_bwd)


def _tri_inv_kernel(l_hbm, w_hbm, *, cols: int):
    """Batch-in-lanes lower-triangular inverse W = L^-1, column-paneled.

    L stays resident in one [m, m, T] scratch; W is produced in [m, cols, T]
    panels (output laid out panel-major [nb, ncp, m, cols, T] so each panel
    is one contiguous DMA).  Panel j solves L W_panel = E_panel by forward
    substitution starting at row j*cols — all earlier rows of the panel are
    identically zero (W is lower triangular), which halves the VPU work and
    keeps scratch VMEM at L + one panel (the full [m, m, T] W would not fit
    alongside L at m ~ 136)."""
    nb, ncp, m, _, T = w_hbm.shape

    def body(l_scr, w_scr, sem_in, sem_out):
        def tile(i, _):
            cp_in = pltpu.make_async_copy(l_hbm.at[i], l_scr, sem_in)
            cp_in.start()
            cp_in.wait()

            def panel(j, _):
                j0 = j * cols
                w_scr[:, :, :] = jnp.zeros((m, cols, T), dtype=w_scr.dtype)

                def step(k, _):
                    # L is lower-triangular and w rows >= k are still zero,
                    # so the unmasked contraction sums exactly j0 <= l < k.
                    # All scalar literals pinned to the ref dtype: under
                    # jax_enable_x64 a weak Python float traces as an f64
                    # constant whose f32 conversion Mosaic cannot legalize.
                    dt = w_scr.dtype
                    one = jnp.asarray(1.0, dt)
                    tiny = jnp.asarray(1e-30, dt)
                    lrow = l_scr[pl.ds(k, 1), :, :]  # [1, m, T] = L[k, :]
                    lkk = l_scr[pl.ds(k, 1), pl.ds(k, 1), :]  # [1, 1, T]
                    dk_inv = one / jnp.where(jnp.abs(lkk) > tiny, lkk, tiny)
                    acc = jnp.sum(
                        jnp.transpose(lrow, (1, 0, 2)) * w_scr[:, :, :],
                        axis=0,
                        keepdims=True,
                    )  # [1, cols, T]
                    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, cols, T), 1)
                    ek = (cidx + j0 == k).astype(dt)
                    w_scr[pl.ds(k, 1), :, :] = (ek - acc) * dk_inv
                    return jnp.int32(0)

                jax.lax.fori_loop(j0, jnp.int32(m), step, jnp.int32(0))
                cp_out = pltpu.make_async_copy(w_scr, w_hbm.at[i, j], sem_out)
                cp_out.start()
                cp_out.wait()
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(ncp), panel, jnp.int32(0))
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), tile, jnp.int32(0))

    pl.run_scoped(
        body,
        l_scr=pltpu.VMEM((m, m, T), l_hbm.dtype),
        w_scr=pltpu.VMEM((m, cols, T), l_hbm.dtype),
        sem_in=pltpu.SemaphoreType.DMA,
        sem_out=pltpu.SemaphoreType.DMA,
    )


def _tri_inv_cols(m: int, T: int = _LANES,
                  budget_bytes: int = 14 * 1024 * 1024) -> int:
    """Largest panel width (multiple of 8, <= 64) whose L + panel scratch
    fits the VMEM budget at lane-tile width T.  The panel is charged
    twice: the substitution step's broadcast-multiply materializes one
    [m, cols, T] temporary alongside the panel itself (observed in
    Mosaic's scoped-vmem accounting)."""
    l_bytes = m * m * T * 4
    c = (budget_bytes - l_bytes) // (2 * m * T * 4)
    return max(8, min(64, int(c) // 8 * 8))


@functools.lru_cache(maxsize=None)
def _tri_inv_pipeline(interpret: bool):
    def impl(L):
        B, m, _ = L.shape
        T = _tile_for(m)
        if T is None:
            eye = jnp.broadcast_to(jnp.eye(m, dtype=L.dtype), L.shape)
            return jax.lax.linalg.triangular_solve(
                L, eye, left_side=True, lower=True, transpose_a=False
            )
        nb = (B + T - 1) // T
        padB = nb * T
        Lp = jnp.concatenate(
            [L, jnp.broadcast_to(jnp.eye(m, dtype=L.dtype), (padB - B, m, m))],
            axis=0,
        )
        Ll = jnp.transpose(Lp.reshape(nb, T, m, m), (0, 2, 3, 1))

        cols = _tri_inv_cols(m, T)
        ncp = (m + cols - 1) // cols
        w = _tri_inv_core(interpret)(Ll)
        # buffer-assignment guard: without the barrier XLA stack-allocates
        # this output in VMEM next to the kernel's own scratch (fusing it
        # into the consumer) and blows the 16 MB scoped budget at m ~ 136
        w = jax.lax.optimization_barrier(w)
        # panel-major -> [padB, m, ncp*cols], crop the column padding
        w = jnp.transpose(w, (0, 4, 2, 1, 3)).reshape(padB, m, ncp * cols)
        return w[:B, :, :m]

    return _vmappable(impl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def batched_tri_inv_pallas(L, interpret: bool = False):
    """W = L^-1 for a batch of lower-triangular matrices [B, m, m].

    Batch in the 128-wide lane dimension, like
    :func:`batched_cholesky_pallas`; m beyond the VMEM budget falls back to
    an XLA triangular solve against the identity."""
    return _tri_inv_pipeline(interpret)(L)


@functools.lru_cache(maxsize=None)
def _tri_inv_core(interpret: bool):
    def core(Ll):
        nb, m, _, T = Ll.shape
        cols = _tri_inv_cols(m, T)
        ncp = (m + cols - 1) // cols
        return pl.pallas_call(
            functools.partial(_tri_inv_kernel, cols=cols),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nb, ncp, m, cols, T), Ll.dtype),
            interpret=interpret,
        )(Ll)

    return _vmappable(core)


def _tri_inv_fwd(L, interpret):
    W = batched_tri_inv_pallas(L, interpret)
    return W, W


def _tri_inv_bwd(interpret, W, dW):
    """d(L^-1) = -L^-1 dL L^-1  =>  dL_bar = -tril(W^T dW_bar W^T)."""
    with jax.default_matmul_precision(_VJP_PRECISION):
        G = -jnp.einsum("bki,bkl,bjl->bij", W, dW, W)
    m = W.shape[-1]
    tril = jnp.tril(jnp.ones((m, m), dtype=W.dtype))
    return (G * tril,)


batched_tri_inv_pallas.defvjp(_tri_inv_fwd, _tri_inv_bwd)


def _chol_inv_kernel(k_hbm, lt_hbm, w_hbm, *, cols: int):
    """Fused batch-in-lanes Cholesky + triangular inverse.

    One VMEM residency of K does both: the right-looking factorization
    (identical to :func:`_chol_kernel`) leaves ``a_scr = L^T``; the
    column-paneled forward substitution of :func:`_tri_inv_kernel` then
    reads L's rows as a_scr's *columns* (``L[k, l] = a_scr[l, k]``), so no
    transpose or second HBM round-trip of the factor is needed.  Fusing the
    two kernels saves one dispatch + one [B, m, m] HBM write/read per factor
    batch, and — through the custom VJP on the wrapper — removes the
    backward pass's re-computation of W entirely."""
    nb, m, _, T = k_hbm.shape
    ncp = w_hbm.shape[1]

    def body(a_scr, w_scr, sem_in, sem_lt, sem_w):
        def tile(i, _):
            cp_in = pltpu.make_async_copy(k_hbm.at[i], a_scr, sem_in)
            cp_in.start()
            cp_in.wait()

            def step(k, _):
                akk = a_scr[pl.ds(k, 1), pl.ds(k, 1), :]  # [1, 1, T]
                dk_inv = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
                row_k = a_scr[pl.ds(k, 1), :, :]  # [1, m, T]
                jidx = jax.lax.broadcasted_iota(jnp.int32, (1, m, T), 1)
                col = jnp.where(jidx >= k, row_k * dk_inv, 0.0)
                a_scr[pl.ds(k, 1), :, :] = col  # L^T row k
                colu = jnp.where(jidx > k, col, 0.0)
                iidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1, T), 0)
                lcol = jnp.where(iidx > k, jnp.transpose(colu, (1, 0, 2)), 0.0)
                a_scr[:, :, :] = a_scr[:, :, :] - lcol * colu
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(m), step, jnp.int32(0))
            cp_lt = pltpu.make_async_copy(a_scr, lt_hbm.at[i], sem_lt)
            cp_lt.start()

            def panel(j, _):
                j0 = j * cols
                w_scr[:, :, :] = jnp.zeros((m, cols, T), dtype=w_scr.dtype)

                def istep(k, _):
                    dt = w_scr.dtype
                    one = jnp.asarray(1.0, dt)
                    tiny = jnp.asarray(1e-30, dt)
                    # L[k, :] is column k of a_scr (= L^T): [m, 1, T]
                    lcolk = a_scr[:, pl.ds(k, 1), :]
                    lkk = a_scr[pl.ds(k, 1), pl.ds(k, 1), :]  # [1, 1, T]
                    dk_inv = one / jnp.where(jnp.abs(lkk) > tiny, lkk, tiny)
                    acc = jnp.sum(
                        lcolk * w_scr[:, :, :], axis=0, keepdims=True
                    )  # [1, cols, T]
                    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, cols, T), 1)
                    ek = (cidx + j0 == k).astype(dt)
                    w_scr[pl.ds(k, 1), :, :] = (ek - acc) * dk_inv
                    return jnp.int32(0)

                jax.lax.fori_loop(j0, jnp.int32(m), istep, jnp.int32(0))
                cp_w = pltpu.make_async_copy(w_scr, w_hbm.at[i, j], sem_w)
                cp_w.start()
                cp_w.wait()
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(ncp), panel, jnp.int32(0))
            cp_lt.wait()
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), tile, jnp.int32(0))

    pl.run_scoped(
        body,
        a_scr=pltpu.VMEM((m, m, T), k_hbm.dtype),
        w_scr=pltpu.VMEM((m, cols, T), k_hbm.dtype),
        sem_in=pltpu.SemaphoreType.DMA,
        sem_lt=pltpu.SemaphoreType.DMA,
        sem_w=pltpu.SemaphoreType.DMA,
    )


@functools.lru_cache(maxsize=None)
def _chol_inv_pipeline(interpret: bool):
    def impl(K):
        B, m, _ = K.shape
        T = _tile_for(m)
        if T is None:
            L = jnp.linalg.cholesky(K)
            eye = jnp.broadcast_to(jnp.eye(m, dtype=K.dtype), K.shape)
            W = jax.lax.linalg.triangular_solve(
                L, eye, left_side=True, lower=True, transpose_a=False
            )
            return L, W
        nb = (B + T - 1) // T
        padB = nb * T
        Kp = jnp.concatenate(
            [K, jnp.broadcast_to(jnp.eye(m, dtype=K.dtype), (padB - B, m, m))],
            axis=0,
        )
        Kl = jnp.transpose(Kp.reshape(nb, T, m, m), (0, 2, 3, 1))

        cols = _tri_inv_cols(m, T)
        ncp = (m + cols - 1) // cols
        lt, w = _chol_inv_core(interpret)(Kl)
        # see batched_tri_inv_pallas: keep XLA from stack-allocating these
        # in VMEM next to the kernel's own scratch
        lt, w = jax.lax.optimization_barrier((lt, w))
        Lt = jnp.transpose(lt, (0, 3, 1, 2)).reshape(padB, m, m)[:B]
        L = jnp.transpose(Lt, (0, 2, 1))
        W = jnp.transpose(w, (0, 4, 2, 1, 3)).reshape(padB, m, ncp * cols)
        return L, W[:B, :, :m]

    return _vmappable(impl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def batched_chol_inv_pallas(K, interpret: bool = False):
    """(L, W) with L = chol(K) (lower) and W = L^-1, for SPD [B, m, m].

    One fused lanes kernel produces both; the custom VJP pulls cotangents
    of *both* outputs back to K using only MXU einsums of the saved (L, W)
    — no triangular solves and no Pallas invocations in the backward.
    Falls back to XLA cholesky + triangular_solve beyond the VMEM cap
    (the VJP formula is layout-agnostic)."""
    return _chol_inv_pipeline(interpret)(K)


@functools.lru_cache(maxsize=None)
def _chol_inv_core(interpret: bool):
    def core(Kl):
        nb, m, _, T = Kl.shape
        cols = _tri_inv_cols(m, T)
        ncp = (m + cols - 1) // cols
        return pl.pallas_call(
            functools.partial(_chol_inv_kernel, cols=cols),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nb, m, m, T), Kl.dtype),
                jax.ShapeDtypeStruct((nb, ncp, m, cols, T), Kl.dtype),
            ),
            interpret=interpret,
        )(Kl)

    return _vmappable(core)


def _chol_inv_fwd(K, interpret):
    L, W = batched_chol_inv_pallas(K, interpret)
    return (L, W), (L, W)


def _chol_inv_bwd(interpret, res, cts):
    """Pull (dL, dW) back to dK via the saved factors.

    W-cotangent -> L-cotangent: d(L^-1) = -L^-1 dL L^-1 gives
    dL += -tril(W^T dW W^T).  Then the standard Cholesky pullback with
    K^-1 expressed through W: dK = sym(W^T phi(L^T dL) W).  An explicit
    matmul-precision context (>= "high", see _VJP_PRECISION) is mandatory:
    custom_vjp rules trace outside the caller's precision context and the
    TPU bf16 default corrupts gradients."""
    L, W = res
    dL, dW = cts
    m = L.shape[-1]
    tril = jnp.tril(jnp.ones((m, m), dtype=L.dtype))
    eye = jnp.eye(m, dtype=L.dtype)
    with jax.default_matmul_precision(_VJP_PRECISION):
        G = -jnp.einsum("bki,bkl,bjl->bij", W, dW, W)  # -W^T dW W^T
        dLt = (dL + G) * tril
        P = jnp.einsum("bki,bkj->bij", L, dLt)
        phi = P * tril - 0.5 * eye * P
        sym = 0.5 * (phi + jnp.swapaxes(phi, -1, -2))
        dK = jnp.einsum("bki,bkl,blj->bij", W, sym, W)
        dK = 0.5 * (dK + jnp.swapaxes(dK, -1, -2))
    return (dK,)


batched_chol_inv_pallas.defvjp(_chol_inv_fwd, _chol_inv_bwd)


def _mvn_kernel(k_hbm, y_hbm, nact_hbm, ll_hbm, lt_hbm):
    nb, m, _, T = k_hbm.shape
    dy = y_hbm.shape[2]

    def body(a_scr, z_scr, n_scr, ll_scr, sem_a, sem_z, sem_n, sem_ll, sem_lt):
        def tile(i, _):
            cp_a = pltpu.make_async_copy(k_hbm.at[i], a_scr, sem_a)
            cp_z = pltpu.make_async_copy(y_hbm.at[i], z_scr, sem_z)
            cp_n = pltpu.make_async_copy(nact_hbm.at[i], n_scr, sem_n)
            cp_a.start()
            cp_z.start()
            cp_n.start()
            cp_a.wait()
            cp_z.wait()
            cp_n.wait()

            def step(k, logdet):
                akk = a_scr[pl.ds(k, 1), pl.ds(k, 1), :]
                dk_inv = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
                logdet = logdet + jnp.log(jnp.maximum(akk[0], 1e-30))
                row_k = a_scr[pl.ds(k, 1), :, :]
                jidx = jax.lax.broadcasted_iota(jnp.int32, (1, m, T), 1)
                col = jnp.where(jidx >= k, row_k * dk_inv, 0.0)
                a_scr[pl.ds(k, 1), :, :] = col
                colu = jnp.where(jidx > k, col, 0.0)
                iidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1, T), 0)
                lcol = jnp.where(iidx > k, jnp.transpose(colu, (1, 0, 2)), 0.0)
                a_scr[:, :, :] = a_scr[:, :, :] - lcol * colu
                # forward substitution: z_k = R_k / L_kk; R -= l_col z_k
                zk = z_scr[pl.ds(k, 1), :, :] * dk_inv[:, 0:1, :]  # [1, dy, T]
                z_scr[pl.ds(k, 1), :, :] = zk
                z_scr[:, :, :] = z_scr[:, :, :] - lcol * zk
                return logdet

            logdet = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(m), step,
                jnp.zeros((1, T), dtype=k_hbm.dtype),
            )
            quad = jnp.sum(z_scr[:, :, :] * z_scr[:, :, :], axis=(0, 1))  # [T]
            nact = n_scr[0, :]
            ll_scr[0, :] = (
                -0.5 * quad - 0.5 * dy * logdet[0] - 0.5 * dy * nact * _LOG_2PI
            )
            cp_ll = pltpu.make_async_copy(ll_scr, ll_hbm.at[i], sem_ll)
            cp_lt = pltpu.make_async_copy(a_scr, lt_hbm.at[i], sem_lt)
            cp_ll.start()
            cp_lt.start()
            cp_ll.wait()
            cp_lt.wait()
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), tile, jnp.int32(0))

    pl.run_scoped(
        body,
        a_scr=pltpu.VMEM((m, m, T), k_hbm.dtype),
        z_scr=pltpu.VMEM((m, dy, T), k_hbm.dtype),
        n_scr=pltpu.VMEM((1, T), k_hbm.dtype),
        ll_scr=pltpu.VMEM((1, T), k_hbm.dtype),
        sem_a=pltpu.SemaphoreType.DMA,
        sem_z=pltpu.SemaphoreType.DMA,
        sem_n=pltpu.SemaphoreType.DMA,
        sem_ll=pltpu.SemaphoreType.DMA,
        sem_lt=pltpu.SemaphoreType.DMA,
    )


@functools.lru_cache(maxsize=None)
def _mvn_pipeline(interpret: bool):
    def impl(Kp, Ym, n_active):
        B, m, _ = Kp.shape
        dy = Ym.shape[2]
        T = _tile_for(m, for_mvn=True)
        assert T is not None, f"MVN kernel unsupported at m={m}"
        nb = (B + T - 1) // T
        padB = nb * T
        Kx = jnp.concatenate(
            [Kp, jnp.broadcast_to(jnp.eye(m, dtype=Kp.dtype), (padB - B, m, m))],
            axis=0,
        )
        Yx = jnp.concatenate([Ym, jnp.zeros((padB - B, m, dy), Ym.dtype)], axis=0)
        nx = jnp.concatenate(
            [n_active.astype(Kp.dtype), jnp.zeros((padB - B,), Kp.dtype)]
        )
        Kl = jnp.transpose(Kx.reshape(nb, T, m, m), (0, 2, 3, 1))
        Yl = jnp.transpose(Yx.reshape(nb, T, m, dy), (0, 2, 3, 1))
        nl = nx.reshape(nb, 1, T)

        ll, lt = _mvn_core(interpret)(Kl, Yl, nl)
        Lt = jnp.transpose(lt, (0, 3, 1, 2)).reshape(padB, m, m)[:B]
        return ll.reshape(padB)[:B], jnp.transpose(Lt, (0, 2, 1))

    return _vmappable(impl)


def _mvn_forward(Kp, Ym, n_active, interpret=False):
    """(ll [B], L [B, m, m]) via the Pallas kernel.  Kp must be
    padded-masked (identity rows/cols outside the mask), Ym zeroed
    outside.  The untile happens inside the folded pipeline so that outer
    vmap axes pack into shared lane tiles (see :func:`_vmappable`)."""
    return _mvn_pipeline(interpret)(Kp, Ym, n_active)


@functools.lru_cache(maxsize=None)
def _mvn_core(interpret: bool):
    def core(Kl, Yl, nl):
        nb, m, _, T = Kl.shape
        return pl.pallas_call(
            _mvn_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nb, 1, T), Kl.dtype),
                jax.ShapeDtypeStruct((nb, m, m, T), Kl.dtype),
            ),
            interpret=interpret,
        )(Kl, Yl, nl)

    return _vmappable(core)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def batched_mvn_ll_pallas(Kp, Ym, n_active, interpret=False):
    """Per-block masked Gaussian log-density [B] from padded-masked kernel
    matrices [B, m, m], zero-padded observations [B, m, dy], and active
    counts [B].  Same semantics as vmapped
    :func:`gprf_tpu.linalg.masked.masked_gaussian_ll`."""
    ll, _ = _mvn_forward(Kp, Ym, n_active, interpret=interpret)
    return ll


def _mvn_fwd(Kp, Ym, n_active, interpret):
    ll, L = _mvn_forward(Kp, Ym, n_active, interpret=interpret)
    return ll, (L, Ym)


def _mvn_bwd(interpret, res, g):
    """Analytic symmetrized cotangents, reusing the forward factor:
    dK = g * 0.5 (alpha alpha^T - dy K^-1),  dY = -g * alpha.

    An explicit matmul-precision context (>= "high", see _VJP_PRECISION)
    is mandatory here: custom_vjp backward rules are traced outside any
    precision context the caller wrapped around the forward, so without it
    these solves/einsums run at the TPU bf16 default and systematically
    corrupt gradients (observed 24% deviation, cosine 0.986 against the
    autodiff reference)."""
    L, Ym = res
    dy = Ym.shape[2]
    with jax.default_matmul_precision(_VJP_PRECISION):
        # K^-1 = W^T W and alpha = W^T (W Ym) with W = L^-1 from the lanes
        # kernel: all solves become MXU matmuls (see _chol_bwd)
        W = _tri_inv_for_vjp(L, interpret)
        alpha = jnp.einsum("bki,bkd->bid", W, jnp.einsum("bij,bjd->bid", W, Ym))
        Kinv = jnp.einsum("bki,bkj->bij", W, W)
        gb = g[:, None, None]
        dK = gb * 0.5 * (jnp.einsum("bik,bjk->bij", alpha, alpha) - dy * Kinv)
        dYm = -gb * alpha
    d_nact = -0.5 * dy * _LOG_2PI * g
    return dK, dYm, d_nact


batched_mvn_ll_pallas.defvjp(_mvn_fwd, _mvn_bwd)


# ---------------------------------------------------------------------------
# Fused MVN + triangular inverse: one lanes dispatch produces the log-density
# AND the backward pass's residuals (W = L^-1, z = L^-1 Y), so the custom VJP
# is einsum-only — no Pallas tri-inv recompute of the factor inverse in the
# backward (round-2 VERDICT weak #2: the MVN VJP's lanes tri-inv + pullback
# chain was the largest remaining flagship piece).  The factor L itself never
# leaves VMEM.

def _mvn_inv_kernel(k_hbm, y_hbm, nact_hbm, ll_hbm, w_hbm, z_hbm, *, cols: int):
    nb, m, _, T = k_hbm.shape
    dy = y_hbm.shape[2]
    ncp = w_hbm.shape[1]

    def body(a_scr, z_scr, n_scr, ll_scr, w_scr,
             sem_a, sem_z, sem_n, sem_ll, sem_w, sem_zo):
        def tile(i, _):
            cp_a = pltpu.make_async_copy(k_hbm.at[i], a_scr, sem_a)
            cp_z = pltpu.make_async_copy(y_hbm.at[i], z_scr, sem_z)
            cp_n = pltpu.make_async_copy(nact_hbm.at[i], n_scr, sem_n)
            cp_a.start()
            cp_z.start()
            cp_n.start()
            cp_a.wait()
            cp_z.wait()
            cp_n.wait()

            # factorization sweep (identical to _mvn_kernel): leaves
            # a_scr = L^T, z_scr = L^-1 Y, and accumulates logdet
            def step(k, logdet):
                akk = a_scr[pl.ds(k, 1), pl.ds(k, 1), :]
                dk_inv = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
                logdet = logdet + jnp.log(jnp.maximum(akk[0], 1e-30))
                row_k = a_scr[pl.ds(k, 1), :, :]
                jidx = jax.lax.broadcasted_iota(jnp.int32, (1, m, T), 1)
                col = jnp.where(jidx >= k, row_k * dk_inv, 0.0)
                a_scr[pl.ds(k, 1), :, :] = col
                colu = jnp.where(jidx > k, col, 0.0)
                iidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1, T), 0)
                lcol = jnp.where(iidx > k, jnp.transpose(colu, (1, 0, 2)), 0.0)
                a_scr[:, :, :] = a_scr[:, :, :] - lcol * colu
                zk = z_scr[pl.ds(k, 1), :, :] * dk_inv[:, 0:1, :]
                z_scr[pl.ds(k, 1), :, :] = zk
                z_scr[:, :, :] = z_scr[:, :, :] - lcol * zk
                return logdet

            logdet = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(m), step,
                jnp.zeros((1, T), dtype=k_hbm.dtype),
            )
            quad = jnp.sum(z_scr[:, :, :] * z_scr[:, :, :], axis=(0, 1))
            nact = n_scr[0, :]
            ll_scr[0, :] = (
                -0.5 * quad - 0.5 * dy * logdet[0] - 0.5 * dy * nact * _LOG_2PI
            )
            cp_ll = pltpu.make_async_copy(ll_scr, ll_hbm.at[i], sem_ll)
            cp_zo = pltpu.make_async_copy(z_scr, z_hbm.at[i], sem_zo)
            cp_ll.start()
            cp_zo.start()

            # column-paneled forward substitution for W = L^-1, reading L's
            # rows as a_scr's columns (see _chol_inv_kernel); overlaps the
            # ll/z output DMAs above
            def panel(j, _):
                j0 = j * cols
                w_scr[:, :, :] = jnp.zeros((m, cols, T), dtype=w_scr.dtype)

                def istep(k, _):
                    dt = w_scr.dtype
                    one = jnp.asarray(1.0, dt)
                    tiny = jnp.asarray(1e-30, dt)
                    lcolk = a_scr[:, pl.ds(k, 1), :]
                    lkk = a_scr[pl.ds(k, 1), pl.ds(k, 1), :]
                    dk_inv = one / jnp.where(jnp.abs(lkk) > tiny, lkk, tiny)
                    acc = jnp.sum(
                        lcolk * w_scr[:, :, :], axis=0, keepdims=True
                    )
                    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, cols, T), 1)
                    ek = (cidx + j0 == k).astype(dt)
                    w_scr[pl.ds(k, 1), :, :] = (ek - acc) * dk_inv
                    return jnp.int32(0)

                jax.lax.fori_loop(j0, jnp.int32(m), istep, jnp.int32(0))
                cp_w = pltpu.make_async_copy(w_scr, w_hbm.at[i, j], sem_w)
                cp_w.start()
                cp_w.wait()
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(ncp), panel, jnp.int32(0))
            cp_ll.wait()
            cp_zo.wait()
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), tile, jnp.int32(0))

    pl.run_scoped(
        body,
        a_scr=pltpu.VMEM((m, m, T), k_hbm.dtype),
        z_scr=pltpu.VMEM((m, dy, T), k_hbm.dtype),
        n_scr=pltpu.VMEM((1, T), k_hbm.dtype),
        ll_scr=pltpu.VMEM((1, T), k_hbm.dtype),
        w_scr=pltpu.VMEM((m, cols, T), k_hbm.dtype),
        sem_a=pltpu.SemaphoreType.DMA,
        sem_z=pltpu.SemaphoreType.DMA,
        sem_n=pltpu.SemaphoreType.DMA,
        sem_ll=pltpu.SemaphoreType.DMA,
        sem_w=pltpu.SemaphoreType.DMA,
        sem_zo=pltpu.SemaphoreType.DMA,
    )


def _mvn_inv_cols(m: int, dy: int, T: int = _LANES,
                  budget_bytes: int = 14 * 1024 * 1024) -> int:
    """Panel width for the fused MVN+inverse kernel: the budget must hold
    L ([m, m, T]) AND the residual ([m, dy, T]) alongside the (twice-
    charged, see :func:`_tri_inv_cols`) output panel."""
    rem = budget_bytes - m * m * T * 4 - m * dy * T * 4
    c = rem // (2 * m * T * 4)
    return min(64, int(c) // 8 * 8)


def mvn_inv_supported(m: int, dy: int) -> bool:
    """Whether the fused MVN+inverse kernel fits VMEM at (m, dy).  Tighter
    than :func:`pallas_supported` — the W panel shares the budget with the
    residual buffer — but covers every default split leaf (<= 96)."""
    return m <= MAX_M_MVN and _mvn_inv_cols(m, dy) >= 16


@functools.lru_cache(maxsize=None)
def _mvn_inv_pipeline(interpret: bool):
    def impl(Kp, Ym, n_active):
        B, m, _ = Kp.shape
        dy = Ym.shape[2]
        T = _tile_for(m, for_mvn=True)
        assert T is not None, f"MVN+inv kernel unsupported at m={m}"
        # the W panel shares the VMEM budget with the residual buffer, so
        # support depends on dy too — a large dy can drive the panel width
        # to zero/negative even at small m (callers should gate on
        # mvn_inv_supported; this is the backstop)
        assert mvn_inv_supported(m, dy), (
            f"MVN+inv kernel unsupported at (m={m}, dy={dy}): "
            f"panel width {_mvn_inv_cols(m, dy)} < 16"
        )
        nb = (B + T - 1) // T
        padB = nb * T
        Kx = jnp.concatenate(
            [Kp, jnp.broadcast_to(jnp.eye(m, dtype=Kp.dtype), (padB - B, m, m))],
            axis=0,
        )
        Yx = jnp.concatenate([Ym, jnp.zeros((padB - B, m, dy), Ym.dtype)], axis=0)
        nx = jnp.concatenate(
            [n_active.astype(Kp.dtype), jnp.zeros((padB - B,), Kp.dtype)]
        )
        Kl = jnp.transpose(Kx.reshape(nb, T, m, m), (0, 2, 3, 1))
        Yl = jnp.transpose(Yx.reshape(nb, T, m, dy), (0, 2, 3, 1))
        nl = nx.reshape(nb, 1, T)

        cols = _mvn_inv_cols(m, dy)
        ncp = (m + cols - 1) // cols
        ll, w, z = _mvn_inv_core(interpret)(Kl, Yl, nl)
        # see batched_tri_inv_pallas: keep XLA from stack-allocating these
        # in VMEM next to the kernel's own scratch
        ll, w, z = jax.lax.optimization_barrier((ll, w, z))
        W = jnp.transpose(w, (0, 4, 2, 1, 3)).reshape(padB, m, ncp * cols)
        Z = jnp.transpose(z, (0, 3, 1, 2)).reshape(padB, m, dy)
        return ll.reshape(padB)[:B], W[:B, :, :m], Z[:B]

    return _vmappable(impl)


@functools.lru_cache(maxsize=None)
def _mvn_inv_core(interpret: bool):
    def core(Kl, Yl, nl):
        nb, m, _, T = Kl.shape
        dy = Yl.shape[2]
        cols = _mvn_inv_cols(m, dy)
        ncp = (m + cols - 1) // cols
        return pl.pallas_call(
            functools.partial(_mvn_inv_kernel, cols=cols),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nb, 1, T), Kl.dtype),
                jax.ShapeDtypeStruct((nb, ncp, m, cols, T), Kl.dtype),
                jax.ShapeDtypeStruct((nb, m, dy, T), Kl.dtype),
            ),
            interpret=interpret,
        )(Kl, Yl, nl)

    return _vmappable(core)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def batched_mvn_ll_inv_pallas(Kp, Ym, n_active, interpret=False):
    """Per-block masked Gaussian log-density [B] — same contract as
    :func:`batched_mvn_ll_pallas`, but the fused kernel also emits
    W = L^-1 and z = L^-1 Y so the backward launches no Pallas kernels:

        dK = g/2 (alpha alpha^T - dy K^-1) = g/2 W^T (z z^T - dy I) W,
        alpha = W^T z,  K^-1 = W^T W  (all MXU einsums of the residuals).
    """
    # the primal deliberately runs the SAME fused kernel as _mvn_inv_fwd
    # (discarding W/Z) rather than the cheaper plain-MVN kernel: the ll
    # parity tests and scripts/check_mvninv_parity.py call this without
    # grad, and routing the primal elsewhere would leave the fused
    # kernel's ll asserted nowhere while value_and_grad still returned it
    ll, _, _ = _mvn_inv_pipeline(interpret)(Kp, Ym, n_active)
    return ll


def _mvn_inv_fwd(Kp, Ym, n_active, interpret):
    ll, W, Z = _mvn_inv_pipeline(interpret)(Kp, Ym, n_active)
    return ll, (W, Z)


def _mvn_inv_bwd(interpret, res, g):
    """Einsum-only pullback of the saved (W, z) residuals.  An explicit
    matmul-precision context (>= "high", see _VJP_PRECISION) is mandatory
    (custom_vjp rules trace outside the caller's precision context — see
    _mvn_bwd)."""
    W, Z = res
    dy = Z.shape[2]
    with jax.default_matmul_precision(_VJP_PRECISION):
        alpha = jnp.einsum("bki,bkd->bid", W, Z)
        Kinv = jnp.einsum("bki,bkj->bij", W, W)
        gb = g[:, None, None]
        dK = gb * 0.5 * (jnp.einsum("bik,bjk->bij", alpha, alpha) - dy * Kinv)
        dYm = -gb * alpha
    d_nact = -0.5 * dy * _LOG_2PI * g
    return dK, dYm, d_nact


batched_mvn_ll_inv_pallas.defvjp(_mvn_inv_fwd, _mvn_inv_bwd)
