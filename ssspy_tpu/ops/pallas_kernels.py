"""Pallas TPU kernels for the separation hot path.

The per-iteration hot op of every IP-family method is the weighted
covariance ``U[i,n] = mean_t varphi[n,t] x_it x_it^H`` (reference
ssspy/bss/iva.py:1780-1793). In split-complex form this is four real
batched GEMMs over the same operands; XLA emits them as four separate
HBM passes over ``X``. The fused kernel below reads each (bin-block,
source) tile of ``Xr``/``Xi`` into VMEM once, applies the MM weight in
registers, and issues all four MXU contractions from the same tile —
halving HBM traffic on the dominant op.

Falls back to the einsum formulation on non-TPU backends (the kernel
also runs under ``interpret=True`` for CPU parity tests).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "weighted_covariance_sc",
    "planar_inverse_sc",
    "planar_inv_sandwich_sc",
    "planar_model_traces_sc",
    "prepare_xx_lanes",
    "iss1_sweep_pallas",
    "jacobi_eigh_lanes",
    "ipa_congruence_lanes",
]

# beyond this many frames the per-program tiles ((block_bins, M, T) x2 in
# f32 plus weights/outputs) approach the ~16 MB/core VMEM budget; the
# einsum path takes over (correct for any length, ~2x slower on the op)
_MAX_FRAMES_VMEM = 16384


def _wcov_kernel(
    xr_ref,
    xi_ref,
    phi_ref,
    ur_ref,
    ui_ref,
    *,
    inv_frames,
    n_sources,
    cast=None,
    per_bin=False,
):
    # xr/xi: (Ib, M, T) bins-major tiles; phi: full (N, T) weights, or a
    # bins-major (Ib, N, T) tile when ``per_bin`` (the ILRMA/FDICA/MNMF
    # weight shape). One program per bin-block: the X tile is read into
    # VMEM once and reused for every source and all four real
    # contractions — the HBM saving XLA's per-einsum lowering does not
    # get. ``cast=bfloat16`` feeds the MXU in bf16 with f32 accumulation.
    xr = xr_ref[:]
    xi = xi_ref[:]
    if cast is not None:
        xr = xr.astype(cast)
        xi = xi.astype(cast)

    def bdot(a, b):
        # batched over bins: (Ib, M, T) x (Ib, M, T) -> (Ib, M, M), contract T
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    for n in range(n_sources):  # static unroll; N <= 8
        phi = phi_ref[:, n, :] if per_bin else phi_ref[n, :]
        if cast is not None:
            phi = phi.astype(cast)
        phi_b = phi[:, None, :] if per_bin else phi[None, None, :]
        xr_s = xr * phi_b
        xi_s = xi * phi_b
        ur_ref[:, n] = (bdot(xr_s, xr) + bdot(xi_s, xi)) * inv_frames
        ui_ref[:, n] = (bdot(xi_s, xr) - bdot(xr_s, xi)) * inv_frames


def _wcov_pallas(
    Xr, Xi, varphi, block_bins: int = 8, interpret: bool = False, cast=None
):
    """``(M, I, T)`` planar mixture + ``(N, T)`` or per-bin ``(N, I, T)``
    weights -> (I, N, M, M) pair."""
    n_channels, n_bins, n_frames = Xr.shape
    n_sources = varphi.shape[0]
    per_bin = varphi.ndim == 3

    # bins-major layout so the bin axis is the GEMM batch dimension
    Xr_b = jnp.swapaxes(Xr, 0, 1)  # (I, M, T)
    Xi_b = jnp.swapaxes(Xi, 0, 1)
    if per_bin:
        varphi = jnp.swapaxes(varphi, 0, 1)  # (I, N, T)

    grid = (pl.cdiv(n_bins, block_bins),)
    kernel = functools.partial(
        _wcov_kernel,
        inv_frames=1.0 / n_frames,
        n_sources=n_sources,
        cast=cast,
        per_bin=per_bin,
    )

    out_shape = jax.ShapeDtypeStruct(
        (n_bins, n_sources, n_channels, n_channels), jnp.float32
    )
    x_spec = pl.BlockSpec(
        (block_bins, n_channels, n_frames),
        lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if per_bin:
        phi_spec = pl.BlockSpec(
            (block_bins, n_sources, n_frames),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        phi_spec = pl.BlockSpec(
            (n_sources, n_frames), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
    u_spec = pl.BlockSpec(
        (block_bins, n_sources, n_channels, n_channels),
        lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    Ur, Ui = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec, x_spec, phi_spec],
        out_specs=[u_spec, u_spec],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(Xr_b, Xi_b, varphi)
    return Ur, Ui


def _wcov_einsum(Xr, Xi, varphi):
    n_frames = Xr.shape[-1]
    eq = "nit,pit,qit->inpq" if varphi.ndim == 3 else "nt,pit,qit->inpq"
    Ur = (
        jnp.einsum(eq, varphi, Xr, Xr) + jnp.einsum(eq, varphi, Xi, Xi)
    ) / n_frames
    Ui = (
        jnp.einsum(eq, varphi, Xi, Xr) - jnp.einsum(eq, varphi, Xr, Xi)
    ) / n_frames
    return Ur, Ui


def weighted_covariance_sc(Xr, Xi, varphi, impl: str = "auto"):
    """Split-complex weighted covariance ``(Ur, Ui)`` of shape (I, N, M, M).

    ``varphi``: ``(N, T)`` scalar weights (the IVA shape) or ``(N, I, T)``
    per-bin weights (the ILRMA/FDICA/MNMF shape — reference
    ssspy/bss/ilrma.py:1497-1507).

    ``impl``: ``"pallas"`` (fused TPU kernel), ``"pallas_bf16"`` (fused
    kernel with bf16 MXU inputs + f32 accumulation), ``"einsum"`` (XLA),
    ``"interpret"``/``"interpret_bf16"`` (Pallas interpreter, for tests),
    or ``"auto"`` (pallas on TPU backends, einsum elsewhere).
    """
    if impl == "auto":
        # the kernel lowers only on TPU targets ("tpu" proper and the
        # axon PJRT tunnel); GPUs and CPUs take the XLA einsum path
        from .splitc import _on_tpu_backend

        on_tpu = _on_tpu_backend()
        fits_vmem = Xr.shape[-1] <= _MAX_FRAMES_VMEM
        impl = "pallas" if (on_tpu and fits_vmem) else "einsum"

    if impl == "einsum":
        return _wcov_einsum(Xr, Xi, varphi)
    if impl == "pallas":
        return _wcov_pallas(Xr, Xi, varphi)
    if impl == "pallas_bf16":
        return _wcov_pallas(Xr, Xi, varphi, cast=jnp.bfloat16)
    if impl == "interpret":
        return _wcov_pallas(Xr, Xi, varphi, interpret=True)
    if impl == "interpret_bf16":
        return _wcov_pallas(Xr, Xi, varphi, interpret=True, cast=jnp.bfloat16)
    raise ValueError(f"unknown impl {impl}")


# ---- batched planar Hermitian inverse (dense-MNMF / IPSDTA hot op) ----------
#
# GaussMNMF inverts the (n_bins x n_frames) batch of 8x8 model covariances
# three times per iteration (reference ssspy/bss/mnmf.py:836-1016). The XLA
# lowering of the unrolled Gauss-Jordan materializes a (batch, 2M, 3M) f32
# intermediate in HBM after EVERY elimination step — ~16 round trips of
# ~300 MB at the dense-MNMF batch size, which makes the step HBM-bound.
# This kernel keeps the whole augmented system [E(A) | I] VMEM-resident per
# batch tile (batch-in-lanes layout), so HBM sees each matrix exactly twice:
# one read of the operand pair, one write of the inverse pair.


def _gj_inverse_lanes(aug_ref, Rr, Ri, m, tiny):
    # Rr/Ri: (m, m, Bt) planar Hermitian values, batch last (lanes);
    # aug_ref: (2m, 3m, Bt) scratch holding the embedded augmented system.
    # E(A) = [[Ar, -Ai], [Ai, Ar]] is real-SPD for Hermitian PD A, and
    # E(A)^{-1} [I; 0] = [Br; Bi] with B = A^{-1} — only m RHS columns.
    # Returns the (Br, Bi) planar inverse pair as values.
    two_m = 2 * m
    aug_ref[:m, :m, :] = Rr
    aug_ref[:m, m:two_m, :] = -Ri
    aug_ref[m:two_m, :m, :] = Ri
    aug_ref[m:two_m, m:two_m, :] = Rr

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (two_m, m), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (two_m, m), 1)
    eye_cols = (row_ids == col_ids).astype(Rr.dtype)
    aug_ref[:, two_m:, :] = jnp.broadcast_to(
        eye_cols[:, :, None], (two_m, m, Rr.shape[-1])
    )

    # pivot-free Gauss-Jordan, statically unrolled: every op is an
    # elementwise VPU op over (rows, cols, lanes=batch) — no gathers,
    # no scatters, no data-dependent control flow. The sign-preserving
    # pivot floor matches gauss_jordan_solve_nopivot.
    for k in range(two_m):
        row = aug_ref[k]  # (3m, Bt)
        pivot = row[k : k + 1, :]  # (1, Bt)
        pivot = jnp.where(
            jnp.abs(pivot) < tiny, jnp.where(pivot < 0, -tiny, tiny), pivot
        )
        row = row / pivot
        factor = aug_ref[:, k : k + 1, :]  # (2m, 1, Bt)
        aug_ref[:] = aug_ref[:] - factor * row[None, :, :]
        aug_ref[k] = row

    return aug_ref[:m, two_m:, :], aug_ref[m:two_m, two_m:, :]


def _pinv_kernel(rr_ref, ri_ref, or_ref, oi_ref, aug_ref, *, m, tiny):
    Br, Bi = _gj_inverse_lanes(aug_ref, rr_ref[:], ri_ref[:], m, tiny)
    or_ref[:] = Br
    oi_ref[:] = Bi


def _pinv_pallas(Rr, Ri, block_b: int = 1024, interpret: bool = False, tiny=1e-20):
    """``(..., m, m)`` planar pair -> planar inverse, Pallas path."""
    batch_shape = Rr.shape[:-2]
    m = Rr.shape[-1]
    Rr2 = Rr.reshape(-1, m, m)
    Ri2 = Ri.reshape(-1, m, m)
    n_batch = Rr2.shape[0]

    pad = (-n_batch) % block_b
    if pad:
        # pad with identities so the padded systems stay well-posed
        eye = jnp.broadcast_to(jnp.eye(m, dtype=Rr.dtype), (pad, m, m))
        Rr2 = jnp.concatenate([Rr2, eye], axis=0)
        Ri2 = jnp.concatenate([Ri2, jnp.zeros_like(eye)], axis=0)
    total = Rr2.shape[0]

    # batch-in-lanes: (m, m, B) so every kernel op vectorizes over the
    # 128-lane axis at full utilization
    Rr_l = jnp.transpose(Rr2, (1, 2, 0))
    Ri_l = jnp.transpose(Ri2, (1, 2, 0))

    kernel = functools.partial(_pinv_kernel, m=m, tiny=tiny)
    spec = pl.BlockSpec((m, m, block_b), lambda b: (0, 0, b), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m, m, total), Rr.dtype)

    Or_l, Oi_l = pl.pallas_call(
        kernel,
        grid=(total // block_b,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[out_shape, out_shape],
        scratch_shapes=[pltpu.VMEM((2 * m, 3 * m, block_b), Rr.dtype)],
        interpret=interpret,
    )(Rr_l, Ri_l)

    Or = jnp.transpose(Or_l, (2, 0, 1))[:n_batch].reshape(*batch_shape, m, m)
    Oi = jnp.transpose(Oi_l, (2, 0, 1))[:n_batch].reshape(*batch_shape, m, m)
    return Or, Oi


def planar_inverse_sc(Rr, Ri, impl: str = "auto", block_b: int = 1024):
    """Batched planar complex inverse of Hermitian ``(..., m, m)`` pairs.

    ``impl``: ``"pallas"`` (VMEM-resident fused Gauss-Jordan; the TPU
    fast path for large batches), ``"gj"`` (XLA unrolled Gauss-Jordan via
    :func:`ssspy_tpu.ops.splitc.csolve_matrix`), ``"interpret"`` (Pallas
    interpreter, for CPU parity tests), or ``"auto"`` (pallas on TPU
    backends when the batch is large enough to be HBM-bound, gj
    elsewhere). Numerics match the ``gj`` path: identical pivot-free
    elimination order and the same sign-preserving pivot floor.
    """
    if impl == "auto":
        from .splitc import _on_tpu_backend

        on_tpu = _on_tpu_backend()
        n_batch = 1
        for d in Rr.shape[:-2]:
            n_batch *= d
        impl = "pallas" if (on_tpu and n_batch >= 4 * block_b) else "gj"

    if impl == "pallas":
        return _pinv_pallas(Rr, Ri, block_b=block_b)
    if impl == "interpret":
        return _pinv_pallas(Rr, Ri, block_b=min(block_b, 128), interpret=True)
    if impl == "gj":
        from .splitc import _cinv

        return _cinv(Rr, Ri)
    raise ValueError(f"unknown impl {impl}")


def _lane_cmatmul(Ar, Ai, Br, Bi, m):
    # planar complex matmul in batch-in-lanes layout: C[i,j,b] =
    # sum_k A[i,k,b] B[k,j,b] as m broadcasted elementwise FMAs — the
    # (batch, m, m) @ (batch, m, m) form this replaces lowers
    # pathologically on the TPU backend at small m (measured ~11 ms per
    # pair of products at the dense-MNMF batch size vs ~1 ms here).
    Cr = 0.0
    Ci = 0.0
    for k in range(m):
        # static slices only (Mosaic cannot lower >2-D gathers)
        ar = Ar[:, k : k + 1, :]  # (m, 1, B)
        ai = Ai[:, k : k + 1, :]
        br = Br[k : k + 1, :, :]  # (1, m, B)
        bi = Bi[k : k + 1, :, :]
        Cr = Cr + ar * br - ai * bi
        Ci = Ci + ar * bi + ai * br
    return Cr, Ci


def _pinv_sandwich_kernel(
    rr_ref, ri_ref, cr_ref, ci_ref, or_ref, oi_ref, sr_ref, si_ref, aug_ref, *, m, tiny
):
    # inverse exactly as _pinv_kernel, then S = R^{-1} C R^{-1} fused in
    # VMEM (C stays Hermitian -> S Hermitian up to roundoff).
    _pinv_kernel(rr_ref, ri_ref, or_ref, oi_ref, aug_ref, m=m, tiny=tiny)
    two_m = 2 * m
    Br = aug_ref[:m, two_m:, :]
    Bi = aug_ref[m:two_m, two_m:, :]
    M1r, M1i = _lane_cmatmul(Br, Bi, cr_ref[:], ci_ref[:], m)
    Sr, Si = _lane_cmatmul(M1r, M1i, Br, Bi, m)
    sr_ref[:] = Sr
    si_ref[:] = Si


def planar_inv_sandwich_sc(
    Rr, Ri, Cr, Ci, impl: str = "auto", block_b: int = 1024, tiny=1e-20
):
    """Fused ``(R^{-1}, R^{-1} C R^{-1})`` for batched planar Hermitian pairs.

    The dense-MNMF trace/spatial updates need both quantities per
    (bin, frame); computing the two congruence products as XLA batched
    (batch, m, m) matmuls dominates the step at small m, so the TPU path
    evaluates them inside the inverse kernel while the operands are
    VMEM-resident. ``impl`` as in :func:`planar_inverse_sc` ("gj"
    computes the same values via XLA)."""
    if impl == "auto":
        from .splitc import _on_tpu_backend

        on_tpu = _on_tpu_backend()
        n_batch = 1
        for d in Rr.shape[:-2]:
            n_batch *= d
        impl = "pallas" if (on_tpu and n_batch >= 4 * block_b) else "gj"

    if impl == "gj":
        from .splitc import _cinv, _cmatmul

        Br, Bi = _cinv(Rr, Ri)
        M1 = _cmatmul(Br, Bi, Cr, Ci)
        Sr, Si = _cmatmul(M1[0], M1[1], Br, Bi)
        return Br, Bi, Sr, Si

    interpret = impl == "interpret"
    if interpret:
        block_b = min(block_b, 128)

    batch_shape = Rr.shape[:-2]
    m = Rr.shape[-1]
    arrs = [a.reshape(-1, m, m) for a in (Rr, Ri, Cr, Ci)]
    n_batch = arrs[0].shape[0]
    pad = (-n_batch) % block_b
    if pad:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=Rr.dtype), (pad, m, m))
        zeros = jnp.zeros_like(eye)
        arrs = [
            jnp.concatenate([a, p], axis=0)
            for a, p in zip(arrs, (eye, zeros, zeros, zeros))
        ]
    total = arrs[0].shape[0]
    lanes = [jnp.transpose(a, (1, 2, 0)) for a in arrs]

    kernel = functools.partial(_pinv_sandwich_kernel, m=m, tiny=tiny)
    spec = pl.BlockSpec((m, m, block_b), lambda b: (0, 0, b), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m, m, total), Rr.dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(total // block_b,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 4,
        out_shape=[out_shape] * 4,
        scratch_shapes=[pltpu.VMEM((2 * m, 3 * m, block_b), Rr.dtype)],
        interpret=interpret,
    )(*lanes)

    def back(a):
        return jnp.transpose(a, (2, 0, 1))[:n_batch].reshape(*batch_shape, m, m)

    Or_l, Oi_l, Sr_l, Si_l = outs
    return back(Or_l), back(Oi_l), back(Sr_l), back(Si_l)


# ---- fused IPA congruence-stack update ---------------------------------------
#
# The IPA congruence sweep (ops/splitc.py:_ipa_sweep_congruence_sc) pushes each
# source's per-bin linear update Y <- T Y through the weighted-covariance stack
# as U[s] <- T U[s] T^H and the accumulator as G <- T G. Composed from XLA ops
# that is 12 batched (bins*sources, m, m) einsums + 4 accumulator einsums per
# source — at m = 8 each lowers to a dispatch-bound sub-50-us kernel, and the
# round-4 stage profile shows the sweep is bound by exactly this op count.
# The kernel below evaluates the whole per-source stack-plus-accumulator
# update as lane FMAs in ONE dispatch, with the operands batch-in-lanes
# (m, m, bins) so every multiply runs across the 128-lane axis.


def _ipa_congruence_kernel(
    tr_ref,
    ti_ref,
    thr_ref,
    thi_ref,
    ur_ref,
    ui_ref,
    gr_ref,
    gi_ref,
    our_ref,
    oui_ref,
    ogr_ref,
    ogi_ref,
    *,
    m,
    n_sources,
):
    # T/TH/G: (m, m, B); U: (S, m, m, B). TH is conj(T)^T, precomputed on
    # the host so the kernel never transposes (Mosaic sublane shuffles
    # are the thing to avoid; see _lane_cmatmul).
    Tr, Ti = tr_ref[:], ti_ref[:]
    THr, THi = thr_ref[:], thi_ref[:]
    for s in range(n_sources):  # static unroll; S <= 8
        Ar, Ai = _lane_cmatmul(Tr, Ti, ur_ref[s], ui_ref[s], m)
        Cr, Ci = _lane_cmatmul(Ar, Ai, THr, THi, m)
        our_ref[s] = Cr
        oui_ref[s] = Ci
    Gr, Gi = _lane_cmatmul(Tr, Ti, gr_ref[:], gi_ref[:], m)
    ogr_ref[:] = Gr
    ogi_ref[:] = Gi


def ipa_congruence_lanes(
    Tlr, Tli, ULr, ULi, GLr, GLi, impl: str = "pallas"
):
    """One IPA congruence round in batch-in-lanes layout.

    ``Tl``: the per-bin update matrix pair ``(m, m, B)``; ``UL``: the
    per-source covariance stack pair ``(S, m, m, B)``; ``GL``: the
    accumulated-transform pair ``(m, m, B)``. Returns the updated
    ``(UL, GL)`` pairs: ``U[s] <- T U[s] T^H`` and ``G <- T G``, all in
    one kernel dispatch. ``B`` should be lane-padded by the caller (the
    sweep pads bins once up front). ``impl``: ``"pallas"`` or
    ``"interpret"`` (CPU parity tests)."""
    n_sources, m, _, B = ULr.shape
    # conj-transpose in lanes: swap the two matrix dims, negate imag
    THr = jnp.swapaxes(Tlr, 0, 1)
    THi = -jnp.swapaxes(Tli, 0, 1)

    kernel = functools.partial(
        _ipa_congruence_kernel, m=m, n_sources=n_sources
    )
    mat_spec = pl.BlockSpec((m, m, B), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    stack_spec = pl.BlockSpec(
        (n_sources, m, m, B), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    stack_shape = jax.ShapeDtypeStruct((n_sources, m, m, B), ULr.dtype)
    mat_shape = jax.ShapeDtypeStruct((m, m, B), ULr.dtype)

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[mat_spec] * 4 + [stack_spec] * 2 + [mat_spec] * 2,
        out_specs=[stack_spec, stack_spec, mat_spec, mat_spec],
        out_shape=[stack_shape, stack_shape, mat_shape, mat_shape],
        interpret=impl == "interpret",
    )(Tlr, Tli, THr, THi, ULr, ULi, GLr, GLi)


# ---- fused dense-MNMF model pass ---------------------------------------------
#
# One Wiener/trace pass of dense GaussMNMF needs, per (bin, frame):
# the model covariance R = sum_n Lamb[n] H[n] (+ ridge), its inverse,
# the sandwich M = R^-1 XX R^-1, the per-source traces tr(M H_n) and
# tr(R^-1 H_n), and the Lamb-weighted frame reductions P_n = sum_t
# Lamb R^-1 and Q_n = sum_t Lamb M. Composed from XLA ops this ships
# R, R^-1 and M (~41 MB per plane each) through HBM once per stage —
# the step is HBM-bound even with the Pallas inverse. This kernel
# builds R in VMEM from (Lamb, H), inverts it with the same unrolled
# Gauss-Jordan chain, sandwiches, and reduces to the traces and P/Q in
# registers: HBM sees XX once and the (N, I, Tf) traces once; no
# (I, Tf, m, m) intermediate exists at all. Every contraction is an
# MXU matmul over the flattened (m*m) axis; the grid is one program
# per frequency bin with the whole frame axis in lanes.


def _model_traces_kernel(
    lamb_ref,
    htr_ref,
    hti_ref,
    hfr_ref,
    hfi_ref,
    xr_ref,
    xi_ref,
    t1_ref,
    t2_ref,
    pr_ref,
    pi_ref,
    qr_ref,
    qi_ref,
    aug_ref,
    *,
    m,
    eps,
    tiny,
):
    # lamb: (1, N, B); ht (1, mm, N) = flattened H^T per source (build
    # layout); hf (1, N, mm) (trace layout); x: (1, mm, B) flattened XX.
    # All H inputs are hermitized. Outputs: t1/t2 (1, N, B) traces,
    # p/q (1, N, mm) flattened frame reductions.
    mm = m * m
    f32 = jnp.float32
    lamb = lamb_ref[0]  # (N, B)

    # R_flat[pq, b] = sum_n H[n, pq] lamb[n, b]  (MXU matmul, full f32:
    # R feeds a ridge-level inverse, same hazard class as the traces)
    _hp = jax.lax.Precision.HIGHEST
    Rr_flat = jnp.dot(htr_ref[0], lamb, preferred_element_type=f32, precision=_hp)  # (mm, B)
    Ri_flat = jnp.dot(hti_ref[0], lamb, preferred_element_type=f32, precision=_hp)
    # ridge: + eps on the diagonal (flat positions p*(m+1))
    pq_ids = jax.lax.broadcasted_iota(jnp.int32, Rr_flat.shape, 0)
    Rr_flat = Rr_flat + jnp.where(pq_ids % (m + 1) == 0, eps, 0.0).astype(f32)

    B = Rr_flat.shape[-1]
    Br, Bi = _gj_inverse_lanes(
        aug_ref, Rr_flat.reshape(m, m, B), Ri_flat.reshape(m, m, B), m, tiny
    )
    M1r, M1i = _lane_cmatmul(Br, Bi, xr_ref[0].reshape(m, m, B), xi_ref[0].reshape(m, m, B), m)
    Mr, Mi = _lane_cmatmul(M1r, M1i, Br, Bi, m)

    Br_flat, Bi_flat = Br.reshape(mm, B), Bi.reshape(mm, B)
    Mr_flat, Mi_flat = Mr.reshape(mm, B), Mi.reshape(mm, B)

    # tr(M H_n) = sum_pq M[pq] H_n[pq] (H Hermitian): one matmul per
    # plane. Full-f32 precision: at the Mosaic default (one-pass bf16
    # MXU) the t1/Q outputs carry ~5e-3 relative error per call, which
    # compounds through the multiplicative T/V updates to a 10.6%
    # converged-output delta (round-5 chip audit; 0.0 pinned)
    hp = jax.lax.Precision.HIGHEST
    hfr, hfi = hfr_ref[0], hfi_ref[0]  # (N, mm)
    t1_ref[0] = jnp.dot(hfr, Mr_flat, preferred_element_type=f32, precision=hp) + jnp.dot(
        hfi, Mi_flat, preferred_element_type=f32, precision=hp
    )
    t2_ref[0] = jnp.dot(hfr, Br_flat, preferred_element_type=f32, precision=hp) + jnp.dot(
        hfi, Bi_flat, preferred_element_type=f32, precision=hp
    )

    # P_n = sum_b lamb[n, b] R^-1[:, :, b]; Q_n likewise with M —
    # contractions over the lane axis as dot_general (padded lanes
    # carry lamb = 0, so they are exactly neutral)
    dims = (((1,), (1,)), ((), ()))
    pr_ref[0] = jax.lax.dot_general(lamb, Br_flat, dims, preferred_element_type=f32, precision=hp)
    pi_ref[0] = jax.lax.dot_general(lamb, Bi_flat, dims, preferred_element_type=f32, precision=hp)
    qr_ref[0] = jax.lax.dot_general(lamb, Mr_flat, dims, preferred_element_type=f32, precision=hp)
    qi_ref[0] = jax.lax.dot_general(lamb, Mi_flat, dims, preferred_element_type=f32, precision=hp)


def prepare_xx_lanes(XXr, XXi):
    """Relayout instant covariances for :func:`planar_model_traces_sc`.

    ``(I, Tf, m, m)`` planar pair -> ``(I, m*m, Tfp)`` with the frame
    axis zero-padded to a lane multiple. The relayout ships the full
    ~160 MB covariance tensor through HBM, so callers iterating the
    dense-MNMF step MUST do it once outside the iteration scan and pass
    the result as ``xx_lanes`` (three kernel calls per iteration would
    otherwise each pay it again).
    """
    n_bins, Tf, m, _ = XXr.shape
    pad_t = (-Tf) % 128
    xx_r = jnp.transpose(XXr, (0, 2, 3, 1)).reshape(n_bins, m * m, Tf)
    xx_i = jnp.transpose(XXi, (0, 2, 3, 1)).reshape(n_bins, m * m, Tf)
    if pad_t:
        xx_r = jnp.pad(xx_r, ((0, 0), (0, 0), (0, pad_t)))
        xx_i = jnp.pad(xx_i, ((0, 0), (0, 0), (0, pad_t)))
    return xx_r, xx_i


def planar_model_traces_sc(
    Lamb,
    Hr,
    Hi,
    XXr,
    XXi,
    eps=1e-10,
    impl: str = "auto",
    tiny=1e-20,
    xx_lanes=None,
):
    """Fused dense-MNMF model pass: traces + Lamb-weighted reductions.

    Evaluates, without materializing any ``(I, Tf, m, m)`` intermediate,

    - ``t1[n,i,t] = tr(R^-1 XX R^-1 H_n)`` and ``t2 = tr(R^-1 H_n)``,
    - ``P[n,i] = sum_t Lamb[n,i,t] R^-1`` and ``Q[n,i] = sum_t Lamb M``,

    where ``R = hermitize(sum_n Lamb[n] H_n) + eps I`` per (bin, frame)
    (the ``psd_impl="ridge"`` model of :func:`gauss_mnmf_step_sc`;
    reference math ssspy/bss/mnmf.py:836-1016). ``Lamb``: ``(N, I, Tf)``;
    ``Hr/Hi``: ``(N, I, m, m)``; ``XXr/XXi``: ``(I, Tf, m, m)``. Returns
    ``(t1, t2, Pr, Pi, Qr, Qi)``.

    ``impl="pallas"``/``"interpret"``: the fused VMEM kernel (H is
    hermitized first — a no-op for the algorithm's PSD-projected
    covariances). ``"gj"``: the unfused XLA composition, numerically
    identical to the pre-fusion step code. ``"auto"``: pallas on TPU f32
    when the frame axis fits VMEM, gj elsewhere.

    ``xx_lanes``: optional precomputed :func:`prepare_xx_lanes` output;
    iterating callers pass it to hoist the (I, Tf, m, m) -> lanes
    relayout out of the loop (it costs ~25% of a dense-MNMF iteration
    when repeated per call). ``XXr/XXi`` are still required for the gj
    path (pass them regardless).
    """
    n_src, n_bins, Tf = Lamb.shape
    m = Hr.shape[-1]
    if impl == "auto":
        from .splitc import _on_tpu_backend

        fits = Tf <= 4096 and Lamb.dtype == jnp.float32
        impl = "pallas" if (_on_tpu_backend() and fits) else "gj"

    if impl == "gj":
        from .splitc import _cinv, _cmatmul

        Rr = jnp.einsum("nit,nipq->itpq", Lamb, Hr)
        Ri = jnp.einsum("nit,nipq->itpq", Lamb, Hi)
        Rr = (Rr + jnp.swapaxes(Rr, -1, -2)) / 2
        Ri = (Ri - jnp.swapaxes(Ri, -1, -2)) / 2
        Rr = Rr + eps * jnp.eye(m, dtype=Rr.dtype)
        Br, Bi = _cinv(Rr, Ri)
        M1r, M1i = _cmatmul(Br, Bi, XXr, XXi)
        Mr, Mi = _cmatmul(M1r, M1i, Br, Bi)
        t1 = jnp.einsum("itab,niba->nit", Mr, Hr) - jnp.einsum(
            "itab,niba->nit", Mi, Hi
        )
        t2 = jnp.einsum("itab,niba->nit", Br, Hr) - jnp.einsum(
            "itab,niba->nit", Bi, Hi
        )
        Pr = jnp.einsum("nit,itpq->nipq", Lamb, Br)
        Pi = jnp.einsum("nit,itpq->nipq", Lamb, Bi)
        Qr = jnp.einsum("nit,itpq->nipq", Lamb, Mr)
        Qi = jnp.einsum("nit,itpq->nipq", Lamb, Mi)
        return t1, t2, Pr, Pi, Qr, Qi

    interpret = impl == "interpret"
    mm = m * m
    # hermitize H (exact for the algorithm's PSD-projected covariances)
    Hhr = (Hr + jnp.swapaxes(Hr, -1, -2)) / 2
    Hhi = (Hi - jnp.swapaxes(Hi, -1, -2)) / 2
    # build layout (I, mm, N) and trace layout (I, N, mm)
    hf_r = jnp.transpose(Hhr, (1, 0, 2, 3)).reshape(n_bins, n_src, mm)
    hf_i = jnp.transpose(Hhi, (1, 0, 2, 3)).reshape(n_bins, n_src, mm)
    ht_r = jnp.swapaxes(hf_r, -1, -2)
    ht_i = jnp.swapaxes(hf_i, -1, -2)

    pad_t = (-Tf) % 128
    Tfp = Tf + pad_t
    lamb_l = jnp.transpose(Lamb, (1, 0, 2))  # (I, N, Tf)
    if xx_lanes is None:
        xx_r, xx_i = prepare_xx_lanes(XXr, XXi)
    else:
        xx_r, xx_i = xx_lanes
    if pad_t:
        # zero-padded frames see R = eps I (finite inverse), XX = 0 and
        # lamb = 0 — exactly neutral in every output
        lamb_l = jnp.pad(lamb_l, ((0, 0), (0, 0), (0, pad_t)))

    kernel = functools.partial(_model_traces_kernel, m=m, eps=eps, tiny=tiny)
    spec_lamb = pl.BlockSpec((1, n_src, Tfp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_ht = pl.BlockSpec((1, mm, n_src), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_hf = pl.BlockSpec((1, n_src, mm), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_xx = pl.BlockSpec((1, mm, Tfp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    f32 = Lamb.dtype
    out_shapes = [
        jax.ShapeDtypeStruct((n_bins, n_src, Tfp), f32),  # t1
        jax.ShapeDtypeStruct((n_bins, n_src, Tfp), f32),  # t2
        jax.ShapeDtypeStruct((n_bins, n_src, mm), f32),  # Pr
        jax.ShapeDtypeStruct((n_bins, n_src, mm), f32),  # Pi
        jax.ShapeDtypeStruct((n_bins, n_src, mm), f32),  # Qr
        jax.ShapeDtypeStruct((n_bins, n_src, mm), f32),  # Qi
    ]
    out_specs = [spec_lamb, spec_lamb, spec_hf, spec_hf, spec_hf, spec_hf]

    t1, t2, Pr, Pi, Qr, Qi = pl.pallas_call(
        kernel,
        grid=(n_bins,),
        in_specs=[spec_lamb, spec_ht, spec_ht, spec_hf, spec_hf, spec_xx, spec_xx],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((2 * m, 3 * m, Tfp), f32)],
        interpret=interpret,
    )(lamb_l, ht_r, ht_i, hf_r, hf_i, xx_r, xx_i)

    t1 = jnp.transpose(t1[..., :Tf], (1, 0, 2))
    t2 = jnp.transpose(t2[..., :Tf], (1, 0, 2))
    back = lambda a: jnp.transpose(a.reshape(n_bins, n_src, m, m), (1, 0, 2, 3))
    return t1, t2, back(Pr), back(Pi), back(Qr), back(Qi)


# ---- fused ISS1 sweep --------------------------------------------------------
#
# The ISS1 source sweep is pure elementwise/reduce work, but the XLA
# lowering re-reads the full (N, I, T) spectrogram pair from HBM for
# every one of the N sequential source updates (~60 MB per source at the
# bench workload). Bins are independent given the weights, so the fused
# kernel holds a bin-block of Y VMEM-resident across the WHOLE sweep:
# HBM sees each plane exactly twice (one read, one write).


def _iss1_kernel(yr_ref, yi_ref, phi_ref, or_ref, oi_ref, *, n_sources, eps, phi_has_bins):
    # tiles: (N, Ib, T); phi: (N, Ib, T) or the full (N, T) weights
    yr = yr_ref[:]
    yi = yi_ref[:]
    phi = phi_ref[:]
    if not phi_has_bins:
        phi = phi[:, None, :]

    inv_frames = 1.0 / yr.shape[-1]
    for src in range(n_sources):
        ynr = yr[src]  # (Ib, T)
        yni = yi[src]
        yn2 = ynr**2 + yni**2
        yyr = yr * ynr[None] + yi * yni[None]  # Re(Y conj(y_n))
        yyi = yi * ynr[None] - yr * yni[None]
        num_r = jnp.sum(phi * yyr, axis=-1) * inv_frames  # (N, Ib)
        num_i = jnp.sum(phi * yyi, axis=-1) * inv_frames
        denom = jnp.maximum(jnp.sum(phi * yn2[None], axis=-1) * inv_frames, eps)

        vr = num_r / denom
        vi = num_i / denom
        v_self = 1.0 - 1.0 / jnp.sqrt(denom[src])
        # row select without scatter: Mosaic lowers where + broadcast fine
        row = jax.lax.broadcasted_iota(jnp.int32, vr.shape, 0)
        vr = jnp.where(row == src, v_self[None], vr)
        vi = jnp.where(row == src, 0.0, vi)

        yr = yr - (vr[:, :, None] * ynr[None] - vi[:, :, None] * yni[None])
        yi = yi - (vr[:, :, None] * yni[None] + vi[:, :, None] * ynr[None])

    or_ref[:] = yr
    oi_ref[:] = yi


def iss1_sweep_pallas(
    Yr, Yi, varphi, eps=1e-10, block_bins: int = 16, interpret: bool = False
):
    """Fused ISS1 sweep: ``Y (N, I, T)`` pair + weights ``(N, T)`` or
    ``(N, I, T)`` -> updated pair, one HBM round trip."""
    n_sources, n_bins, n_frames = Yr.shape
    phi_has_bins = varphi.ndim == 3 and varphi.shape[1] == n_bins
    if varphi.ndim == 3 and not phi_has_bins:
        varphi = varphi[:, 0, :]  # (N, 1, T) broadcast form

    kernel = functools.partial(
        _iss1_kernel, n_sources=n_sources, eps=eps, phi_has_bins=phi_has_bins
    )
    y_spec = pl.BlockSpec(
        (n_sources, block_bins, n_frames), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    if phi_has_bins:
        phi_spec = pl.BlockSpec(
            (n_sources, block_bins, n_frames),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        phi_spec = pl.BlockSpec(
            (n_sources, n_frames), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
    out_shape = jax.ShapeDtypeStruct(Yr.shape, Yr.dtype)

    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n_bins, block_bins),),
        in_specs=[y_spec, y_spec, phi_spec],
        out_specs=[y_spec, y_spec],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(Yr, Yi, varphi)


# ---- batched small-matrix symmetric eigh (parallel Jacobi, lanes) -----------
#
# jacobi_eigh's XLA form applies each round's disjoint rotations as a dense
# similarity: three batched (B, n, n) matmuls per round, ~270 of them per
# eigh. At the n <= 32 sizes the split-complex kernels need, those batched
# small matmuls hit the backend's pathological lowering (the dense-MNMF
# finding) and the eigh costs ~1 ms at (257, 16, 16) — the entire prox /
# PSD-projection budget of the PDS/ADMM/HVA and MNMF-family steps. Here the
# whole decomposition runs VMEM-resident in batch-in-lanes layout (n, n, B):
# a Givens rotation touches two rows and two columns, so each round is two
# elementwise FMA passes (rows, then columns) against a statically-permuted
# copy of A built from static slices — no matmuls, no gathers, one HBM round
# trip for the whole eigh.


def _jacobi_lanes_kernel(a_ref, lamb_ref, v_ref, *, n, sweeps, tiny):
    from .jacobi import _round_pairs

    dtype = a_ref.dtype
    B = a_ref.shape[-1]
    rounds = _round_pairs(n)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (row_ids == col_ids).astype(dtype)
    V0 = jnp.broadcast_to(eye[:, :, None], (n, n, B))
    A0 = a_ref[:]

    ones = jnp.ones((1, 1, B), dtype)
    zeros = jnp.zeros((1, 1, B), dtype)

    def one_round(A, V, pairs):
        partner = list(range(n))
        cpiece = [ones] * n
        spiece = [zeros] * n
        for p, q in pairs:
            partner[p], partner[q] = q, p
            app = A[p, p, :]
            aqq = A[q, q, :]
            # symmetrized read: the two-sided FMA updates keep A
            # symmetric only up to roundoff and there is no cheap
            # transpose in this layout
            apq = (A[p, q, :] + A[q, p, :]) * 0.5
            safe_apq = jnp.where(jnp.abs(apq) < tiny, tiny, apq)
            tau = (aqq - app) / (2 * safe_apq)
            # Golub-Van Loan convention: sgn(0) = +1 (see jacobi_eigh)
            sgn = jnp.where(tau >= 0, 1.0, -1.0).astype(dtype)
            t = sgn / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau))
            t = jnp.where(jnp.abs(apq) < tiny, 0.0, t)
            c = 1.0 / jnp.sqrt(1 + t * t)
            s = t * c
            c = c.reshape(1, 1, B)
            s = s.reshape(1, 1, B)
            # J^T A: row p <- c A[p] - s A[q]; row q <- s A[p] + c A[q]
            # (A J on columns has the same coefficients)
            cpiece[p], cpiece[q] = c, c
            spiece[p], spiece[q] = -s, s

        Crow = jnp.concatenate(cpiece, axis=0)  # (n, 1, B)
        Srow = jnp.concatenate(spiece, axis=0)
        Ccol = jnp.concatenate(cpiece, axis=1)  # (1, n, B)
        Scol = jnp.concatenate(spiece, axis=1)

        Aperm = jnp.concatenate([A[j : j + 1] for j in partner], axis=0)
        A = Crow * A + Srow * Aperm
        Aperm = jnp.concatenate([A[:, j : j + 1, :] for j in partner], axis=1)
        A = Ccol * A + Scol * Aperm
        Vperm = jnp.concatenate([V[:, j : j + 1, :] for j in partner], axis=1)
        V = Ccol * V + Scol * Vperm
        return A, V

    def one_sweep(_, AV):
        A, V = AV
        for pairs in rounds:
            A, V = one_round(A, V, pairs)
        return A, V

    A, V = jax.lax.fori_loop(0, sweeps, one_sweep, (A0, V0))

    lamb_ref[:] = jnp.concatenate([A[i, i : i + 1, :] for i in range(n)], axis=0)
    v_ref[:] = V


def jacobi_eigh_lanes(
    A, sweeps: int = 6, tiny: float = 1e-30, block_b: int = None, interpret=False
):
    """Batched symmetric eigh ``(..., n, n) -> (lamb, V)`` — Pallas path.

    Same fixed-sweep parallel-cyclic-Jacobi iteration as
    :func:`ssspy_tpu.ops.jacobi.jacobi_eigh` (ascending eigenvalues,
    orthonormal columns); rotations applied as VMEM-resident lane FMAs
    instead of batched small matmuls. Numerics differ from the xla form
    only by FMA association order.
    """
    batch_shape = A.shape[:-2]
    n = A.shape[-1]
    if block_b is None:
        block_b = 512 if n <= 16 else 128
    if interpret:
        block_b = min(block_b, 128)
    A2 = A.reshape(-1, n, n)
    n_batch = A2.shape[0]
    pad = (-n_batch) % block_b
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        A2 = jnp.concatenate([A2, eye], axis=0)
    total = A2.shape[0]
    A_l = jnp.transpose(A2, (1, 2, 0))  # (n, n, B): batch in lanes

    kernel = functools.partial(_jacobi_lanes_kernel, n=n, sweeps=sweeps, tiny=tiny)
    mat_spec = pl.BlockSpec(
        (n, n, block_b), lambda b: (0, 0, b), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((n, block_b), lambda b: (0, b), memory_space=pltpu.VMEM)

    lamb_l, V_l = pl.pallas_call(
        kernel,
        grid=(total // block_b,),
        in_specs=[mat_spec],
        out_specs=[vec_spec, mat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, total), A.dtype),
            jax.ShapeDtypeStruct((n, n, total), A.dtype),
        ],
        interpret=interpret,
    )(A_l)

    lamb = jnp.transpose(lamb_l, (1, 0))[:n_batch]  # (batch, n)
    V = jnp.transpose(V_l, (2, 0, 1))[:n_batch]  # (batch, n, n)
    order = jnp.argsort(lamb, axis=-1)
    lamb = jnp.take_along_axis(lamb, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return lamb.reshape(*batch_shape, n), V.reshape(*batch_shape, n, n)
