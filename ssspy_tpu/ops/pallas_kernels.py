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

__all__ = ["weighted_covariance_sc"]

# beyond this many frames the per-program tiles ((block_bins, M, T) x2 in
# f32 plus weights/outputs) approach the ~16 MB/core VMEM budget; the
# einsum path takes over (correct for any length, ~2x slower on the op)
_MAX_FRAMES_VMEM = 16384


def _wcov_kernel(
    xr_ref, xi_ref, phi_ref, ur_ref, ui_ref, *, inv_frames, n_sources, cast=None
):
    # xr/xi: (Ib, M, T) bins-major tiles; phi: full (N, T) weights.
    # One program per bin-block: the X tile is read into VMEM once and
    # reused for every source and all four real contractions — the HBM
    # saving XLA's per-einsum lowering does not get.
    # ``cast=bfloat16`` feeds the MXU in bf16 with f32 accumulation.
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
        phi = phi_ref[n, :]
        if cast is not None:
            phi = phi.astype(cast)
        xr_s = xr * phi[None, None, :]
        xi_s = xi * phi[None, None, :]
        ur_ref[:, n] = (bdot(xr_s, xr) + bdot(xi_s, xi)) * inv_frames
        ui_ref[:, n] = (bdot(xi_s, xr) - bdot(xr_s, xi)) * inv_frames


def _wcov_pallas(
    Xr, Xi, varphi, block_bins: int = 8, interpret: bool = False, cast=None
):
    """``(M, I, T)`` planar mixture + ``(N, T)`` weights -> (I, N, M, M) pair."""
    n_channels, n_bins, n_frames = Xr.shape
    n_sources = varphi.shape[0]

    # bins-major layout so the bin axis is the GEMM batch dimension
    Xr_b = jnp.swapaxes(Xr, 0, 1)  # (I, M, T)
    Xi_b = jnp.swapaxes(Xi, 0, 1)

    grid = (pl.cdiv(n_bins, block_bins),)
    kernel = functools.partial(
        _wcov_kernel, inv_frames=1.0 / n_frames, n_sources=n_sources, cast=cast
    )

    out_shape = jax.ShapeDtypeStruct(
        (n_bins, n_sources, n_channels, n_channels), jnp.float32
    )
    x_spec = pl.BlockSpec(
        (block_bins, n_channels, n_frames),
        lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
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
    Ur = (
        jnp.einsum("nt,pit,qit->inpq", varphi, Xr, Xr)
        + jnp.einsum("nt,pit,qit->inpq", varphi, Xi, Xi)
    ) / n_frames
    Ui = (
        jnp.einsum("nt,pit,qit->inpq", varphi, Xi, Xr)
        - jnp.einsum("nt,pit,qit->inpq", varphi, Xr, Xi)
    ) / n_frames
    return Ur, Ui


def weighted_covariance_sc(Xr, Xi, varphi, impl: str = "auto"):
    """Split-complex weighted covariance ``(Ur, Ui)`` of shape (I, N, M, M).

    ``impl``: ``"pallas"`` (fused TPU kernel), ``"pallas_bf16"`` (fused
    kernel with bf16 MXU inputs + f32 accumulation), ``"einsum"`` (XLA),
    ``"interpret"``/``"interpret_bf16"`` (Pallas interpreter, for tests),
    or ``"auto"`` (pallas on TPU backends, einsum elsewhere).
    """
    if impl == "auto":
        # the kernel lowers only on TPU targets ("tpu" proper and the
        # axon PJRT tunnel); GPUs and CPUs take the XLA einsum path
        on_tpu = jax.default_backend() in ("tpu", "axon")
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
