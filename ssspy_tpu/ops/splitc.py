"""Split-complex (planar real/imaginary) kernels for the TPU fast path.

TPU MXUs have no complex datapath: XLA lowers every complex matmul to
real matmuls anyway, and some TPU runtimes (including the axon PJRT
backend this project benches on) reject complex dtypes outright. The
fast path therefore carries complex tensors as a leading length-2 real
axis ``[real, imag]`` and expresses the per-iteration AuxIVA math —
demixing, the weighted covariance, and the IP1 sweep — as pure f32
einsum/solve kernels. Numerically identical to the complex64 path
(see tests/ops/test_splitc.py).

The complex M x M solve becomes one real 2M x 2M solve via the
standard block embedding ``[[Ar, -Ai], [Ai, Ar]] [xr; xi] = [br; bi]``.
"""

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "to_split",
    "from_split",
    "block_embed",
    "csolve",
    "auxiva_ip1_step_sc",
]


def to_split(x):
    """Complex array -> real array with leading [real, imag] axis."""
    x = np.asarray(x)
    return np.stack([x.real, x.imag], axis=0).astype(np.float32)


def from_split(xs):
    """Real ``(2, ...)`` array -> complex array."""
    xs = np.asarray(xs)
    return xs[0] + 1j * xs[1]


def block_embed(Ar, Ai):
    """``(..., M, M)`` pair -> real ``(..., 2M, 2M)`` block matrix."""
    top = jnp.concatenate([Ar, -Ai], axis=-1)
    bot = jnp.concatenate([Ai, Ar], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def csolve(Ar, Ai, br, bi):
    """Solve complex ``A x = b`` with planar operands.

    ``A``: ``(..., M, M)`` pair; ``b``: ``(..., M)`` pair. Returns the
    ``(xr, xi)`` pair via one real ``2M x 2M`` batched solve.
    """
    A2 = block_embed(Ar, Ai)
    b2 = jnp.concatenate([br, bi], axis=-1)
    x2 = jnp.linalg.solve(A2, b2[..., None])[..., 0]
    n = br.shape[-1]
    return x2[..., :n], x2[..., n:]


def _csep(Wr, Wi, Xr, Xi):
    """Planar demixing ``y = W x``: (I,N,M) x (M,I,T) -> (N,I,T) pair."""
    Yr = jnp.einsum("inm,mit->nit", Wr, Xr) - jnp.einsum("inm,mit->nit", Wi, Xi)
    Yi = jnp.einsum("inm,mit->nit", Wr, Xi) + jnp.einsum("inm,mit->nit", Wi, Xr)
    return Yr, Yi


def auxiva_ip1_step_sc(Xs, Ws, eps=1e-10):
    """One AuxIVA-IP1 iteration in split-complex form.

    ``Xs``: mixture ``(2, M, I, T)`` f32; ``Ws``: demixing ``(2, I, N, M)``
    f32. Same math as :func:`ssspy_tpu.parallel.auxiva_ip1_step`
    (reference ssspy/bss/iva.py:1736-1793) with every complex op
    decomposed into real einsums feeding the MXU.
    """
    Xr, Xi = Xs[0], Xs[1]
    Wr, Wi = Ws[0], Ws[1]
    n_frames = Xr.shape[-1]

    Yr, Yi = _csep(Wr, Wi, Xr, Xi)
    norm = jnp.sqrt(jnp.sum(Yr**2 + Yi**2, axis=1))  # (N, T)
    varphi = 1.0 / jnp.maximum(norm, eps)

    # U[i,n] = E[varphi x x^H]; Hermitian: Ur symmetric, Ui antisymmetric
    Ur = (
        jnp.einsum("nt,pit,qit->inpq", varphi, Xr, Xr)
        + jnp.einsum("nt,pit,qit->inpq", varphi, Xi, Xi)
    ) / n_frames
    Ui = (
        jnp.einsum("nt,pit,qit->inpq", varphi, Xi, Xr)
        - jnp.einsum("nt,pit,qit->inpq", varphi, Xr, Xi)
    ) / n_frames

    n_bins, n_sources, n_channels = Wr.shape

    def body(src, carry):
        Wr, Wi = carry
        Urn = lax.dynamic_index_in_dim(Ur, src, axis=1, keepdims=False)  # (I, M, M)
        Uin = lax.dynamic_index_in_dim(Ui, src, axis=1, keepdims=False)

        # WU = W @ U_n per bin (complex product of planar parts)
        Ar = Wr @ Urn - Wi @ Uin  # (I, N, M)
        Ai = Wr @ Uin + Wi @ Urn

        e_n = jnp.zeros((n_channels,), Wr.dtype).at[src].set(1.0)
        br = jnp.broadcast_to(e_n, (n_bins, n_channels))
        bi = jnp.zeros_like(br)
        wr, wi = csolve(Ar, Ai, br, bi)  # (I, M) pair

        # z = U_n w;  w^H U_n w = wr.zr + wi.zi (real by Hermitian symmetry)
        zr = (Urn @ wr[..., None])[..., 0] - (Uin @ wi[..., None])[..., 0]
        zi = (Urn @ wi[..., None])[..., 0] + (Uin @ wr[..., None])[..., 0]
        wUw = jnp.sum(wr * zr + wi * zi, axis=-1)
        denom = jnp.maximum(jnp.sqrt(jnp.maximum(wUw, 0.0)), eps)[:, None]

        # w_n <- conj(w) / sqrt(w^H U w)
        Wr = lax.dynamic_update_slice(Wr, (wr / denom)[:, None, :], (0, src, 0))
        Wi = lax.dynamic_update_slice(Wi, (-wi / denom)[:, None, :], (0, src, 0))
        return Wr, Wi

    Wr, Wi = lax.fori_loop(0, n_sources, body, (Wr, Wi))
    return jnp.stack([Wr, Wi], axis=0)
