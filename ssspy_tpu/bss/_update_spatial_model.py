"""Shared demixing-filter / separated-spectrogram update kernels.

Parity targets: ssspy/bss/_update_spatial_model.py:17-645 (IP1, IP2, ISS1,
ISS2, IPA, block-decomposition VCD). These are the hot kernels of the whole
framework: every auxiliary-function method calls one of them once per outer
iteration.

TPU-native design decisions:

- The per-source / per-pair sweeps are *mathematically* sequential (later
  sources must see earlier updates), so the source loop is kept — but
  unrolled at trace time (N <= 8 for audio), with every inner operation
  batched over the full frequency-bin axis. Each sweep compiles to one XLA
  program whose inner ops are (n_bins, M, M)-batched solves / closed-form
  2x2 GEVDs that tile onto the MXU/VPU.
- ISS2's split/concatenate choreography is replaced by static gather
  indices computed at trace time (no O(N) memory shuffles per pair).
- All flooring is user-swappable, mirroring the reference's safety model.
"""

import functools
from typing import Callable, Iterable, Optional, Tuple

import jax.numpy as jnp
from jax import lax

from ..linalg._solve import solve
from ..linalg.eigh import eigh2
from ..linalg.inv import inv2
from ..linalg.lqpqm import lqpqm2
from ..special.flooring import EPS, identity, max_flooring
from ..special.psd import to_psd
from ..utils.select_pair import sequential_pair_selector

__all__ = [
    "update_by_ip1",
    "update_by_ip2",
    "update_by_ip2_one_pair",
    "update_by_iss1",
    "update_by_iss2",
    "update_by_ipa",
    "update_by_block_decomposition_vcd",
]


def update_by_ip1(
    demix_filter,
    weighted_covariance,
    flooring_fn: Optional[Callable] = functools.partial(max_flooring, eps=EPS),
    overwrite: bool = True,
):
    """Iterative-projection (IP1) sweep over sources.

    ``demix_filter``: ``(n_bins, n_sources, n_channels)``;
    ``weighted_covariance``: ``(n_bins, n_sources, n_channels, n_channels)``.
    Each source update solves ``(W U_n) w = e_n`` batched over bins, then
    normalizes by ``sqrt(w^H U_n w)``. Later sources see earlier updates.
    """
    if flooring_fn is None:
        flooring_fn = identity

    W = jnp.asarray(demix_filter)
    U = jnp.asarray(weighted_covariance)
    n_bins, n_sources, n_channels = W.shape

    E = jnp.eye(n_sources, n_channels, dtype=W.dtype)

    for src_idx in range(n_sources):
        U_n = U[:, src_idx]  # (n_bins, M, M)
        e_n = jnp.broadcast_to(E[src_idx], (n_bins, n_channels))

        WU = W @ U_n
        w_n = solve(WU, e_n)  # (n_bins, M)
        wUw = jnp.einsum("bm,bmn,bn->b", w_n.conj(), U_n, w_n).real
        denom = flooring_fn(jnp.sqrt(jnp.maximum(wUw, 0)))
        w_n_Hermite = w_n.conj() / denom[:, None].astype(W.dtype)
        W = W.at[:, src_idx].set(w_n_Hermite)

    return W


def update_by_ip2(
    demix_filter,
    weighted_covariance,
    flooring_fn: Optional[Callable] = functools.partial(max_flooring, eps=EPS),
    pair_selector: Optional[Callable[[int], Iterable[Tuple[int, int]]]] = None,
    overwrite: bool = True,
):
    """Pairwise iterative projection (IP2) over a trace-time pair schedule."""
    if flooring_fn is None:
        flooring_fn = identity
    if pair_selector is None:
        pair_selector = sequential_pair_selector

    W = jnp.asarray(demix_filter)
    U = jnp.asarray(weighted_covariance)
    n_sources = W.shape[1]

    for m, n in pair_selector(n_sources):
        pair = (m, n)
        W_mn = update_by_ip2_one_pair(
            W, U[:, pair, :, :], pair=pair, flooring_fn=flooring_fn
        )
        W = W.at[:, pair, :].set(W_mn)

    return W


def update_by_ip2_one_pair(
    demix_filter,
    weighted_covariance_pair,
    pair: Tuple[int, int],
    flooring_fn: Optional[Callable] = functools.partial(max_flooring, eps=EPS),
):
    """One IP2 pair update via closed-form 2x2 GEVD of ``P^H U P``.

    ``weighted_covariance_pair``: ``(n_bins, 2, n_channels, n_channels)``.
    Returns the updated filter rows ``(n_bins, 2, n_channels)``.
    """
    if flooring_fn is None:
        flooring_fn = identity

    m, n = pair
    W = jnp.asarray(demix_filter)
    U_pair = jnp.asarray(weighted_covariance_pair)
    U_m, U_n = U_pair[:, 0], U_pair[:, 1]

    n_bins, n_sources, n_channels = W.shape

    E = jnp.eye(n_channels, n_sources, dtype=W.dtype)
    E_mn = jnp.broadcast_to(E[:, (m, n)], (n_bins, n_channels, 2))

    P_m = solve(W @ U_m, E_mn)  # (n_bins, M, 2)
    P_n = solve(W @ U_n, E_mn)

    PUP_m = jnp.swapaxes(P_m, -2, -1).conj() @ U_m @ P_m  # (n_bins, 2, 2)
    PUP_n = jnp.swapaxes(P_n, -2, -1).conj() @ U_n @ P_n

    _, H_mn = eigh2(PUP_m, PUP_n)
    H_mn = H_mn[..., ::-1]  # descending eigenvalue order

    h_m, h_n = H_mn[..., 0], H_mn[..., 1]  # (n_bins, 2) each

    def _normalize(h, PUP):
        hUh = jnp.einsum("bp,bpq,bq->b", h.conj(), PUP, h).real
        denom = flooring_fn(jnp.sqrt(jnp.maximum(hUh, 0)))
        return h / denom[:, None].astype(h.dtype)

    h_m = _normalize(h_m, PUP_m)
    h_n = _normalize(h_n, PUP_n)

    w_m = (P_m @ h_m[..., None])[..., 0]  # (n_bins, M)
    w_n = (P_n @ h_n[..., None])[..., 0]

    return jnp.stack([w_m.conj(), w_n.conj()], axis=1)


def update_by_iss1(
    separated,
    weight,
    flooring_fn: Optional[Callable] = functools.partial(max_flooring, eps=EPS),
):
    """Iterative source steering: rank-1 updates of Y (no demixing matrix).

    ``separated`` / ``weight``: ``(n_sources, n_bins, n_frames)``. Pure
    elementwise/reduction ops — ideal VPU fit; the source sweep is
    sequential by construction.
    """
    if flooring_fn is None:
        flooring_fn = identity

    Y = jnp.asarray(separated)
    varphi = jnp.asarray(weight)
    n_sources = Y.shape[0]

    for src_idx in range(n_sources):
        Y_n = Y[src_idx]  # (n_bins, n_frames)
        YY_n_conj = Y * Y_n.conj()
        YY_n = jnp.abs(Y_n) ** 2
        num = jnp.mean(varphi * YY_n_conj, axis=-1)  # (N, n_bins)
        denom = flooring_fn(jnp.mean(varphi * YY_n, axis=-1))
        v_n = num / denom.astype(num.dtype)
        v_self = 1 - 1 / jnp.sqrt(denom[src_idx]).astype(num.dtype)
        v_n = v_n.at[src_idx].set(v_self)
        Y = Y - v_n[:, :, None] * Y_n

    return Y


def update_by_iss2(
    separated,
    weight,
    flooring_fn: Optional[Callable] = functools.partial(max_flooring, eps=EPS),
    pair_selector: Optional[Callable[[int], Iterable[Tuple[int, int]]]] = None,
):
    """Pairwise iterative source steering with static gather indices.

    The reference shuffles Y with ``np.split``/``concatenate`` per pair
    (ssspy/bss/_update_spatial_model.py:240-314); here the main pair and the
    complement are addressed by trace-time index tuples and written back
    with one scatter per pair.
    """
    Y = jnp.asarray(separated)
    varphi = jnp.asarray(weight)
    n_sources = Y.shape[0]

    if flooring_fn is None:
        flooring_fn = identity
    if pair_selector is None:
        pair_selector = functools.partial(sequential_pair_selector, stop=n_sources, step=2)

    for m, n in pair_selector(n_sources):
        m = n_sources + m if m < 0 else m
        n = n_sources + n if n < 0 else n
        lo, hi = (m, n) if m < n else (n, m)
        main_idx = (m, n)  # preserves caller order (descending pairs allowed)
        sub_idx = tuple(k for k in range(n_sources) if k != lo and k != hi)

        Y_main = Y[main_idx, :, :]  # (2, I, T)
        varphi_main = varphi[main_idx, :, :]
        Y_sub = Y[sub_idx, :, :]  # (N-2, I, T)
        varphi_sub = varphi[sub_idx, :, :]

        # pairwise stats, bins-first layout
        # YY_main[i, a, b, t] = Y_main[a, i, t] * conj(Y_main[b, i, t])
        YY_main = jnp.einsum("ait,bit->iabt", Y_main, Y_main.conj())
        # G[s, i, a, b] = mean_t varphi_sub[s, i, t] * YY_main[i, a, b, t]
        G_sub = jnp.einsum("sit,iabt->siab", varphi_sub, YY_main) / Y.shape[-1]
        # F[s, i, a] = mean_t varphi_sub[s, i, t] * Y_main[a, i, t] * conj(Y_sub[s, i, t])
        F = jnp.einsum("sit,ait,sit->sia", varphi_sub, Y_main, Y_sub.conj()) / Y.shape[-1]

        Q = -(inv2(G_sub) @ F[..., None])[..., 0]  # (S, I, 2)
        # Y_sub += sum_a conj(Q[s, i, a]) * Y_main[a, i, t]
        Y_sub = Y_sub + jnp.einsum("sia,ait->sit", Q.conj(), Y_main)

        # main update: 2x2 GEVD of weighted pair covariances
        G_main = jnp.einsum("cit,iabt->ciab", varphi_main, YY_main) / Y.shape[-1]
        G_m, G_n = G_main[0], G_main[1]  # (I, 2, 2)
        _, H_mn = eigh2(G_m, G_n)  # columns ascending
        # channel c of the pair takes eigenvector column c (ascending order)
        h = jnp.moveaxis(H_mn, -1, 0)  # (2, I, 2)
        hGh = jnp.einsum("cia,ciab,cib->ci", h.conj(), G_main, h).real
        denom = flooring_fn(jnp.sqrt(jnp.maximum(hGh, 0)))
        P = h / denom[..., None].astype(h.dtype)  # (2, I, 2)
        Y_main = jnp.einsum("cia,ait->cit", P.conj(), Y_main)

        Y = Y.at[main_idx, :, :].set(Y_main)
        Y = Y.at[sub_idx, :, :].set(Y_sub)

    return Y


def update_by_ipa(
    separated,
    weight,
    normalization: bool = True,
    flooring_fn: Optional[Callable] = functools.partial(max_flooring, eps=EPS),
    max_iter: int = 1,
):
    """Iterative projection with adjustment (IPA).

    Per source: build the PSD-projected weighted covariance stack, reduce to
    an LQPQM type-2 subproblem (:func:`ssspy_tpu.linalg.lqpqm2`), and apply
    the resulting rank-1 + diagonal update to Y. Source sweep unrolled at
    trace time; everything inside is batched over bins.
    """
    if flooring_fn is None:
        flooring_fn = identity

    Y = jnp.asarray(separated)
    varphi = jnp.asarray(weight)
    n_sources = Y.shape[0]
    n_frames = Y.shape[-1]

    E = jnp.eye(n_sources, dtype=Y.dtype)

    for source_idx in range(n_sources):
        # U_tilde[i, s, a, b] = mean_t varphi[s,i,t] Y[a,i,t] conj(Y[b,i,t])
        U_tilde = jnp.einsum("sit,ait,bit->isab", varphi, Y, Y.conj()) / n_frames
        U_tilde = to_psd(U_tilde, flooring_fn=flooring_fn)

        others = tuple(k for k in range(n_sources) if k != source_idx)
        E_n = E[:, others]  # (N, N-1)
        e_n = E[:, source_idx]  # (N,)

        U_tilde_n = U_tilde[:, source_idx]  # (I, N, N)
        U_tilde_n_inverse = _psd_inv(U_tilde_n, flooring_fn=flooring_fn)
        a_n = U_tilde[:, :, source_idx, source_idx].real  # (I, N)
        a_n = a_n @ E_n.real  # (I, N-1) — select others
        b_n = jnp.diagonal(U_tilde[:, :, source_idx, :], axis1=-2, axis2=-1)  # (I, N)
        b_n = b_n @ E_n  # (I, N-1)
        d_full = jnp.swapaxes(E_n, 0, 1)[None] @ U_tilde_n_inverse.conj()  # (I, N-1, N)
        C_n = d_full @ E_n  # (I, N-1, N-1)
        d_n = d_full[:, :, source_idx]  # (I, N-1)

        Cd_n = solve(C_n, d_n)  # (I, N-1)
        dCd_n = jnp.sum(d_n.conj() * Cd_n, axis=-1).real
        eUe_n = U_tilde_n_inverse[:, source_idx, source_idx].real
        z_n = eUe_n - dCd_n

        a_sqrt_n = jnp.sqrt(a_n)  # (I, N-1), real
        aa_n = a_sqrt_n[:, :, None] * a_sqrt_n[:, None, :]
        H_n = C_n / aa_n.astype(C_n.dtype)
        v_n = -b_n / a_sqrt_n.astype(b_n.dtype) - a_sqrt_n.astype(b_n.dtype) * Cd_n

        if normalization:
            trace = jnp.trace(H_n, axis1=-2, axis2=-1).real
            H_n = H_n / trace[..., None, None].astype(H_n.dtype)
            z_n = z_n / trace

        q_check_n = lqpqm2(
            H_n,
            v_n,
            z_n,
            flooring_fn=flooring_fn,
            singular_fn=lambda x: x < flooring_fn(jnp.zeros((), dtype=x.dtype)),
            max_iter=max_iter,
        )

        q_n = q_check_n / a_sqrt_n.astype(q_check_n.dtype) - b_n / a_n.astype(b_n.dtype)

        Eq_n = q_n.conj() @ jnp.swapaxes(E_n, 0, 1)  # (I, N)
        q_tilde_n = e_n[None] - Eq_n  # (I, N)

        Uq_n = solve(U_tilde_n, q_tilde_n)  # (I, N)
        qUq_n = jnp.sum(q_tilde_n.conj() * Uq_n, axis=-1, keepdims=True).real
        denom = flooring_fn(jnp.sqrt(jnp.maximum(qUq_n, 0)))
        p_n = Uq_n / denom.astype(Uq_n.dtype)  # (I, N)

        Y_n = Y[source_idx]  # (I, T)
        # PY[i, t] = sum_s conj(p_n[i, s]) Y[s, i, t]
        PY_n = jnp.einsum("is,sit->it", p_n.conj(), Y)
        PY_n = e_n[:, None, None] * (PY_n - Y_n)[None]  # (N, I, T), row n only
        QY_n = jnp.swapaxes(Eq_n, 0, 1)[:, :, None] * Y_n[None]  # (N, I, T)

        Y = Y + PY_n + QY_n

    return Y


def update_by_block_decomposition_vcd(
    demix_filter,
    weighted_covariance,
    singular_fn: Optional[Callable] = None,
    overwrite: bool = True,
):
    """Vector-wise coordinate descent for block-decomposed IPSDTA.

    ``demix_filter``: ``(n_blocks, n_neighbors, n_sources, n_channels)``;
    ``weighted_covariance``: ``(n_blocks, n_neighbors, n_neighbors,
    n_sources, n_channels, n_channels)``. The (neighbor, source) sweep is
    sequential; the neighbor loop runs as ``lax.fori_loop`` with the source
    loop unrolled, and all solves batched over blocks.
    """
    if singular_fn is None:
        def singular_fn(x):
            return x == 0

    W = jnp.asarray(demix_filter)
    RXX = jnp.asarray(weighted_covariance)
    U = jnp.diagonal(RXX, axis1=1, axis2=2)  # (B, S, M, M, J) -- neighbor diag last
    n_blocks, n_neighbors, n_sources, n_channels = W.shape

    E_i = jnp.eye(n_neighbors, dtype=W.real.dtype)
    E_n = jnp.eye(n_sources, dtype=W.dtype)

    def neighbor_body(neighbor_idx, W):
        pad_mask_i = 1 - E_i[neighbor_idx]  # (J,)
        U_i = jnp.moveaxis(U, -1, 0)[neighbor_idx]  # (B, S, M, M)
        RXX_i = RXX[:, neighbor_idx]  # (B, J, S, M, M)

        for source_idx in range(n_sources):
            e_n = jnp.broadcast_to(E_n[source_idx], (n_blocks, n_sources))
            U_in = U_i[:, source_idx]  # (B, M, M)
            RXX_in = RXX_i[:, :, source_idx]  # (B, J, M, M)
            w_n_conj = W[:, :, source_idx, :].conj()  # (B, J, M)

            RXY_in = (RXX_in @ w_n_conj[..., None])[..., 0]  # (B, J, M)
            gamma_in = jnp.sum(
                pad_mask_i[None, :, None].astype(RXY_in.dtype) * RXY_in, axis=1
            )  # (B, M)

            W_i = lax.dynamic_index_in_dim(W, neighbor_idx, axis=1, keepdims=False)
            WU_in = W_i @ U_in  # (B, S, M)... W_i: (B, S, M)
            eta_in = solve(WU_in, e_n)  # (B, M)
            eta_hat_in = solve(U_in, gamma_in)  # (B, M)
            eta_U_in = eta_in[:, None, :].conj() @ U_in  # (B, 1, M)

            xi_in = (eta_U_in @ eta_in[:, :, None])[..., 0, 0].real
            xi_in = jnp.maximum(xi_in, 0)
            xi_hat_in = (eta_U_in @ eta_hat_in[:, :, None])[..., 0, 0]

            singular = singular_fn(xi_hat_in)
            xi_hat_safe = jnp.where(singular, jnp.ones_like(xi_hat_in), xi_hat_in)

            coeff = (xi_hat_safe / (2 * xi_in).astype(xi_hat_safe.dtype)) * (
                1 - jnp.sqrt(1 + 4 * xi_in / jnp.abs(xi_hat_safe) ** 2)
            ).astype(xi_hat_safe.dtype)
            coeff_singular = (1 / jnp.sqrt(xi_in)).astype(coeff.dtype)
            coeff = jnp.where(singular, coeff_singular, coeff)

            w_in = coeff[:, None] * eta_in - eta_hat_in
            W = lax.dynamic_update_slice(
                W,
                w_in.conj()[:, None, None, :],
                (0, neighbor_idx, source_idx, 0),
            )

        return W

    return lax.fori_loop(0, n_neighbors, neighbor_body, W)


def _psd_inv(
    X,
    flooring_fn: Optional[Callable] = functools.partial(max_flooring, eps=EPS),
):
    """Inverse of PSD matrices via floored eigendecomposition."""
    if flooring_fn is None:
        flooring_fn = identity

    lamb, P = jnp.linalg.eigh(X)
    PH = jnp.swapaxes(P, -2, -1)
    if jnp.iscomplexobj(X):
        PH = PH.conj()
    lamb_inv = (1 / flooring_fn(lamb)).astype(P.dtype)
    return (P * lamb_inv[..., None, :]) @ PH
