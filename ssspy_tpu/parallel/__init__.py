"""Device-mesh scaling for BSS separation runs.

The reference (ssspy) is single-process NumPy; its only "parallelism" is
vectorization over frequency bins (SURVEY.md §2.7). On TPU the same math
scales over a 2-D :class:`jax.sharding.Mesh`:

- ``dp`` axis — data parallelism over an utterance batch (a new leading
  axis the reference does not have; it amortizes compilation and feeds
  the MXU, since demixing matrices are tiny M<=8),
- ``bin`` axis — sequence-style parallelism over the frequency axis:
  every per-bin demixing update (IP1/IP2/ISS/ILRMA/...) is independent
  across bins, so the inner loop needs **zero collectives**; only loss
  reductions cross shards (XLA inserts ``psum`` over ICI automatically).

Tensor/pipeline/expert parallelism are intentionally absent: there is no
tensor large enough to split (cf. SURVEY.md §2.7 checklist).
"""

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_spec",
    "shard_batched_run",
    "shard_state_run",
    "shard_pytree_run",
    "batched_auxiva_ip1_step",
    "make_batched_auxiva_runner",
    "batched_auxiva_ip1_step_sc",
    "make_batched_auxiva_runner_sc",
    "batched_auxiva_ip2_step_sc",
    "make_batched_auxiva_ip2_runner_sc",
    "batched_auxiva_iss1_step_sc",
    "make_batched_auxiva_iss1_runner_sc",
    "batched_gauss_ilrma_ip1_step_sc",
    "make_batched_ilrma_runner_sc",
    "make_batched_auxiva_wave_runner_sc",
]


def make_mesh(
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = ("dp", "bin"),
    shape: Optional[Tuple[int, int]] = None,
) -> Mesh:
    """Build a 2-D ``(dp, bin)`` mesh over the available devices.

    With ``shape=None`` the device count is factorized as evenly as
    possible (e.g. 8 -> (2, 4), 4 -> (2, 2), 1 -> (1, 1)).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        dp = 1
        for cand in range(int(np.sqrt(n)), 0, -1):
            if n % cand == 0:
                dp = cand
                break
        shape = (dp, n // dp)
    assert shape[0] * shape[1] == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_spec(mesh: Mesh, *, bin_axis: int, ndim: int) -> P:
    """PartitionSpec for a batched spectrogram-like array: leading axis on
    ``dp``, ``bin_axis`` on ``bin``, everything else replicated."""
    names = [None] * ndim
    names[0] = mesh.axis_names[0]
    names[bin_axis] = mesh.axis_names[1]
    return P(*names)


def _laplace_weight(Y, eps=1e-10):
    """AuxIVA super-Gaussian MM weight ``G'(||y||)/(2||y||)`` (Laplace)."""
    norm = jnp.linalg.norm(Y, axis=-2)  # (N, T) over bins
    return 1.0 / jnp.maximum(norm, eps)


def auxiva_ip1_step(X, W, eps=1e-10):
    """One AuxIVA-IP1 iteration for a single utterance.

    ``X``: mixture ``(M, I, T)``; ``W``: demixing ``(I, N, M)``.
    Weighted covariance + sequential IP sweep — the per-iteration hot
    path (reference ssspy/bss/iva.py:1736-1793), expressed as batched
    einsum/solve over the full bin axis so XLA tiles it onto the MXU.
    """
    Y = jnp.einsum("inm,mit->nit", W, X)
    varphi = _laplace_weight(Y, eps)  # (N, T)
    n_frames = X.shape[-1]
    U = jnp.einsum("nt,pit,qit->inpq", varphi.astype(X.dtype), X, X.conj()) / n_frames

    n_sources, n_channels = W.shape[-2], W.shape[-1]
    E = jnp.eye(n_sources, n_channels, dtype=W.dtype)

    def body(src, W):
        U_n = U[:, src]  # (I, M, M)
        e_n = jnp.broadcast_to(E[src], (W.shape[0], n_channels))
        w = jnp.linalg.solve(W @ U_n, e_n[..., None])[..., 0]
        wUw = jnp.einsum("bm,bmn,bn->b", w.conj(), U_n, w).real
        w = w.conj() / jnp.sqrt(jnp.maximum(wUw, eps))[:, None].astype(W.dtype)
        return lax.dynamic_update_slice(W, w[:, None, :], (0, src, 0))

    W = lax.fori_loop(0, n_sources, body, W)
    return W


batched_auxiva_ip1_step = jax.vmap(auxiva_ip1_step, in_axes=(0, 0))


def shard_batched_run(
    mesh: Mesh,
    step_fn: Callable,
    *,
    x_bin_axis: int = 2,
    w_bin_axis: int = 1,
    ndim: int = 4,
) -> Callable:
    """Jit ``run(X, W, n_iter)`` with ``(dp, bin)`` shardings over ``mesh``.

    ``step_fn(X, W) -> W`` must be batched over a leading utterance axis.
    Returns a compiled runner executing ``n_iter`` steps as one
    ``lax.scan`` XLA program; per-bin independence means the scan body
    issues no collectives. ``ndim`` is the rank of both batched arrays
    (4 for complex layouts, 5 for split-complex).
    """
    x_sharding = NamedSharding(mesh, batch_spec(mesh, bin_axis=x_bin_axis, ndim=ndim))
    w_sharding = NamedSharding(mesh, batch_spec(mesh, bin_axis=w_bin_axis, ndim=ndim))

    def run(X, W, n_iter):
        def body(W, _):
            return step_fn(X, W), None

        W, _ = lax.scan(body, W, None, length=n_iter)
        return W

    return jax.jit(
        run,
        in_shardings=(x_sharding, w_sharding),
        out_shardings=w_sharding,
        static_argnums=(2,),
    )


def make_batched_auxiva_runner(mesh: Optional[Mesh] = None) -> Callable:
    """Sharded multi-utterance AuxIVA-IP1 runner (complex64 path)."""
    if mesh is None:
        mesh = make_mesh()
    return shard_batched_run(mesh, batched_auxiva_ip1_step)


# ---- split-complex fast path (planar [real, imag] leading axis) ------------
#
# TPU MXUs have no complex datapath and some TPU runtimes reject complex
# dtypes entirely; the production fast path carries (2, ...) f32 arrays.
# See ssspy_tpu.ops.splitc.


def _sc_step(Xs, Ws):
    from ..ops.splitc import auxiva_ip1_step_sc

    return auxiva_ip1_step_sc(Xs, Ws)


batched_auxiva_ip1_step_sc = jax.vmap(_sc_step, in_axes=(0, 0))


def make_batched_auxiva_runner_sc(mesh: Optional[Mesh] = None) -> Callable:
    """Sharded split-complex AuxIVA-IP1 runner.

    ``X``: ``(batch, 2, M, I, T)`` f32 sharded (dp, -, -, bin, -);
    ``W``: ``(batch, 2, I, N, M)`` f32 sharded (dp, -, bin, -, -).
    """
    if mesh is None:
        mesh = make_mesh()
    return shard_batched_run(
        mesh, batched_auxiva_ip1_step_sc, x_bin_axis=3, w_bin_axis=2, ndim=5
    )


def _sc_ip2_step(Xs, Ws):
    from ..ops.splitc import auxiva_ip2_step_sc

    return auxiva_ip2_step_sc(Xs, Ws)


def _sc_iss1_step(Ys):
    from ..ops.splitc import auxiva_iss1_step_sc

    return auxiva_iss1_step_sc(Ys)


def _sc_ilrma_ip1_step(Xs, carry):
    from ..ops.splitc import gauss_ilrma_ip1_step_sc

    Ws, T, V = carry
    return gauss_ilrma_ip1_step_sc(Xs, Ws, T, V)


batched_auxiva_ip2_step_sc = jax.vmap(_sc_ip2_step, in_axes=(0, 0))
batched_auxiva_iss1_step_sc = jax.vmap(_sc_iss1_step, in_axes=(0,))
batched_gauss_ilrma_ip1_step_sc = jax.vmap(_sc_ilrma_ip1_step, in_axes=(0, 0))


def make_batched_auxiva_ip2_runner_sc(mesh: Optional[Mesh] = None) -> Callable:
    """Sharded split-complex AuxIVA-IP2 runner (same layout as IP1)."""
    if mesh is None:
        mesh = make_mesh()
    return shard_batched_run(
        mesh, batched_auxiva_ip2_step_sc, x_bin_axis=3, w_bin_axis=2, ndim=5
    )


def shard_state_run(mesh: Mesh, step_fn: Callable, *, y_bin_axis: int = 3, ndim: int = 5) -> Callable:
    """Jit ``run(Y, n_iter)`` for demix-free (Y-state) algorithms.

    ``step_fn(Y) -> Y`` must be batched over a leading utterance axis.
    The ISS family carries no demixing matrix (reference
    ssspy/bss/iva.py:1687-1697): the separated spectrogram itself is the
    scan carry, sharded ``(dp, -, -, bin, -)``. The ISS rank-1 updates
    are per-bin independent, so the scan body still issues no
    collectives.
    """
    y_sharding = NamedSharding(mesh, batch_spec(mesh, bin_axis=y_bin_axis, ndim=ndim))

    def run(Y, n_iter):
        def body(Y, _):
            return step_fn(Y), None

        Y, _ = lax.scan(body, Y, None, length=n_iter)
        return Y

    return jax.jit(
        run, in_shardings=(y_sharding,), out_shardings=y_sharding, static_argnums=(1,)
    )


def make_batched_auxiva_iss1_runner_sc(mesh: Optional[Mesh] = None) -> Callable:
    """Sharded split-complex AuxIVA-ISS1 runner (Y-state path).

    ``Y``: ``(batch, 2, N, I, T)`` f32 sharded (dp, -, -, bin, -).
    """
    if mesh is None:
        mesh = make_mesh()
    return shard_state_run(mesh, batched_auxiva_iss1_step_sc, y_bin_axis=3, ndim=5)


def shard_pytree_run(mesh: Mesh, step_fn: Callable, *, x_spec: P, carry_specs) -> Callable:
    """Jit ``run(X, carry, n_iter)`` with explicit per-leaf PartitionSpecs.

    General form of :func:`shard_batched_run` for algorithms whose scan
    carry is a pytree with mixed layouts (e.g. ILRMA's ``(W, T, V)``:
    the NMF activation ``V`` has no bin axis and stays replicated along
    ``bin`` while ``W`` and the basis ``T`` shard over it).
    ``carry_specs`` must mirror the carry pytree structure.
    """
    x_sharding = NamedSharding(mesh, x_spec)
    carry_shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        carry_specs,
        is_leaf=lambda s: isinstance(s, P),
    )

    def run(X, carry, n_iter):
        def body(carry, _):
            return step_fn(X, carry), None

        carry, _ = lax.scan(body, carry, None, length=n_iter)
        return carry

    return jax.jit(
        run,
        in_shardings=(x_sharding, carry_shardings),
        out_shardings=carry_shardings,
        static_argnums=(2,),
    )


def make_batched_ilrma_runner_sc(mesh: Optional[Mesh] = None) -> Callable:
    """Sharded split-complex GaussILRMA-IP1 runner.

    ``run(X, (W, T, V), n_iter)`` with ``X``: ``(batch, 2, M, I, T)``
    sharded (dp, -, -, bin, -); ``W``: ``(batch, 2, I, N, M)`` sharded
    (dp, -, bin, -, -); basis ``T``: ``(batch, N, I, K)`` sharded
    (dp, -, bin, -); activation ``V``: ``(batch, N, K, T)`` sharded
    (dp, -, -, -) — ``V`` couples all bins through the NMF update, so
    XLA inserts one ``psum`` over the ``bin`` axis per basis/activation
    contraction (the only collectives in the program, riding ICI).
    """
    if mesh is None:
        mesh = make_mesh()
    dp, b = mesh.axis_names
    return shard_pytree_run(
        mesh,
        batched_gauss_ilrma_ip1_step_sc,
        x_spec=P(dp, None, None, b, None),
        carry_specs=(
            P(dp, None, b, None, None),
            P(dp, None, b, None),
            P(dp, None, None, None),
        ),
    )


def make_batched_auxiva_wave_runner_sc(
    mesh: Optional[Mesh] = None,
    n_fft: int = 512,
    hop_length: Optional[int] = None,
) -> Callable:
    """Sharded waveform-to-waveform AuxIVA-IP1 over a ``(dp, bin)`` mesh.

    ``run(waveforms, n_iter) -> separated``: ``waveforms`` is
    ``(batch, n_channels, n_samples)`` f32 sharded over ``dp``; the
    on-device STFT (DFT-as-matmul), the full iteration scan (bins
    sharded over the second mesh axis via a sharding constraint — the
    scan body is collective-free), projection back, and iSTFT compile
    into ONE XLA program. The whole serving pipeline, multi-chip.
    """

    from ..ops.splitc import _csep, csolve_matrix
    from ..transform import istft_sc, stft_sc

    if mesh is None:
        mesh = make_mesh()
    dp, b = mesh.axis_names
    hop = n_fft // 2 if hop_length is None else hop_length
    x_sharding = NamedSharding(mesh, P(dp, None, None))
    spec_sharding = NamedSharding(mesh, P(dp, None, None, b, None))
    w_sharding = NamedSharding(mesh, P(dp, None, b, None, None))

    def run(xw, n_iter):
        n_batch, n_channels, length = xw.shape
        Xs = jax.vmap(lambda w: stft_sc(w, n_fft=n_fft, hop_length=hop))(xw)
        Xs = jax.lax.with_sharding_constraint(Xs, spec_sharding)
        n_bins = Xs.shape[3]

        W0r = jnp.broadcast_to(
            jnp.eye(n_channels, dtype=Xs.dtype),
            (n_batch, n_bins, n_channels, n_channels),
        )
        W0 = jnp.stack([W0r, jnp.zeros_like(W0r)], axis=1)
        W0 = jax.lax.with_sharding_constraint(W0, w_sharding)

        def body(W, _):
            return batched_auxiva_ip1_step_sc(Xs, W), None

        W, _ = lax.scan(body, W0, None, length=n_iter)

        # projection back on the filter (reference_id = 0), batched
        Wr, Wi = W[:, 0], W[:, 1]
        Er = jnp.broadcast_to(
            jnp.eye(n_channels, dtype=Xs.dtype), Wr.shape
        )
        Winv_r, Winv_i = csolve_matrix(Wr, Wi, Er, jnp.zeros_like(Er))
        sr, si = Winv_r[..., 0, :], Winv_i[..., 0, :]  # (B, I, N)
        Wr2 = Wr * sr[..., :, None] - Wi * si[..., :, None]
        Wi2 = Wr * si[..., :, None] + Wi * sr[..., :, None]
        Yr, Yi = jax.vmap(_csep)(Wr2, Wi2, Xs[:, 0], Xs[:, 1])
        Ysep = jnp.stack([Yr, Yi], axis=1)
        return jax.vmap(
            lambda y: istft_sc(y, n_fft=n_fft, hop_length=hop, length=length)
        )(Ysep)

    return jax.jit(run, in_shardings=(x_sharding,), static_argnums=(1,))
