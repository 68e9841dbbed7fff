"""Mesh-sharding tests on the 8-virtual-device CPU backend.

Validates the (dp, bin) scaling story of SURVEY.md §2.7: the sharded
runners compile and execute over a real Mesh, match the unsharded
result exactly, and place shards as annotated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from ssspy_tpu.ops.splitc import auxiva_ip1_step_sc
from ssspy_tpu.parallel import (
    auxiva_ip1_step,
    batched_auxiva_ip1_step,
    make_batched_auxiva_runner,
    make_batched_auxiva_runner_sc,
    make_mesh,
)


def _batch(n_batch, n_channels=3, n_bins=32, n_frames=24, seed=0):
    rng = np.random.default_rng(seed)
    X = (
        rng.standard_normal((n_batch, n_channels, n_bins, n_frames))
        + 1j * rng.standard_normal((n_batch, n_channels, n_bins, n_frames))
    ).astype(np.complex64)
    W = np.tile(np.eye(n_channels, dtype=np.complex64), (n_batch, n_bins, 1, 1))
    return X, W


def test_mesh_factorization():
    assert make_mesh(devices=jax.devices()[:8]).devices.shape == (2, 4)
    assert make_mesh(devices=jax.devices()[:4]).devices.shape == (2, 2)
    assert make_mesh(devices=jax.devices()[:1]).devices.shape == (1, 1)
    assert make_mesh(devices=jax.devices()[:8], shape=(4, 2)).devices.shape == (4, 2)


def test_sharded_runner_matches_unsharded():
    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_auxiva_runner(mesh)

    X, W = _batch(n_batch=4)
    W_sharded = np.asarray(runner(X, W, 3))

    W_ref = jnp.asarray(W)
    for _ in range(3):
        W_ref = batched_auxiva_ip1_step(jnp.asarray(X), W_ref)

    np.testing.assert_allclose(W_sharded, np.asarray(W_ref), atol=1e-5)


def test_sharded_sc_runner_matches_complex():
    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_auxiva_runner_sc(mesh)

    X, W = _batch(n_batch=2)
    Xs = np.stack([X.real, X.imag], axis=1).astype(np.float32)
    Ws = np.stack([W.real, W.imag], axis=1).astype(np.float32)

    W_sc = np.asarray(runner(Xs, Ws, 2))

    W_ref = jnp.asarray(W)
    for _ in range(2):
        W_ref = batched_auxiva_ip1_step(jnp.asarray(X), W_ref)

    np.testing.assert_allclose(
        W_sc[:, 0] + 1j * W_sc[:, 1], np.asarray(W_ref), atol=2e-4
    )


def test_output_sharding_placement():
    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_auxiva_runner(mesh)

    X, W = _batch(n_batch=4)
    out = runner(X, W, 1)
    # output W (B, I, N, M) is sharded (dp, bin, -, -): each shard holds
    # batch/dp x bins/bin_axis
    dp, nbin = mesh.devices.shape
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(4 // dp, 32 // nbin, 3, 3)}


def test_single_utterance_step_under_jit_no_recompile():
    X, W = _batch(n_batch=1)
    step = jax.jit(auxiva_ip1_step)
    Xd, Wd = jnp.asarray(X[0]), jnp.asarray(W[0])
    W1 = step(Xd, Wd)
    W2 = step(Xd, W1)
    assert step._cache_size() == 1
    assert np.all(np.isfinite(np.asarray(W2)))


def test_sc_step_on_default_backend():
    X, W = _batch(n_batch=1)
    Xs = jnp.asarray(np.stack([X[0].real, X[0].imag]).astype(np.float32))
    Ws = jnp.asarray(np.stack([W[0].real, W[0].imag]).astype(np.float32))
    out = jax.jit(auxiva_ip1_step_sc)(Xs, Ws)
    ref = auxiva_ip1_step(jnp.asarray(X[0]), jnp.asarray(W[0]))
    np.testing.assert_allclose(
        np.asarray(out[0]) + 1j * np.asarray(out[1]), np.asarray(ref), atol=2e-4
    )


def test_sharded_iss1_runner_matches_unsharded():
    """Y-state (demix-free) family over the mesh."""
    from ssspy_tpu.parallel import (
        batched_auxiva_iss1_step_sc,
        make_batched_auxiva_iss1_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_auxiva_iss1_runner_sc(mesh)

    X, _ = _batch(n_batch=4)
    Ys = np.stack([X.real, X.imag], axis=1).astype(np.float32)
    Y_sharded = np.asarray(runner(Ys, 3))

    Y_ref = jnp.asarray(Ys)
    for _ in range(3):
        Y_ref = batched_auxiva_iss1_step_sc(Y_ref)

    np.testing.assert_allclose(Y_sharded, np.asarray(Y_ref), atol=1e-5)


def test_sharded_ip2_runner_matches_unsharded():
    from ssspy_tpu.parallel import (
        batched_auxiva_ip2_step_sc,
        make_batched_auxiva_ip2_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_auxiva_ip2_runner_sc(mesh)

    X, W = _batch(n_batch=2)
    Xs = np.stack([X.real, X.imag], axis=1).astype(np.float32)
    Ws = np.stack([W.real, W.imag], axis=1).astype(np.float32)
    W_sharded = np.asarray(runner(Xs, Ws, 2))

    W_ref = jnp.asarray(Ws)
    for _ in range(2):
        W_ref = batched_auxiva_ip2_step_sc(jnp.asarray(Xs), W_ref)

    # GSPMD repartitions the stacked per-pair solve chain, so f32
    # reduction order differs from the unsharded program (~1e-4 max)
    np.testing.assert_allclose(W_sharded, np.asarray(W_ref), atol=5e-4)


def test_sharded_ilrma_runner_matches_unsharded():
    """Mixed-layout carry (W, T, V): V is replicated along the bin axis, so
    the NMF contractions insert the program's only collectives."""
    from ssspy_tpu.parallel import (
        batched_gauss_ilrma_ip1_step_sc,
        make_batched_ilrma_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_ilrma_runner_sc(mesh)

    n_batch, n_basis = 2, 4
    X, W = _batch(n_batch=n_batch)
    rng = np.random.default_rng(7)
    n_channels, n_bins, n_frames = X.shape[1:]
    Xs = np.stack([X.real, X.imag], axis=1).astype(np.float32)
    Ws = np.stack([W.real, W.imag], axis=1).astype(np.float32)
    T = rng.random((n_batch, n_channels, n_bins, n_basis)).astype(np.float32)
    V = rng.random((n_batch, n_channels, n_basis, n_frames)).astype(np.float32)

    out = runner(Xs, (Ws, T, V), 2)
    out = tuple(np.asarray(a) for a in out)

    carry = (jnp.asarray(Ws), jnp.asarray(T), jnp.asarray(V))
    for _ in range(2):
        carry = batched_gauss_ilrma_ip1_step_sc(jnp.asarray(Xs), carry)

    for got, ref in zip(out, carry):
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-4)


def test_batched_auxiva_wave_runner_matches_single_device():
    """The sharded whole-pipeline wave runner equals per-utterance
    fast_auxiva_wave on a virtual 8-device (dp, bin) mesh."""
    from ssspy_tpu.fast import fast_auxiva_wave
    from ssspy_tpu.parallel import make_batched_auxiva_wave_runner_sc, make_mesh

    rng = np.random.default_rng(0)
    n_batch, n_channels, n_samples = 2, 2, 2048
    xw = rng.standard_normal((n_batch, n_channels, n_samples)).astype(np.float32)

    mesh = make_mesh()
    runner = make_batched_auxiva_wave_runner_sc(mesh, n_fft=256)
    y = np.asarray(runner(xw, 3))
    assert y.shape == (n_batch, n_channels, n_samples)

    for k in range(n_batch):
        y_ref = fast_auxiva_wave(xw[k], n_iter=3, n_fft=256)
        np.testing.assert_allclose(y[k], y_ref, atol=1e-4)


def test_sharded_cacgmm_matches_unsharded():
    from ssspy_tpu.parallel import batched_cacgmm_step_sc, make_batched_cacgmm_runner_sc

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_cacgmm_runner_sc(mesh)

    rng = np.random.default_rng(0)
    B, M, I, T = 2, 3, 32, 12
    Z = rng.standard_normal((B, M, I, T)) + 1j * rng.standard_normal((B, M, I, T))
    Z = Z / np.abs(np.linalg.norm(Z, axis=1, keepdims=True))
    Zs = np.stack([Z.real, Z.imag], axis=1).astype(np.float32)
    alpha = rng.random((B, M, I))
    alpha = (alpha / alpha.sum(axis=1, keepdims=True)).astype(np.float32)
    Bd = rng.random((B, M, I, M))
    Bd = Bd / Bd.sum(axis=-1, keepdims=True)
    B0 = (Bd[..., None] * np.eye(M)).astype(np.float32)
    Bs = np.stack([B0, np.zeros_like(B0)], axis=1)

    out = runner(Zs, (jnp.asarray(alpha), jnp.asarray(Bs)), 3)
    ref = (jnp.asarray(alpha), jnp.asarray(Bs))
    for _ in range(3):
        ref = batched_cacgmm_step_sc(jnp.asarray(Zs), ref)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), atol=1e-5)


def test_sharded_fast_mnmf_matches_unsharded():
    from ssspy_tpu.parallel import (
        batched_fast_gauss_mnmf_step_sc,
        make_batched_fast_mnmf_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_fast_mnmf_runner_sc(mesh)

    rng = np.random.default_rng(1)
    B, M, I, T, K = 2, 3, 32, 12, 2
    X = rng.standard_normal((B, M, I, T)) + 1j * rng.standard_normal((B, M, I, T))
    Xs = np.stack([X.real, X.imag], axis=1).astype(np.float32)
    Q0 = np.zeros((B, 2, I, M, M), np.float32)
    Q0[:, 0] = np.eye(M, dtype=np.float32)
    Tb = (rng.random((B, M, I, K)) + 0.1).astype(np.float32)
    Vb = (rng.random((B, M, K, T)) + 0.1).astype(np.float32)
    Db = (rng.random((B, I, M, M)) + 0.1).astype(np.float32)

    carry = tuple(jnp.asarray(a) for a in (Q0, Tb, Vb, Db))
    out = runner(jnp.asarray(Xs), carry, 3)
    ref = carry
    for _ in range(3):
        ref = batched_fast_gauss_mnmf_step_sc(jnp.asarray(Xs), ref)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-4)


def test_sharded_ipsdta_matches_unsharded():
    from ssspy_tpu.parallel import (
        batched_ipsdta_vcd_step_sc,
        make_batched_ipsdta_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])  # (2, 4): bin axis = 4
    runner = make_batched_ipsdta_runner_sc(mesh)

    rng = np.random.default_rng(2)
    B, M, I, T, K, n_blocks = 2, 3, 32, 10, 2, 8  # J = 4; 8 blocks over 4 shards
    X = rng.standard_normal((B, M, I, T)) + 1j * rng.standard_normal((B, M, I, T))
    Xs = np.stack([X.real, X.imag], axis=1).astype(np.float32)
    W0 = np.zeros((B, 2, I, M, M), np.float32)
    W0[:, 0] = np.eye(M, dtype=np.float32)
    J = I // n_blocks
    Tp = np.zeros((B, 2, M, K, n_blocks, J, J), np.float32)
    Tp[:, 0] = np.eye(J, dtype=np.float32)
    Vb = (rng.random((B, M, K, T)) + 0.1).astype(np.float32)

    carry = (jnp.asarray(W0), (jnp.asarray(Tp),), jnp.asarray(Vb))
    out = runner(jnp.asarray(Xs), carry, 2)
    ref = carry
    for _ in range(2):
        ref = batched_ipsdta_vcd_step_sc(jnp.asarray(Xs), ref)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1][0]), np.asarray(ref[1][0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(ref[2]), atol=1e-4)


def test_sharded_runner_pads_uneven_bins():
    """257-bin (n_fft=512) shapes must run on any mesh: the runner pads
    the bin axis internally and slices back; per-bin independence makes
    the result identical to the unsharded unpadded step."""
    from ssspy_tpu.parallel import batched_auxiva_ip1_step_sc

    mesh = make_mesh(devices=jax.devices()[:8])  # bin axis = 4; 257 % 4 != 0
    runner = make_batched_auxiva_runner_sc(mesh)

    rng = np.random.default_rng(3)
    B, M, I, T = 2, 3, 257, 16
    Xs = rng.standard_normal((B, 2, M, I, T)).astype(np.float32)
    W = np.zeros((B, 2, I, M, M), dtype=np.float32)
    W[:, 0] = np.eye(M, dtype=np.float32)

    out = np.asarray(runner(Xs, W, 2))
    ref = jnp.asarray(W)
    for _ in range(2):
        ref = jax.jit(batched_auxiva_ip1_step_sc)(jnp.asarray(Xs), ref)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)


def test_sharded_iss_runner_pads_uneven_bins():
    from ssspy_tpu.parallel import (
        batched_auxiva_iss1_step_sc,
        make_batched_auxiva_iss1_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_auxiva_iss1_runner_sc(mesh)

    rng = np.random.default_rng(4)
    Y = rng.standard_normal((2, 2, 3, 257, 16)).astype(np.float32)
    out = np.asarray(runner(Y, 2))
    ref = jnp.asarray(Y)
    for _ in range(2):
        ref = jax.jit(batched_auxiva_iss1_step_sc)(ref)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)


def test_sharded_complex_runner_pads_uneven_bins():
    """The complex-dtype runner must also survive padded (singular)
    bins: the LU solve NaNs there and the IP1 guard freezes the row."""
    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_auxiva_runner(mesh)

    rng = np.random.default_rng(5)
    B, M, I, T = 2, 3, 33, 12
    X = (
        rng.standard_normal((B, M, I, T)) + 1j * rng.standard_normal((B, M, I, T))
    ).astype(np.complex64)
    W = np.tile(np.eye(M, dtype=np.complex64), (B, I, 1, 1))

    out = np.asarray(runner(X, W, 2))
    assert np.isfinite(out).all()
    ref = jnp.asarray(W)
    for _ in range(2):
        ref = batched_auxiva_ip1_step(jnp.asarray(X), ref)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)


def test_sharded_cacgmm_pads_uneven_bins():
    from ssspy_tpu.parallel import batched_cacgmm_step_sc, make_batched_cacgmm_runner_sc

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_cacgmm_runner_sc(mesh)

    rng = np.random.default_rng(6)
    B, M, I, T = 2, 3, 33, 12
    Z = rng.standard_normal((B, M, I, T)) + 1j * rng.standard_normal((B, M, I, T))
    Z = Z / np.abs(np.linalg.norm(Z, axis=1, keepdims=True))
    Zs = np.stack([Z.real, Z.imag], axis=1).astype(np.float32)
    alpha = rng.random((B, M, I))
    alpha = (alpha / alpha.sum(axis=1, keepdims=True)).astype(np.float32)
    Bd = rng.random((B, M, I, M))
    Bd = Bd / Bd.sum(axis=-1, keepdims=True)
    B0 = (Bd[..., None] * np.eye(M)).astype(np.float32)
    Bs = np.stack([B0, np.zeros_like(B0)], axis=1)

    out = runner(Zs, (jnp.asarray(alpha), jnp.asarray(Bs)), 3)
    assert np.isfinite(np.asarray(out[0])).all()
    ref = (jnp.asarray(alpha), jnp.asarray(Bs))
    for _ in range(3):
        ref = batched_cacgmm_step_sc(jnp.asarray(Zs), ref)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=2e-4)


def test_sharded_fast_mnmf_pads_uneven_bins():
    from ssspy_tpu.parallel import (
        batched_fast_gauss_mnmf_step_sc,
        make_batched_fast_mnmf_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_fast_mnmf_runner_sc(mesh)

    rng = np.random.default_rng(7)
    B, M, I, T, K = 2, 3, 33, 12, 2
    X = rng.standard_normal((B, M, I, T)) + 1j * rng.standard_normal((B, M, I, T))
    Xs = np.stack([X.real, X.imag], axis=1).astype(np.float32)
    Q0 = np.zeros((B, 2, I, M, M), np.float32)
    Q0[:, 0] = np.eye(M, dtype=np.float32)
    Tb = (rng.random((B, M, I, K)) + 0.1).astype(np.float32)
    Vb = (rng.random((B, M, K, T)) + 0.1).astype(np.float32)
    Db = (rng.random((B, I, M, M)) + 0.1).astype(np.float32)

    carry = tuple(jnp.asarray(a) for a in (Q0, Tb, Vb, Db))
    out = runner(jnp.asarray(Xs), carry, 3)
    for o in out:
        assert np.isfinite(np.asarray(o)).all()

    # FastGaussMNMF's normalization averages |QX|^2 over ALL bins, so
    # padding shifts the per-channel scale gauge (like ILRMA's power
    # normalization — see shard_pytree_run docstring): the unsharded
    # reference must run on identically padded arrays, sliced after.
    pad = (-I) % mesh.devices.shape[1]
    Xp = np.pad(Xs, [(0, 0), (0, 0), (0, 0), (0, pad), (0, 0)])
    Qp = np.pad(Q0, [(0, 0), (0, 0), (0, pad), (0, 0), (0, 0)])
    Qp[:, 0, I:] = np.eye(M, dtype=np.float32)
    Tp = np.pad(Tb, [(0, 0), (0, 0), (0, pad), (0, 0)])
    Dp = np.pad(Db, [(0, 0), (0, pad), (0, 0), (0, 0)])
    ref = tuple(jnp.asarray(a) for a in (Qp, Tp, Vb, Dp))
    for _ in range(3):
        ref = batched_fast_gauss_mnmf_step_sc(jnp.asarray(Xp), ref)
    ref_sliced = (
        np.asarray(ref[0])[:, :, :I],
        np.asarray(ref[1])[:, :, :I],
        np.asarray(ref[2]),
        np.asarray(ref[3])[:, :I],
    )
    for o, r in zip(out, ref_sliced):
        np.testing.assert_allclose(np.asarray(o), r, atol=1e-4)


def test_sharded_ip2_runner_pads_uneven_bins():
    from ssspy_tpu.parallel import (
        batched_auxiva_ip2_step_sc,
        make_batched_auxiva_ip2_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_auxiva_ip2_runner_sc(mesh)

    rng = np.random.default_rng(8)
    B, M, I, T = 2, 4, 33, 16
    Xs = rng.standard_normal((B, 2, M, I, T)).astype(np.float32)
    W = np.zeros((B, 2, I, M, M), dtype=np.float32)
    W[:, 0] = np.eye(M, dtype=np.float32)

    out = np.asarray(runner(Xs, W, 2))
    assert np.isfinite(out).all()
    ref = jnp.asarray(W)
    for _ in range(2):
        ref = jax.jit(batched_auxiva_ip2_step_sc)(jnp.asarray(Xs), ref)
    np.testing.assert_allclose(out, np.asarray(ref), atol=2e-4)


def test_sharded_iss2_runner_pads_uneven_bins():
    from ssspy_tpu.parallel import (
        batched_auxiva_iss2_step_sc,
        make_batched_auxiva_iss2_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_auxiva_iss2_runner_sc(mesh)

    rng = np.random.default_rng(9)
    Y = rng.standard_normal((2, 2, 4, 33, 16)).astype(np.float32)
    out = np.asarray(runner(Y, 2))
    assert np.isfinite(out).all()
    ref = jnp.asarray(Y)
    for _ in range(2):
        ref = jax.jit(batched_auxiva_iss2_step_sc)(ref)
    np.testing.assert_allclose(out, np.asarray(ref), atol=2e-4)


def test_sharded_ipa_runner_matches_unsharded():
    from ssspy_tpu.parallel import (
        batched_auxiva_ipa_step_sc,
        make_batched_auxiva_ipa_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_auxiva_ipa_runner_sc(mesh)

    rng = np.random.default_rng(11)
    # f64: IPA's eigh/Newton chain amplifies the sharded all-reduce's
    # f32 summation-order differences to ~1e-2 over 2 iterations; in
    # f64 the same drift sits below 1e-8
    Y = rng.standard_normal((2, 2, 3, 32, 12))
    out = np.asarray(runner(Y, 2))
    assert np.isfinite(out).all()
    ref = jnp.asarray(Y)
    for _ in range(2):
        ref = jax.jit(batched_auxiva_ipa_step_sc)(ref)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-7)


def test_sharded_ipa_runner_pads_uneven_bins():
    from ssspy_tpu.parallel import (
        batched_auxiva_ipa_step_sc,
        make_batched_auxiva_ipa_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_auxiva_ipa_runner_sc(mesh)

    rng = np.random.default_rng(12)
    Y = rng.standard_normal((2, 2, 3, 33, 12))  # f64, see the even-bin test
    out = np.asarray(runner(Y, 2))
    assert np.isfinite(out).all()
    ref = jnp.asarray(Y)
    for _ in range(2):
        ref = jax.jit(batched_auxiva_ipa_step_sc)(ref)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-7)


def _whitened_fixture(seed, n_bins):
    from ssspy_tpu.ops.splitc import whiten_sc

    # f64: FasterIVA's top-eigenvector sign is convention-stable only up
    # to perturbations well below the eigenvalue gaps; the sharded
    # all-reduce's f32 summation-order drift (~1e-7) can flip it on the
    # odd bin, which is a valid-but-different trajectory. The f64 drift
    # (~1e-16) cannot.
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((2, 2, 3, n_bins, 16))
    Z = np.asarray(jax.vmap(whiten_sc)(jnp.asarray(X)))
    W = np.zeros((2, 2, n_bins, 3, 3))
    W[:, 0] = np.eye(3)
    return Z, W


@pytest.mark.parametrize("variant", ["fast", "faster"])
@pytest.mark.parametrize("n_bins", [32, 33])
def test_sharded_fixed_point_iva_runners(variant, n_bins):
    """FastIVA / FasterIVA sharded == unsharded, even and uneven bins."""
    from ssspy_tpu.parallel import (
        batched_fast_iva_step_sc,
        batched_faster_iva_step_sc,
        make_batched_fast_iva_runner_sc,
        make_batched_faster_iva_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    if variant == "fast":
        runner = make_batched_fast_iva_runner_sc(mesh)
        step = batched_fast_iva_step_sc
    else:
        runner = make_batched_faster_iva_runner_sc(mesh)
        step = batched_faster_iva_step_sc

    Z, W = _whitened_fixture(13, n_bins)
    out = np.asarray(runner(Z, W, 2))
    assert np.isfinite(out).all()
    Wref = jnp.asarray(W)
    for _ in range(2):
        Wref = jax.jit(step)(jnp.asarray(Z), Wref)
    np.testing.assert_allclose(out, np.asarray(Wref), atol=1e-7)


def _sc_fixture(seed, n_bins, n_channels=3, n_frames=16, n_batch=2):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n_batch, 2, n_channels, n_bins, n_frames))
    W = np.zeros((n_batch, 2, n_bins, n_channels, n_channels))
    W[:, 0] = np.eye(n_channels)
    return X, W


@pytest.mark.parametrize("algo", ["IP1", "IP2"])
@pytest.mark.parametrize("n_bins", [32, 33])
def test_sharded_fdica_runner(algo, n_bins):
    """AuxLaplaceFDICA sharded == unsharded (collective-free scan body)."""
    from ssspy_tpu.parallel import (
        batched_aux_fdica_ip1_step_sc,
        batched_aux_fdica_ip2_step_sc,
        make_batched_fdica_runner_sc,
    )

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_fdica_runner_sc(mesh, spatial_algorithm=algo)
    step = (
        batched_aux_fdica_ip1_step_sc
        if algo == "IP1"
        else batched_aux_fdica_ip2_step_sc
    )

    X, W = _sc_fixture(21, n_bins)
    out = np.asarray(runner(X, W, 2))
    assert np.isfinite(out).all()
    Wref = jnp.asarray(W)
    for _ in range(2):
        Wref = jax.jit(step)(jnp.asarray(X), Wref)
    np.testing.assert_allclose(out, np.asarray(Wref), atol=1e-10)


@pytest.mark.parametrize("natural", [False, True])
@pytest.mark.parametrize("n_bins", [32, 33])
def test_sharded_grad_iva_runner(natural, n_bins):
    """Grad/NaturalGrad IVA sharded == unsharded; the cross-bin score
    norm is the one all-reduce and zero-padded bins are neutral in it."""
    from ssspy_tpu.ops.splitc import grad_laplace_iva_step_sc
    from ssspy_tpu.parallel import make_batched_grad_iva_runner_sc

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_grad_iva_runner_sc(mesh, natural=natural)

    X, W = _sc_fixture(22, n_bins)
    out = np.asarray(runner(X, W, 3))
    assert np.isfinite(out).all()
    step = jax.jit(
        jax.vmap(lambda x, w: grad_laplace_iva_step_sc(x, w, natural=natural))
    )
    Wref = jnp.asarray(W)
    for _ in range(3):
        Wref = step(jnp.asarray(X), Wref)
    np.testing.assert_allclose(out, np.asarray(Wref), atol=1e-10)


def test_sharded_grad_fdica_runner():
    from ssspy_tpu.ops.splitc import grad_laplace_fdica_step_sc
    from ssspy_tpu.parallel import make_batched_grad_fdica_runner_sc

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_grad_fdica_runner_sc(mesh, natural=True)

    X, W = _sc_fixture(23, 33)
    out = np.asarray(runner(X, W, 3))
    assert np.isfinite(out).all()
    step = jax.jit(jax.vmap(lambda x, w: grad_laplace_fdica_step_sc(x, w, natural=True)))
    Wref = jnp.asarray(W)
    for _ in range(3):
        Wref = step(jnp.asarray(X), Wref)
    np.testing.assert_allclose(out, np.asarray(Wref), atol=1e-10)


def _mnmf_fixture(seed, n_bins, n_channels=3, n_frames=8, n_basis=2, n_batch=2,
                  partitioning=False):
    rng = np.random.default_rng(seed)
    Xc = rng.standard_normal((n_batch, n_channels, n_bins, n_frames)) + 1j * (
        rng.standard_normal((n_batch, n_channels, n_bins, n_frames))
    )
    XX = np.einsum("bmit,bnit->bitmn", Xc, Xc.conj())
    XXs = np.stack([XX.real, XX.imag], axis=1)  # (batch, 2, I, Tf, M, M)
    N = n_channels
    if partitioning:
        T = rng.random((n_batch, n_bins, n_basis)) + 0.1
        Z = rng.random((n_batch, N, n_basis))
        Z = Z / Z.sum(axis=1, keepdims=True)
        V = rng.random((n_batch, n_basis, n_frames)) + 0.1
    else:
        T = rng.random((n_batch, N, n_bins, n_basis)) + 0.1
        Z = None
        V = rng.random((n_batch, N, n_basis, n_frames)) + 0.1
    H = np.tile(np.eye(n_channels), (n_batch, N, n_bins, 1, 1)) + 0.1
    Hs = np.stack([H, np.zeros_like(H)], axis=1)  # (batch, 2, N, I, M, M)
    return XXs, T, V, Hs, Z


def test_gauss_mnmf_bin_mask_is_exactly_neutral():
    """A masked zero-padded bin never perturbs real bins' trajectories."""
    from ssspy_tpu.ops.splitc import gauss_mnmf_step_sc

    XXs, T, V, Hs, _ = _mnmf_fixture(31, 8, n_batch=1)
    XXs, T, V, Hs = XXs[0], T[0], V[0], Hs[0]
    pad = 3
    XXp = np.pad(XXs, [(0, 0), (0, pad), (0, 0), (0, 0), (0, 0)])
    Tp = np.pad(T, [(0, 0), (0, pad), (0, 0)])
    Hp = np.pad(Hs, [(0, 0), (0, 0), (0, pad), (0, 0), (0, 0)])
    mask = jnp.arange(8 + pad) < 8

    ref = (jnp.asarray(T), jnp.asarray(V), jnp.asarray(Hs))
    padded = (jnp.asarray(Tp), jnp.asarray(V), jnp.asarray(Hp))
    for _ in range(3):
        ref = gauss_mnmf_step_sc(jnp.asarray(XXs), *ref)
        padded = gauss_mnmf_step_sc(jnp.asarray(XXp), *padded, bin_mask=mask)
    np.testing.assert_allclose(np.asarray(padded[0][:, :8]), np.asarray(ref[0]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(padded[1]), np.asarray(ref[1]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(padded[2][:, :, :8]), np.asarray(ref[2]), rtol=1e-12)
    # frozen padding: T rows and H blocks of masked bins unchanged (zero)
    assert np.all(np.asarray(padded[0][:, 8:]) == 0)
    assert np.all(np.asarray(padded[2][:, :, 8:]) == 0)


@pytest.mark.parametrize("partitioning", [False, True])
@pytest.mark.parametrize("n_bins", [32, 33])
def test_sharded_gauss_mnmf_runner(partitioning, n_bins):
    """Dense GaussMNMF sharded-padded == unsharded UNPADDED (the mask
    makes padding exactly neutral — no normalization-gauge caveat)."""
    from ssspy_tpu.ops.splitc import gauss_mnmf_step_sc
    from ssspy_tpu.parallel import make_batched_gauss_mnmf_runner_sc

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_gauss_mnmf_runner_sc(mesh, partitioning=partitioning)

    XXs, T, V, Hs, Z = _mnmf_fixture(32, n_bins, partitioning=partitioning)
    carry = (T, V, Hs) + ((Z,) if partitioning else ())
    out = runner(XXs, carry, 2)
    for leaf in out:
        assert np.isfinite(np.asarray(leaf)).all()

    step = jax.jit(jax.vmap(lambda xx, c: gauss_mnmf_step_sc(xx, *c), in_axes=(0, 0)))
    ref = tuple(jnp.asarray(a) for a in carry)
    for _ in range(2):
        ref = step(jnp.asarray(XXs), ref)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)


@pytest.mark.parametrize("n_bins", [32, 33])
def test_sharded_pds_iva_runner(n_bins):
    """PDSIVA sharded == unsharded: the L21 group norm over bins is the
    one all-reduce; zero-padded bins are neutral in it."""
    from ssspy_tpu.ops.splitc import pds_iva_step_sc
    from ssspy_tpu.parallel import make_batched_pds_iva_runner_sc

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_pds_iva_runner_sc(mesh)

    X, W = _sc_fixture(41, n_bins)
    Y = np.zeros((2, 2, 3, n_bins, 16))
    outW, outY = runner(X, (W, Y), 3)
    assert np.isfinite(np.asarray(outW)).all()

    step = jax.jit(jax.vmap(lambda x, c: pds_iva_step_sc(x, *c), in_axes=(0, 0)))
    ref = (jnp.asarray(W), jnp.asarray(Y))
    for _ in range(3):
        ref = step(jnp.asarray(X), ref)
    np.testing.assert_allclose(np.asarray(outW), np.asarray(ref[0]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(outY), np.asarray(ref[1]), atol=1e-10)


@pytest.mark.parametrize("n_bins", [32, 33])
def test_sharded_admm_iva_runner(n_bins):
    from ssspy_tpu.ops.splitc import admm_iva_step_sc
    from ssspy_tpu.parallel import make_batched_admm_iva_runner_sc

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_admm_iva_runner_sc(mesh)

    X, W = _sc_fixture(42, n_bins)
    V = W.copy()
    Vt = np.zeros((2, 2, 3, n_bins, 16))
    Y = np.zeros_like(W)
    Yt = np.zeros_like(Vt)
    out = runner(X, (W, V, Vt, Y, Yt), 3)
    for leaf in out:
        assert np.isfinite(np.asarray(leaf)).all()

    def _step(x, c):
        return admm_iva_step_sc(x, c[1], c[2], c[3], c[4])

    step = jax.jit(jax.vmap(_step, in_axes=(0, 0)))
    ref = tuple(jnp.asarray(a) for a in (W, V, Vt, Y, Yt))
    for _ in range(3):
        ref = step(jnp.asarray(X), ref)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_harmonic_mask_n_real_matches_unpadded():
    """mask(padded Z, n_real) restricted to real bins == mask(unpadded Z)."""
    from ssspy_tpu.ops.splitc import harmonic_mask_sc

    rng = np.random.default_rng(51)
    Zr = rng.standard_normal((3, 33, 8))
    Zi = rng.standard_normal((3, 33, 8))
    ref = np.asarray(harmonic_mask_sc(jnp.asarray(Zr), jnp.asarray(Zi), 1 / 3))
    Zrp = np.pad(Zr, [(0, 0), (0, 7), (0, 0)])
    Zip = np.pad(Zi, [(0, 0), (0, 7), (0, 0)])
    got = np.asarray(
        harmonic_mask_sc(jnp.asarray(Zrp), jnp.asarray(Zip), 1 / 3, n_real=33)
    )
    np.testing.assert_allclose(got[:, :33], ref, rtol=1e-12)
    assert np.isfinite(got).all()


@pytest.mark.parametrize("n_bins", [32, 33])
def test_sharded_hva_runner(n_bins):
    """HVA sharded == unsharded: the cepstral mask is cross-bin (two DFT
    collectives per iteration) and the static n_real keeps the padded
    transform exactly equal to the unpadded one."""
    from ssspy_tpu.ops.splitc import hva_pds_step_sc
    from ssspy_tpu.parallel import make_batched_hva_runner_sc

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_hva_runner_sc(mesh)

    X, W = _sc_fixture(52, n_bins)
    # HVA expects a spectral-norm-normalized mixture; any O(1) scaling works
    X = X / np.linalg.norm(X, axis=(1, 2), keepdims=True).max()
    Y = np.zeros((2, 2, 3, n_bins, 16))
    outW, outY = runner(X, (W, Y), 3)
    assert np.isfinite(np.asarray(outW)).all()

    step = jax.jit(jax.vmap(lambda x, c: hva_pds_step_sc(x, *c), in_axes=(0, 0)))
    ref = (jnp.asarray(W), jnp.asarray(Y))
    for _ in range(3):
        ref = step(jnp.asarray(X), ref)
    np.testing.assert_allclose(np.asarray(outW), np.asarray(ref[0]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(outY), np.asarray(ref[1]), atol=1e-9)


@pytest.mark.parametrize("variant", ["grad", "natural_grad"])
def test_batched_ica_runner_matches_class(variant):
    """dp-sharded time-domain ICA == the class trajectory per utterance."""
    from ssspy_tpu.bss.ica import GradLaplaceICA, NaturalGradLaplaceICA
    from ssspy_tpu.parallel import make_batched_ica_runner

    mesh = make_mesh(devices=jax.devices()[:8])
    runner = make_batched_ica_runner(mesh, variant=variant)

    rng = np.random.default_rng(61)
    X = rng.laplace(size=(2, 3, 256))
    W = np.tile(np.eye(3), (2, 1, 1))
    out = np.asarray(runner(X, W, 4))
    assert np.isfinite(out).all()

    cls = GradLaplaceICA if variant == "grad" else NaturalGradLaplaceICA
    for b in range(2):
        ica = cls(record_loss=False)
        ica(X[b], n_iter=4)
        np.testing.assert_allclose(out[b], np.asarray(ica.demix_filter), atol=1e-10)


def test_shard_pytree_run_bin_replicated_x():
    """An x_spec with NO bin-sharded axis must not crash run_padded
    (regression: _pad_to_multiple was called with axis=None)."""
    from jax.sharding import PartitionSpec as P

    from ssspy_tpu.parallel import shard_pytree_run

    mesh = make_mesh(devices=jax.devices()[:8])
    dp, b = mesh.axis_names

    # X replicated along bin; carry (W) sharded over its bin axis
    def step(X, carry):
        (W,) = carry
        return (W + 0.5 * jnp.tanh(W) * jnp.mean(X**2),)

    run = shard_pytree_run(
        mesh,
        step,
        x_spec=P(dp, None, None),
        carry_specs=(P(dp, None, b, None, None),),
        identity_leaves=(),
    )
    rng = np.random.default_rng(5)
    X = rng.standard_normal((2, 3, 16)).astype(np.float32)
    W = rng.standard_normal((2, 2, 7, 3, 3)).astype(np.float32)  # 7 bins: uneven
    (out,) = run(X, (jnp.asarray(W),), 3)
    assert out.shape == W.shape

    ref = (jnp.asarray(W),)
    for _ in range(3):
        ref = step(jnp.asarray(X), ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]), atol=1e-6)
