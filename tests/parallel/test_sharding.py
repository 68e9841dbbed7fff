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
