import numpy as np
import pytest

from ssspy_tpu.algorithm import (
    correlation_based_permutation_solver,
    score_based_permutation_solver,
)

from ..helpers import requires_reference


def _permuted_sources(seed=0, n=3, bins=24, frames=40):
    """Coherent per-source envelopes, randomly permuted per bin.

    Per-bin amplitude jitter breaks exact correlation ties so the greedy
    visit order is well-defined across numerics backends.
    """
    rng = np.random.default_rng(seed)
    env = np.abs(rng.standard_normal((n, frames))) + 0.1  # (N, T) shared across bins
    jitter = 1 + 0.2 * rng.random((bins, n, 1))
    phase = rng.uniform(0, 2 * np.pi, (bins, n, frames))
    Y_true = env[None] * jitter * np.exp(1j * phase)  # (I, N, T)
    perms = np.stack([rng.permutation(n) for _ in range(bins)])
    Y_shuffled = np.take_along_axis(Y_true, perms[:, :, None], axis=1)
    return Y_true, Y_shuffled, perms


def _alignment_quality(Y_aligned, Y_true):
    """Fraction of bins matching the majority source-labeling (relabel-invariant)."""
    def _center(X):
        X = np.abs(X)
        X = X - X.mean(axis=-1, keepdims=True)
        return X / np.linalg.norm(X, axis=-1, keepdims=True)

    A = _center(Y_aligned)
    B = _center(Y_true)
    patterns = []
    for i in range(A.shape[0]):
        corr = A[i] @ B[i].T
        patterns.append(tuple(np.argmax(corr, axis=1)))
    from collections import Counter

    pattern, count = Counter(patterns).most_common(1)[0]
    if sorted(pattern) != list(range(A.shape[1])):
        return 0.0
    return count / A.shape[0]


def test_correlation_solver_unscrambles():
    Y_true, Y_shuffled, _ = _permuted_sources()
    Y_aligned = np.asarray(correlation_based_permutation_solver(Y_shuffled))
    assert Y_aligned.shape == Y_shuffled.shape
    # aligned output should be far more consistent than the scrambled input
    assert _alignment_quality(Y_aligned, Y_true) > 0.9


def test_correlation_solver_permutes_args_in_lockstep():
    Y_true, Y_shuffled, _ = _permuted_sources(seed=1)
    W = np.arange(Y_shuffled.shape[0] * Y_shuffled.shape[1]).reshape(
        Y_shuffled.shape[0], Y_shuffled.shape[1], 1
    ).astype(float)
    Y_aligned, W_aligned = correlation_based_permutation_solver(Y_shuffled, W)
    Y_aligned, W_aligned = np.asarray(Y_aligned), np.asarray(W_aligned)
    # same permutation applied to both: find it per bin and compare
    for i in range(Y_shuffled.shape[0]):
        for n in range(Y_shuffled.shape[1]):
            src = int(W_aligned[i, n, 0]) - i * Y_shuffled.shape[1]
            assert np.allclose(Y_aligned[i, n], Y_shuffled[i, src])


def test_score_solver_unscrambles():
    Y_true, Y_shuffled, _ = _permuted_sources(seed=2)
    P_shuffled = np.abs(Y_shuffled)
    P_aligned = np.asarray(
        score_based_permutation_solver(P_shuffled, global_iter=2, local_iter=2)
    )
    assert P_aligned.shape == P_shuffled.shape
    assert _alignment_quality(P_aligned, Y_true) > 0.9


@requires_reference
def test_correlation_solver_matches_reference():
    from ssspy.algorithm.permutation_alignment import (
        correlation_based_permutation_solver as ref_solver,
    )

    _, Y_shuffled, _ = _permuted_sources(seed=3)
    ours = np.asarray(correlation_based_permutation_solver(Y_shuffled))
    theirs = ref_solver(Y_shuffled.copy(), overwrite=True)
    assert np.allclose(ours, theirs, atol=1e-8)


@requires_reference
def test_score_solver_matches_reference():
    from ssspy.algorithm.permutation_alignment import (
        score_based_permutation_solver as ref_solver,
    )

    _, Y_shuffled, _ = _permuted_sources(seed=4)
    P = np.abs(Y_shuffled)
    ours = np.asarray(score_based_permutation_solver(P, global_iter=1, local_iter=1))
    theirs = ref_solver(P.copy(), global_iter=1, local_iter=1, overwrite=True)
    assert np.allclose(ours, theirs, atol=1e-8)
