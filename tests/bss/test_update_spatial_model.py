import functools

import numpy as np
import pytest

from ssspy_tpu.bss._update_spatial_model import (
    update_by_block_decomposition_vcd,
    update_by_ip1,
    update_by_ip2,
    update_by_ipa,
    update_by_iss1,
    update_by_iss2,
)
from ssspy_tpu.special import add_flooring, max_flooring
from ssspy_tpu.utils import combination_pair_selector, sequential_pair_selector

from ..helpers import assert_allclose_up_to_phase, requires_reference

rng_global = np.random.default_rng(0)


def _fixtures(n_bins=8, n_sources=3, n_frames=16, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((n_bins, n_sources, n_sources)) + 1j * rng.standard_normal(
        (n_bins, n_sources, n_sources)
    )
    A = rng.standard_normal((n_bins, n_sources, n_sources, n_sources)) + 1j * rng.standard_normal(
        (n_bins, n_sources, n_sources, n_sources)
    )
    U = A @ A.conj().swapaxes(-2, -1) + n_sources * np.eye(n_sources)
    Y = rng.standard_normal((n_sources, n_bins, n_frames)) + 1j * rng.standard_normal(
        (n_sources, n_bins, n_frames)
    )
    varphi = rng.uniform(0.1, 1.0, (n_sources, n_bins, n_frames))
    return W, U, Y, varphi


@pytest.mark.parametrize("flooring_fn", [None, functools.partial(max_flooring, eps=1e-10), functools.partial(add_flooring, eps=1e-10)])
def test_ip1_shapes_and_flooring(flooring_fn):
    W, U, _, _ = _fixtures()
    W_new = np.asarray(update_by_ip1(W, U, flooring_fn=flooring_fn))
    assert W_new.shape == W.shape
    assert np.all(np.isfinite(W_new))


@pytest.mark.parametrize(
    "pair_selector",
    [None, sequential_pair_selector, combination_pair_selector,
     functools.partial(sequential_pair_selector, sort=True)],
)
def test_ip2_shapes(pair_selector):
    W, U, _, _ = _fixtures()
    W_new = np.asarray(update_by_ip2(W, U, pair_selector=pair_selector))
    assert W_new.shape == W.shape
    assert np.all(np.isfinite(W_new))


def test_iss1_shapes():
    _, _, Y, varphi = _fixtures()
    Y_new = np.asarray(update_by_iss1(Y, varphi))
    assert Y_new.shape == Y.shape
    assert np.all(np.isfinite(Y_new))


@pytest.mark.parametrize(
    "pair_selector",
    [None,
     functools.partial(sequential_pair_selector, step=2),
     combination_pair_selector,
     lambda n: [(1, 0), (-1, 1)]],  # descending + negative indices
)
def test_iss2_shapes(pair_selector):
    _, _, Y, varphi = _fixtures(n_sources=4)
    Y_new = np.asarray(update_by_iss2(Y, varphi, pair_selector=pair_selector))
    assert Y_new.shape == Y.shape
    assert np.all(np.isfinite(Y_new))


def test_ipa_shapes():
    _, _, Y, varphi = _fixtures()
    Y_new = np.asarray(update_by_ipa(Y, varphi))
    assert Y_new.shape == Y.shape
    assert np.all(np.isfinite(Y_new))


def _vcd_fixtures(n_blocks=4, n_neighbors=3, n_sources=2, seed=1):
    rng = np.random.default_rng(seed)
    M = n_sources
    W = rng.standard_normal((n_blocks, n_neighbors, M, M)) + 1j * rng.standard_normal(
        (n_blocks, n_neighbors, M, M)
    )
    A = rng.standard_normal((n_blocks, n_neighbors, n_neighbors, M, M, M)) + 1j * (
        rng.standard_normal((n_blocks, n_neighbors, n_neighbors, M, M, M))
    )
    # Hermitian across the (neighbor, neighbor) block structure per (source)
    RXX = A @ A.conj().swapaxes(-2, -1) + M * np.eye(M)
    RXX = (RXX + RXX.transpose(0, 2, 1, 3, 5, 4).conj()) / 2
    RXX = RXX.transpose(0, 1, 2, 4, 3, 5)  # -> (B, J, J, S=M, M, M) proxy
    rngs = np.random.default_rng(seed + 1)
    RXX = rngs.standard_normal((n_blocks, n_neighbors, n_neighbors, n_sources, M, M)) + 1j * (
        rngs.standard_normal((n_blocks, n_neighbors, n_neighbors, n_sources, M, M))
    )
    RXX = (RXX + RXX.transpose(0, 2, 1, 3, 5, 4).conj()) / 2
    # make the diagonal blocks PD
    for j in range(n_neighbors):
        RXX[:, j, j] = RXX[:, j, j] @ RXX[:, j, j].conj().swapaxes(-2, -1) + M * np.eye(M)
    return W, RXX


def test_vcd_shapes():
    W, RXX = _vcd_fixtures()
    W_new = np.asarray(update_by_block_decomposition_vcd(W, RXX))
    assert W_new.shape == W.shape
    assert np.all(np.isfinite(W_new))


# ---------------- parity vs the NumPy reference ----------------

@requires_reference
@pytest.mark.parametrize("n_sources", [2, 3, 4])
def test_ip1_matches_reference(n_sources):
    from ssspy.bss._update_spatial_model import update_by_ip1 as ref

    W, U, _, _ = _fixtures(n_sources=n_sources, seed=10 + n_sources)
    ours = np.asarray(update_by_ip1(W, U))
    theirs = ref(W.copy(), U, overwrite=False)
    assert np.allclose(ours, theirs, atol=1e-8)


@requires_reference
@pytest.mark.parametrize("n_sources", [2, 3, 4])
@pytest.mark.parametrize("selector", [None, combination_pair_selector])
def test_ip2_matches_reference(n_sources, selector):
    from ssspy.bss._update_spatial_model import update_by_ip2 as ref

    W, U, _, _ = _fixtures(n_sources=n_sources, seed=20 + n_sources)
    ours = np.asarray(update_by_ip2(W, U, pair_selector=selector))
    theirs = ref(W.copy(), U, pair_selector=selector, overwrite=False)
    # 2x2 GEVD eigenvector phase is a gauge freedom (closed-form kernel vs
    # LAPACK); filter rows agree up to one phase per (bin, source), which
    # projection-back cancels exactly in the end-to-end path.
    assert_allclose_up_to_phase(ours, theirs, atol=1e-7)


@requires_reference
@pytest.mark.parametrize("n_sources", [2, 3, 4])
def test_iss1_matches_reference(n_sources):
    from ssspy.bss._update_spatial_model import update_by_iss1 as ref

    _, _, Y, varphi = _fixtures(n_sources=n_sources, seed=30 + n_sources)
    ours = np.asarray(update_by_iss1(Y, varphi))
    theirs = ref(Y.copy(), varphi)
    assert np.allclose(ours, theirs, atol=1e-8)


@requires_reference
@pytest.mark.parametrize("n_sources", [3, 4])
@pytest.mark.parametrize(
    "selector", [None, combination_pair_selector, lambda n: [(1, 0), (-1, 1)]]
)
def test_iss2_matches_reference(n_sources, selector):
    from ssspy.bss._update_spatial_model import update_by_iss2 as ref

    _, _, Y, varphi = _fixtures(n_sources=n_sources, seed=40 + n_sources)
    ours = np.asarray(update_by_iss2(Y, varphi, pair_selector=selector))
    theirs = ref(Y.copy(), varphi, pair_selector=selector)
    # same gauge freedom as IP2: one phase per (source, bin) row
    assert_allclose_up_to_phase(
        ours.reshape(-1, ours.shape[-1]), theirs.reshape(-1, theirs.shape[-1]), atol=1e-7
    )


@requires_reference
@pytest.mark.parametrize("n_sources", [2, 3])
def test_ipa_matches_reference(n_sources):
    from ssspy.bss._update_spatial_model import update_by_ipa as ref

    _, _, Y, varphi = _fixtures(n_sources=n_sources, seed=50 + n_sources)
    ours = np.asarray(update_by_ipa(Y, varphi))
    theirs = ref(Y.copy(), varphi)
    assert np.allclose(ours, theirs, atol=1e-6)


@requires_reference
def test_vcd_matches_reference():
    from ssspy.bss._update_spatial_model import (
        update_by_block_decomposition_vcd as ref,
    )

    W, RXX = _vcd_fixtures(seed=60)
    ours = np.asarray(update_by_block_decomposition_vcd(W, RXX))
    theirs = ref(W.copy(), RXX, overwrite=False)
    assert np.allclose(ours, theirs, atol=1e-7)
