"""utils tests: pair selectors, flooring resolution, dataset, profiling."""

import numpy as np
import pytest

from ssspy_tpu.special.flooring import identity, max_flooring
from ssspy_tpu.utils.flooring import choose_flooring_fn
from ssspy_tpu.utils.select_pair import combination_pair_selector, sequential_pair_selector


def test_sequential_pair_selector():
    assert list(sequential_pair_selector(3)) == [(0, 1), (1, 2), (2, 0)]
    assert list(sequential_pair_selector(4, step=2)) == [(0, 1), (2, 3)]
    assert list(sequential_pair_selector(3, sort=True)) == [(0, 1), (1, 2), (0, 2)]
    assert list(sequential_pair_selector(2, stop=1)) == [(0, 1)]


def test_combination_pair_selector():
    assert list(combination_pair_selector(3)) == [(0, 1), (0, 2), (1, 2)]
    assert list(combination_pair_selector(4)) == [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    ]


def test_choose_flooring_fn():
    assert choose_flooring_fn(None) is identity

    class Method:
        flooring_fn = staticmethod(lambda x: np.maximum(x, 1e-8))

    m = Method()
    assert choose_flooring_fn("self", method=m) is Method.flooring_fn

    custom = lambda x: x  # noqa: E731
    assert choose_flooring_fn(custom, method=m) is custom

    with pytest.raises(AssertionError):
        choose_flooring_fn("not-callable-string")


def test_dataset_cache_and_determinism(tmp_path):
    from ssspy_tpu.utils.dataset import download_sample_speech_data

    a, sr_a = download_sample_speech_data(
        cache_dir=str(tmp_path), n_sources=2, max_duration=0.1, conv=False, seed=3
    )
    b, sr_b = download_sample_speech_data(
        cache_dir=str(tmp_path), n_sources=2, max_duration=0.1, conv=False, seed=3
    )
    assert sr_a == sr_b
    np.testing.assert_array_equal(a, b)
    assert a.shape[0] == 2  # (n_sources, n_channels, n_samples)


def test_profiling_timed_and_stats():
    import jax.numpy as jnp

    from ssspy_tpu.utils.profiling import compiled_stats, timed

    def f(x):
        return (x @ x.T).sum()

    x = jnp.ones((64, 64))
    seconds, result = timed(f, x, warmup=1, repeat=2)
    assert seconds >= 0
    assert float(result) == 64 * 64 * 64

    stats = compiled_stats(f, x)
    assert stats is None or "flops" in stats
