"""Device-placement guard: complex class paths on complex-free backends."""

import jax.numpy as jnp
import numpy as np
import pytest

import ssspy_tpu.utils.backend as backend_mod


def test_backend_supports_complex_on_cpu():
    assert backend_mod.backend_supports_complex() is True


def test_known_rejecting_platform_short_circuits_without_device_contact(
    monkeypatch,
):
    """On axon the dynamic probe is destructive: the complex device_put is
    accepted but wedges the remote stream so every later request (even
    f32 transfers) returns UNIMPLEMENTED. Known-rejecting platforms must
    therefore resolve WITHOUT touching the device."""
    import jax

    def boom(*a, **k):
        raise AssertionError("probe touched the device")

    monkeypatch.setattr(jax, "device_put", boom)
    monkeypatch.delitem(backend_mod._COMPLEX_SUPPORT, "axon", raising=False)
    assert backend_mod._supports_complex("axon") is False
    assert backend_mod._COMPLEX_SUPPORT["axon"] is False


def test_rejecting_plugin_detected_behind_generic_platform_name(monkeypatch):
    """axon's PJRT client reports platform "tpu" (jax.default_backend()
    never says "axon"); the plugin name only appears in the backend
    registry and the jax_platforms selection string. The short-circuit
    must fire from those — measured round 5: keying off the platform
    name alone let the probe run and wedge the stream."""
    import jax
    from jax._src import xla_bridge as xb

    def boom(*a, **k):
        raise AssertionError("probe touched the device")

    monkeypatch.setattr(jax, "device_put", boom)
    monkeypatch.setattr(xb, "backends", lambda: {"axon": object()})
    monkeypatch.setattr(backend_mod, "_COMPLEX_SUPPORT", {})
    assert backend_mod._supports_complex("tpu") is False
    assert backend_mod._COMPLEX_SUPPORT["tpu"] is False


def test_class_path_raises_actionable_error_on_complex_free_backend(monkeypatch):
    """When the probe reports no complex support, a complex class run must
    raise a RuntimeError naming the fast-path alternative (not an opaque
    backend failure)."""
    from ssspy_tpu.bss.iva import AuxIVA

    monkeypatch.setattr(backend_mod, "backend_supports_complex", lambda: False)

    rng = np.random.default_rng(0)
    X = rng.standard_normal((2, 9, 12)) + 1j * rng.standard_normal((2, 9, 12))
    iva = AuxIVA(
        spatial_algorithm="IP1",
        contrast_fn=lambda y: 2 * jnp.linalg.norm(y, axis=1),
        d_contrast_fn=lambda y: 2 * jnp.ones_like(y),
    )
    with pytest.raises(RuntimeError, match="fast_auxiva"):
        iva(X, n_iter=2)


def test_real_state_not_guarded(monkeypatch):
    """Real-dtype algorithms (time-domain ICA) must not trip the guard."""
    from ssspy_tpu.bss.ica import NaturalGradLaplaceICA

    monkeypatch.setattr(backend_mod, "backend_supports_complex", lambda: False)

    rng = np.random.default_rng(1)
    x = rng.laplace(size=(2, 2000))
    ica = NaturalGradLaplaceICA(step_size=0.05)
    y = np.asarray(ica(x, n_iter=3))
    assert np.all(np.isfinite(y))
