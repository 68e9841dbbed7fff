"""Backend capability probes and device-placement guards.

Some TPU runtimes (including the axon PJRT backend this project benches
on) reject complex dtypes outright, so the complex64 class API
(:mod:`ssspy_tpu.bss`) cannot execute there — only the split-complex
fast paths (:mod:`ssspy_tpu.fast`) can. These helpers turn the backend's
opaque ``UNIMPLEMENTED`` failures into actionable errors naming the
fast-path alternative.
"""

import jax
import jax.numpy as jnp

__all__ = ["backend_supports_complex", "require_complex_support"]

_FAST_PATHS = (
    "the split-complex fast paths run on this backend instead: "
    "ssspy_tpu.fast.fast_auxiva / fast_gauss_ilrma / fast_aux_fdica / "
    "fast_gauss_mnmf / fast_auxiva_wave, or force CPU execution with "
    "jax.config.update('jax_platforms', 'cpu')"
)


# Manual cache instead of lru_cache: a transient tunnel failure during
# the probe (timeout, first-contact flake) must NOT permanently mark the
# backend complex-unsupported — only a definitive dtype rejection is
# worth caching negatively.
_COMPLEX_SUPPORT: dict = {}

_COMPLEX_REJECTION_MARKERS = ("UNIMPLEMENTED", "complex", "Complex", "COMPLEX")


# Platforms known to reject complex dtypes wholesale. Short-circuited
# WITHOUT touching the device: on axon the dynamic probe itself is
# destructive — the complex device_put is accepted (only the readback
# fails, see CLAUDE.md), but it leaves the remote stream wedged so that
# EVERY subsequent request, including plain f32 transfers, returns
# UNIMPLEMENTED (observed round 5: all 27 kernel smokes passed, then the
# first class path ran this probe and every later call in the process
# failed, down to a float32 device_put).
_KNOWN_COMPLEX_REJECTING = ("axon",)


def _platform_identifiers(platform: str) -> set:
    """Every name the current default backend answers to.

    ``jax.default_backend()`` returns the PJRT client's *platform*
    attribute, which remote plugins set to the hardware class — axon
    reports ``"tpu"`` even though it registers (and is selected) under
    the plugin name ``"axon"`` (measured round 5: the ``"axon"``-only
    short-circuit never fired and the probe wedged the stream anyway).
    The registry keys and the ``jax_platforms`` selection string carry
    the plugin name, so the known-rejecting check scans all three.
    """
    names = {platform}
    try:
        from jax._src import xla_bridge as xb

        names.update(xb.backends().keys())
    except Exception:  # noqa: BLE001 - identification must never raise
        pass
    try:
        selection = jax.config.jax_platforms
        if selection:
            names.update(p.strip() for p in str(selection).split(","))
    except Exception:  # noqa: BLE001
        pass
    return names


def _supports_complex(platform: str) -> bool:
    if platform in _COMPLEX_SUPPORT:
        return _COMPLEX_SUPPORT[platform]
    if _platform_identifiers(platform) & set(_KNOWN_COMPLEX_REJECTING):
        _COMPLEX_SUPPORT[platform] = False
        return False
    import numpy as np

    try:
        x = jax.device_put(jnp.ones((2,), dtype=jnp.complex64))
        # force a host readback: on remote-execution backends
        # block_until_ready() can resolve before the computation actually
        # runs, so the device-to-host copy is the only trustworthy probe
        value = np.asarray(jnp.sum(x))
        ok = bool(np.isfinite(value.real))
        _COMPLEX_SUPPORT[platform] = ok
        return ok
    except Exception as exc:  # noqa: BLE001 - probe must never raise
        # Cache the negative only when the backend definitively rejected
        # the dtype; transient failures stay uncached so a retry can
        # succeed.
        if any(m in str(exc) for m in _COMPLEX_REJECTION_MARKERS):
            _COMPLEX_SUPPORT[platform] = False
        return False


def backend_supports_complex() -> bool:
    """True if the default backend can place and compute complex arrays.

    Probed once per platform; positive results and definitive dtype
    rejections are cached, transient probe failures are retried on the
    next call (the probe costs one tiny transfer; on tunnel backends the
    first device contact dominates and happens regardless).
    """
    return _supports_complex(jax.default_backend())


def require_complex_support(who: str) -> None:
    """Raise a clear, actionable error when the default backend rejects
    complex dtypes (instead of the opaque UNIMPLEMENTED it would throw
    mid-trace)."""
    if not backend_supports_complex():
        raise RuntimeError(
            f"{who} traces a complex-dtype program, but the default JAX "
            f"backend ({jax.default_backend()}) rejects complex arrays; "
            + _FAST_PATHS
        )
