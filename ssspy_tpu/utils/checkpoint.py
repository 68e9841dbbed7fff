"""Checkpoint / resume for separation runs.

The reference's resume story is implicit: ``_reset`` accepts arbitrary
kwargs that become warm-start state, and ``initial_call=False`` skips
the duplicate loss entry (SURVEY.md §5.4). These helpers make it
explicit: capture a method's optimizer state as plain numpy arrays,
persist to ``.npz``, and feed it back through ``__call__`` kwargs.

>>> iva = AuxLaplaceIVA(spatial_algorithm="IP")
>>> iva(spectrogram, n_iter=50)
>>> save_checkpoint("run.npz", iva)
>>> iva2 = AuxLaplaceIVA(spatial_algorithm="IP")
>>> resume(iva2, spectrogram, "run.npz", n_iter=50)   # iterations 51-100
"""

from typing import Dict, Optional

import numpy as np

__all__ = ["state_dict", "save_checkpoint", "load_checkpoint", "resume"]

# attribute -> __call__ kwarg name is the identity for every algorithm;
# these are the warm-startable optimizer states across all families
_STATE_ATTRS = (
    "demix_filter",
    "basis",
    "activation",
    "latent",
    "spatial",
    "diagonalizer",
    "mixing",
    "covariance",
    "dual",
    "dual1",
    "dual2",
    "auxiliary1",
    "auxiliary2",
    "variance",
    "output",
)

# input-derived scan-state keys that _reset recomputes deterministically;
# checkpointing them would bloat files and plant bogus warm-start kwargs
_INPUT_DERIVED_KEYS = frozenset({"X", "Xw", "Xu", "XX"})


# scan-state pytree key -> __call__ warm-start kwarg
_STATE_KEY_TO_KWARG = {
    "W": "demix_filter",
    "Y": "output",
    "T": "basis",
    "V": "activation",
    "Z": "latent",
    "H": "spatial",
    "D": "spatial",
    "Q": "diagonalizer",
    "alpha": "mixing",
    "B": "covariance",
    "dual": "dual",
    "dual1": "dual1",
    "dual2": "dual2",
    "auxiliary1": "auxiliary1",
    "auxiliary2": "auxiliary2",
    "variance": "variance",
}


def state_dict(method) -> Dict[str, np.ndarray]:
    """Warm-start state of a separation method as numpy arrays.

    Prefers the raw scan state (``method._state``) over the public
    attributes: post-loop scale restoration rescales the attributes, and
    resuming from rescaled filters would change the trajectory.
    """
    out = {}
    state = getattr(method, "_state", None)
    if state is not None:
        # split-complex engine runs carry planar [real, imag] f32 leaves;
        # warm-start kwargs are complex host arrays, so convert W/Y/B back
        # (signal: the state's input leaf is real while the input is complex)
        state_input = state.get("X", state.get("Xu"))
        sc_mode = (
            state_input is not None
            and not np.iscomplexobj(np.asarray(state_input))
            and np.iscomplexobj(np.asarray(getattr(method, "input", None)))
        )
        for key, value in state.items():
            if key in _INPUT_DERIVED_KEYS or value is None:
                continue
            if sc_mode and key in ("W", "Y", "B"):
                planar = np.asarray(value)
                out[_STATE_KEY_TO_KWARG[key]] = planar[0] + 1j * planar[1]
            elif key.startswith("T") and key[1:].isdigit():  # IPSDTA parts
                out[f"basis.{key[1:]}"] = np.asarray(value)
            elif key in _STATE_KEY_TO_KWARG:
                out[_STATE_KEY_TO_KWARG[key]] = np.asarray(value)
            else:
                out[key] = np.asarray(value)
    else:
        for name in _STATE_ATTRS:
            value = getattr(method, name, None)
            if value is None:
                continue
            if isinstance(value, tuple):  # IPSDTA block-decomposed basis
                for idx, part in enumerate(value):
                    out[f"{name}.{idx}"] = np.asarray(part)
            else:
                out[name] = np.asarray(value)
    if getattr(method, "loss", None) is not None:
        out["loss"] = np.asarray(method.loss)
    return out


def save_checkpoint(path: str, method) -> None:
    """Persist a method's optimizer state to ``.npz``."""
    np.savez_compressed(path, **state_dict(method))


def load_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint into ``__call__``-ready warm-start kwargs."""
    data = dict(np.load(path))
    loss = data.pop("loss", None)

    # reassemble tuple-valued leaves (e.g. IPSDTA basis parts)
    tuples: Dict[str, list] = {}
    for key in [k for k in data if "." in k]:
        name, idx = key.rsplit(".", 1)
        tuples.setdefault(name, []).append((int(idx), data.pop(key)))
    for name, parts in tuples.items():
        data[name] = tuple(v for _, v in sorted(parts))

    if loss is not None:
        data["__loss__"] = loss
    return data


def resume(method, input, path: str, n_iter: int = 100, **kwargs):
    """Continue a run from a checkpoint without duplicating history.

    Restores the loss history onto ``method`` and invokes it with the
    checkpointed state as warm-start kwargs and ``initial_call=False``.
    ``output`` is only passed through for demix-free (ISS/IPA) methods,
    signalled by a checkpointed ``demix_filter`` of ``None``/absence.
    """
    state = load_checkpoint(path)
    loss = state.pop("__loss__", None)

    if "demix_filter" in state:
        state.pop("output", None)
    elif "output" in state:
        # demix-free (ISS/IPA) state: pass demix_filter=None explicitly so
        # _reset keeps the warm-started spectrogram instead of re-initializing
        state["demix_filter"] = None

    if loss is not None and method.record_loss:
        method.loss = [float(v) for v in loss]

    # caller kwargs take precedence over checkpointed state
    return method(input, n_iter=n_iter, initial_call=False, **{**state, **kwargs})
