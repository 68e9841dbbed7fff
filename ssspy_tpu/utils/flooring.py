"""Resolution of ``flooring_fn="self" | None | callable`` (parity: ssspy/utils/flooring.py:8-24)."""

from typing import Any, Callable, Optional, Union

from ..special.flooring import identity


def choose_flooring_fn(
    flooring_fn: Optional[Union[str, Callable]] = "self",
    method: Optional[Any] = None,
) -> Callable:
    """Resolve a flooring spec against a method instance.

    ``None`` -> identity; ``"self"`` -> ``method.flooring_fn`` (or identity);
    a callable is returned as-is.
    """
    if flooring_fn is None:
        assert method is None, "a flooring method name was given without a flooring function."
        flooring_fn = identity
    elif isinstance(flooring_fn, str) and flooring_fn == "self":
        if method is None or not hasattr(method, "flooring_fn"):
            flooring_fn = identity
        else:
            flooring_fn = method.flooring_fn

    assert callable(flooring_fn), "flooring_fn must be callable."
    return flooring_fn
