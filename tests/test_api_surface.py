"""API-surface parity vs the reference: every public class/function a
ssspy user can reach must exist under the corresponding ssspy_tpu module.

This is the mechanical completeness guarantee behind the migration
guide's "port by changing the import" claim. Re-exported convenience
symbols (the reference re-exports e.g. ``update_by_ip1`` inside
``ssspy.bss.iva``) are checked against the whole ssspy_tpu package —
they live in their canonical module here rather than being re-exported.
Skipped when the reference is not importable.
"""

import importlib
import inspect

import pytest

ssspy = pytest.importorskip("ssspy", reason="NumPy reference not importable")

# reference module -> counterpart module; re-exports resolve package-wide
MODULE_MAP = {
    "ssspy": "ssspy_tpu",
    "ssspy.bss.base": "ssspy_tpu.bss.base",
    "ssspy.bss.ica": "ssspy_tpu.bss.ica",
    "ssspy.bss.fdica": "ssspy_tpu.bss.fdica",
    "ssspy.bss.iva": "ssspy_tpu.bss.iva",
    "ssspy.bss.ilrma": "ssspy_tpu.bss.ilrma",
    "ssspy.bss.ipsdta": "ssspy_tpu.bss.ipsdta",
    "ssspy.bss.mnmf": "ssspy_tpu.bss.mnmf",
    "ssspy.bss.cacgmm": "ssspy_tpu.bss.cacgmm",
    "ssspy.bss.proxbss": "ssspy_tpu.bss.proxbss",
    "ssspy.bss.pdsbss": "ssspy_tpu.bss.pdsbss",
    "ssspy.bss.admmbss": "ssspy_tpu.bss.admmbss",
    "ssspy.bss.hva": "ssspy_tpu.bss.hva",
    "ssspy.linalg": "ssspy_tpu.linalg",
    "ssspy.special": "ssspy_tpu.special",
    "ssspy.transform": "ssspy_tpu.transform",
    "ssspy.algorithm": "ssspy_tpu.algorithm",
    "ssspy.utils.select_pair": "ssspy_tpu.utils.select_pair",
    "ssspy.utils.flooring": "ssspy_tpu.utils.flooring",
    "ssspy.io": "ssspy_tpu.io",
}

# canonical homes for symbols the reference re-exports across modules
FALLBACK_MODULES = [
    "ssspy_tpu.bss._update_spatial_model",
    "ssspy_tpu.bss.base",
    "ssspy_tpu.linalg",
    "ssspy_tpu.special",
    "ssspy_tpu.transform",
    "ssspy_tpu.algorithm",
    "ssspy_tpu.utils.select_pair",
    "ssspy_tpu.utils.flooring",
    "ssspy_tpu.bss.proxbss",
    "ssspy_tpu.bss.pdsbss",
    "ssspy_tpu.bss.admmbss",
    "ssspy_tpu.io",
]


def _public_symbols(mod):
    out = []
    for name in dir(mod):
        if name.startswith("_"):
            continue
        obj = getattr(mod, name)
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        if not getattr(obj, "__module__", "").startswith("ssspy"):
            continue
        out.append(name)
    return sorted(out)


def _resolvable(name, primary):
    mods = [primary] + FALLBACK_MODULES
    for m in mods:
        try:
            mod = importlib.import_module(m)
        except ImportError:
            continue
        if hasattr(mod, name):
            return True
    return False


@pytest.mark.parametrize("ref_mod,our_mod", sorted(MODULE_MAP.items()))
def test_every_reference_symbol_has_a_counterpart(ref_mod, our_mod):
    ref = importlib.import_module(ref_mod)
    missing = [n for n in _public_symbols(ref) if not _resolvable(n, our_mod)]
    assert not missing, f"{ref_mod}: no counterpart for {missing}"
