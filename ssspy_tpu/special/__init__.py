from .flooring import EPS, add_flooring, identity, max_flooring
from .logsumexp import logsumexp
from .psd import to_psd
from .softmax import softmax

__all__ = [
    "EPS",
    "add_flooring",
    "identity",
    "max_flooring",
    "to_psd",
    "softmax",
    "logsumexp",
]
