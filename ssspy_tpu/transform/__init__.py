from .pca import pca
from .stft import get_window, istft, stft
from .whiten import whiten

__all__ = ["pca", "whiten", "stft", "istft", "get_window"]
