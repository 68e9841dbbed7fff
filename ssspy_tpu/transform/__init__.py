from .pca import pca
from .stft import get_window, istft, istft_sc, stft, stft_sc
from .whiten import whiten

__all__ = ["pca", "whiten", "stft", "istft", "stft_sc", "istft_sc", "get_window"]
