"""Serving-side neural G2P: numpy-only greedy decode of the trained
char→phone transformer (text/g2p_model.py, trained by train_g2p.py).

This is the front door's OOV fallback (the analogue of the reference's
``g2p_en`` neural model, reference: synthesize.py:8,33-35).  It runs in
the text frontend of every CLI and the HTTP server, so it must be pure
numpy — importing jax here would dial the TPU relay from every process
(CLAUDE.md relay hazards) and cost ~seconds of import time.

The checkpoint is a plain .npz committed at text/data/neural_g2p_en.npz
(~3 MB); ``load_default()`` memoizes it.  Each decode returns a
confidence (mean per-token log-prob); the front door routes to the rule
L2S below a threshold calibrated on the burned blind4 set (stored in
the npz meta by scripts/g2p_calibrate.py).
"""

import json
import os
import threading
from typing import List, Optional, Tuple

import numpy as np

from efficientspeech_tpu.text import g2p_model as M

DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "data",
                            "neural_g2p_en.npz")

_lock = threading.Lock()
_default = None
_default_tried = False


class NeuralG2p:
    """word → (phones, confidence); thread-safe, with a small LRU."""

    def __init__(self, path: str = DEFAULT_PATH, cache_size: int = 4096):
        z = np.load(path)
        self.params = {k[2:]: z[k] for k in z.files if k.startswith("p_")}
        self.meta = {}
        if "__meta" in z.files:
            self.meta = json.loads(bytes(z["__meta"]).decode())
        self.threshold = float(self.meta.get("route_threshold", -0.35))
        self._cache = {}
        self._cache_size = cache_size

    def __call__(self, word: str) -> Tuple[List[str], float]:
        """(phones, mean per-token log-prob); ([], -inf) when the word
        can't be encoded (too long / non-alphabetic)."""
        got = self._cache.get(word)
        if got is not None:
            return list(got[0]), got[1]
        src = M.encode_word(word)
        if src is None:
            return [], float("-inf")
        toks, conf = M.greedy_decode(self.params, src[None, :])
        phones = M.tokens_to_phones(toks[0])
        c = float(conf[0]) if phones else float("-inf")
        if len(self._cache) >= self._cache_size:
            self._cache.clear()
        self._cache[word] = (phones, c)
        return list(phones), c

    def confident(self, word: str) -> Optional[List[str]]:
        """phones when confidence clears the routing threshold, else
        None (caller falls back to the rule L2S)."""
        phones, conf = self(word)
        if phones and conf >= self.threshold:
            return phones
        return None


def load_default() -> Optional[NeuralG2p]:
    """Memoized default model; None when the checkpoint is absent or
    unreadable (the front door then behaves exactly as before)."""
    global _default, _default_tried
    with _lock:
        if _default_tried:
            return _default
        _default_tried = True
        try:
            if os.path.isfile(DEFAULT_PATH):
                _default = NeuralG2p(DEFAULT_PATH)
        except Exception:
            _default = None
        return _default


def reset_default_cache() -> None:
    """Testing hook: forget the memoized default model."""
    global _default, _default_tried
    with _lock:
        _default = None
        _default_tried = False
