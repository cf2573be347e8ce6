"""Train/val/test splitting and scaling.

Parity: ``minbody/data_utils.py:26-89`` (DataUtils.split_and_scale):
stratified splits (degrading to unstratified when a class is too
small) + StandardScaler fit on train only; ``minbody/scaler_utils.py``
(ScalerUtils: rebuild a scaler from saved mean/scale).

sklearn is used when present (it is in this image); a NumPy fallback
keeps the module importable without it.
"""

from __future__ import annotations

import numpy as np

try:
    from sklearn.model_selection import train_test_split as _tts
    from sklearn.preprocessing import StandardScaler as _SkScaler

    _HAVE_SK = True
except Exception:  # pragma: no cover
    _HAVE_SK = False


class StandardScaler:
    """Minimal sklearn-compatible scaler (used when sklearn is absent
    and as the serializable core everywhere)."""

    def __init__(self):
        self.mean_ = None
        self.scale_ = None

    def fit(self, X):
        self.mean_ = np.mean(X, axis=0)
        sd = np.std(X, axis=0)
        self.scale_ = np.where(sd > 0, sd, 1.0)
        return self

    def transform(self, X):
        return (X - self.mean_) / self.scale_

    def fit_transform(self, X):
        return self.fit(X).transform(X)


class DataUtils:
    @staticmethod
    def split_and_scale(X, y, test_size: float = 0.2, val_size: float = 0.2,
                        seed: int = 42):
        """(X_train, X_val, X_test, y_train, y_val, y_test, scaler).

        Stratified when both classes have >= 2 members in every split
        stage, else unstratified (data_utils.py:34-66)."""
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if len(X) == 0:
            print("[error] empty dataset")
            return None, None, None, None, None, None, None

        def split(Xa, ya, frac, seed):
            strat = ya if _stratifiable(ya, frac) else None
            if _HAVE_SK:
                return _tts(Xa, ya, test_size=frac, random_state=seed,
                            stratify=strat)
            return _np_split(Xa, ya, frac, seed)

        X_rest, X_test, y_rest, y_test = split(X, y, test_size, seed)
        val_frac = val_size / (1.0 - test_size)
        X_train, X_val, y_train, y_val = split(X_rest, y_rest, val_frac, seed)

        scaler = _SkScaler() if _HAVE_SK else StandardScaler()
        X_train = scaler.fit_transform(X_train)
        X_val = scaler.transform(X_val)
        X_test = scaler.transform(X_test)
        return X_train, X_val, X_test, y_train, y_val, y_test, scaler


def _stratifiable(y, frac) -> bool:
    vals, counts = np.unique(y, return_counts=True)
    if len(vals) < 2:
        return False
    n_small = int(np.floor(len(y) * frac))
    return counts.min() >= 2 and n_small >= len(vals)


def _np_split(X, y, frac, seed):  # pragma: no cover - sklearn present here
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(X))
    n_test = int(round(len(X) * frac))
    te, tr = idx[:n_test], idx[n_test:]
    return X[tr], X[te], y[tr], y[te]


class ScalerUtils:
    @staticmethod
    def rebuild_scaler(mean, scale):
        """Reconstruct a fitted scaler from saved statistics
        (scaler_utils.py:20-29)."""
        sc = _SkScaler() if _HAVE_SK else StandardScaler()
        sc.mean_ = np.asarray(mean, dtype=np.float64)
        sc.scale_ = np.asarray(scale, dtype=np.float64)
        if _HAVE_SK:
            sc.var_ = sc.scale_ ** 2
            sc.n_features_in_ = sc.mean_.shape[0]
        return sc
