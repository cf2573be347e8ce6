"""Dataset I/O for the ML pipeline.

Parity: ``minbody/stability_dataset.py:18-122`` (StabilityDataset):
CSV with optional ``# feature_names:`` header comment,
``scaler_mean_*`` / ``scaler_scale_*`` metadata columns, exclusion of
simulation_id / is_stable / mode / dataset_version, NaN-row drop on
labels and NaN->0 on features.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


_EXCLUDE = ["simulation_id", "is_stable", "mode", "dataset_version"]


class StabilityDataset:
    @staticmethod
    def load(path: str) -> Tuple[np.ndarray, np.ndarray, List[str]]:
        import pandas as pd

        feature_names = None
        with open(path, "r") as f:
            first_line = f.readline()
            if first_line.startswith("# feature_names:"):
                feature_names = first_line.strip().split(":", 1)[1].strip().split(",")

        df = pd.read_csv(path, comment="#")
        if "is_stable" not in df.columns:
            print("[error] CSV must contain 'is_stable' column")
            return np.array([]), np.array([]), []

        exclude = list(_EXCLUDE)
        scaler_cols = [c for c in df.columns if c.startswith("scaler_")]
        exclude.extend(scaler_cols)
        # also exclude non-numeric tag columns the analyzers add
        for c in df.columns:
            if c not in exclude and not pd.api.types.is_numeric_dtype(df[c]):
                exclude.append(c)

        feature_cols = [c for c in df.columns if c not in exclude]
        if feature_names is None:
            feature_names = feature_cols

        X = df[feature_cols].values.astype(np.float64)
        y = df["is_stable"].values.astype(np.float64)

        valid = ~np.isnan(y)
        X, y = X[valid], y[valid]
        print(f"Loaded {len(X)} samples with {X.shape[1]} features")

        if np.any(np.isnan(X)) or np.any(~np.isfinite(X)):
            print("[warning] NaN values found in features. Replacing with 0.")
            X = np.nan_to_num(X, nan=0.0, posinf=0.0, neginf=0.0)
        return X, y, feature_names

    @staticmethod
    def get_metadata(path: str) -> Dict:
        import pandas as pd

        metadata = {"feature_names": None, "scaler_mean": None,
                    "scaler_scale": None}
        with open(path, "r") as f:
            first_line = f.readline()
            if first_line.startswith("# feature_names:"):
                metadata["feature_names"] = (
                    first_line.strip().split(":", 1)[1].strip().split(","))
        df = pd.read_csv(path, comment="#", nrows=1)
        mean_cols = sorted(c for c in df.columns if c.startswith("scaler_mean_"))
        scale_cols = sorted(c for c in df.columns if c.startswith("scaler_scale_"))
        if mean_cols:
            metadata["scaler_mean"] = df[mean_cols].iloc[0].values
        if scale_cols:
            metadata["scaler_scale"] = df[scale_cols].iloc[0].values
        return metadata

    @staticmethod
    def save(path: str, df, feature_names: List[str] | None = None) -> None:
        """Write a results DataFrame with the ``# feature_names:`` header
        the loader understands (format parity with the reference CSVs)."""
        with open(path, "w") as f:
            if feature_names:
                f.write("# feature_names: " + ",".join(feature_names) + "\n")
            df.to_csv(f, index=False)
