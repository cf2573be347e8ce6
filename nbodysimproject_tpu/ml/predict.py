"""Fast stability inference on fresh initial conditions.

The product's headline capability (minbody/README.md:56: ML stability
prediction >= 1e5x faster than direct integration), productised: build
the pre-integration feature frame for a new (B, N, d) population
WITHOUT integrating (``analysis.batch.ic_feature_frame``), align it to
a trained model's saved feature schema, and score it — with the
per-cohort calibrated operating points shipped in the model metadata
(round-3 headline protocol) applied when the caller knows the cohort.

Artifacts consumed (written by tools/run_headline_dataset.py):
  <prefix>model_metadata.json   feature_names + optimal_threshold
                                (+ cohort_thresholds)
  <prefix>scaler.pkl            fitted StandardScaler
  <prefix>mlp_model.msgpack     Flax MLP params         [model="mlp"]
  <gbdt_prefix>gbdt_model.pkl   sklearn/lightgbm model  [model="gbdt"]
  <gbdt_prefix>metadata.json    cohort_thresholds (gbdt)
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np


def _load_json(path):
    with open(path) as f:
        return json.load(f)


def feature_matrix(df, feature_names):
    """Align a frame (e.g. from ``ic_feature_frame``) to a trained
    model's feature schema; NaN -> 0 exactly like the dataset loader
    (ml/dataset.py)."""
    missing = [c for c in feature_names if c not in df.columns]
    if missing:
        raise ValueError(f"frame is missing model features: {missing}")
    X = df[list(feature_names)].to_numpy(np.float64)
    return np.nan_to_num(X, nan=0.0)


class StabilityPredictor:
    """Score (B, N, d) populations with a trained headline model."""

    def __init__(self, prefix: str = "data/headline_pre_",
                 model: str = "gbdt"):
        meta = _load_json(prefix + "model_metadata.json")
        self.feature_names = meta["feature_names"]
        self.threshold = float(meta.get("optimal_threshold", 0.5))
        self.cohort_thresholds = dict(meta.get("cohort_thresholds", {}))
        #: schema v2 (round 4): per-cohort isotonic calibration curves +
        #: one cost-curve-chosen operating point on the CALIBRATED
        #: probability (ml/calibrate.py) — supersedes the raw per-cohort
        #: thresholds when present
        self.calibration = meta.get("calibration")
        self.model_kind = model
        if model == "gbdt":
            gp = prefix + "gbdt_"
            with open(gp + "gbdt_model.pkl", "rb") as f:
                self._model = pickle.load(f)
            with open(gp + "scaler.pkl", "rb") as f:
                self._scaler = pickle.load(f)
            gmeta_path = gp + "metadata.json"
            if os.path.exists(gmeta_path):
                gmeta = _load_json(gmeta_path)
                self.cohort_thresholds = dict(
                    gmeta.get("cohort_thresholds", self.cohort_thresholds))
                self.threshold = float(self.cohort_thresholds.get(
                    "__global__", self.threshold))
                self.calibration = gmeta.get("calibration",
                                             self.calibration)
        elif model == "mlp":
            from .train_mlp import MLPTrainer

            self._trainer = MLPTrainer.load_model(prefix=prefix)
            self._scaler = self._trainer.scaler
            self._model = None
        else:
            raise ValueError(f"unknown model kind: {model}")

    def predict_frame(self, df, cohorts=None, return_raw=False):
        """(prob, is_stable) for a pre-integration feature frame.

        When the model ships a ``calibration`` block (schema v2), the
        returned probability is the COHORT-CALIBRATED P(stable | x)
        (pooled curve when the cohort is unknown / uncurved) and the
        verdict applies the single shipped operating point — the
        calibrated policy that dominates the round-3 raw per-cohort
        thresholds on both overall BA and close-encounter precision.
        Legacy metadata falls back to the per-cohort raw-threshold
        semantics.  ``return_raw=True`` additionally returns the
        uncalibrated model score."""
        X = feature_matrix(df, self.feature_names)
        Xs = self._scaler.transform(X) if self._scaler is not None else X
        if self.model_kind == "gbdt":
            raw = self._model.predict_proba(Xs)[:, 1]
        else:
            raw = np.asarray(self._trainer.predict_proba(Xs)).ravel()
        if self.calibration:
            from .calibrate import calibrated_probability

            prob = calibrated_probability(raw, cohorts, self.calibration)
            thr = float(self.calibration.get("global_threshold",
                                             self.threshold))
            points = self.calibration.get("cohort_operating_points") or {}
            if cohorts is not None and points:
                # recall-floor operating points for rare-positive
                # cohorts (close-encounter keeps TPR >= 0.9 at the
                # cohort's measured max precision) override the global
                # BA-optimal threshold for their cohort only
                thr_vec = np.full(len(prob), thr)
                cs = np.asarray([str(c) for c in cohorts])
                for c, t in points.items():
                    thr_vec[cs == c] = float(t)
                out = (prob, prob > thr_vec)
            else:
                out = (prob, prob > thr)
        else:
            thr = np.full(len(raw), self.threshold)
            if cohorts is not None and self.cohort_thresholds:
                thr = np.asarray([
                    float(self.cohort_thresholds.get(str(c),
                                                     self.threshold))
                    for c in cohorts])
            out = (raw, raw > thr)
        return out + (raw,) if return_raw else out

    def predict_population(self, mass, pos, vel, mask, cfg, *, G=1.0,
                           softening=0.05, min_softening=0.0, dt=0.01,
                           cohorts=None):
        """End to end: ICs -> pre-integration features -> (prob,
        is_stable), no integration anywhere.

        Arrays must use the slot-padded layout the model was trained
        on (mask False on unused slots): the headline models expect
        n_slots = 8, i.e. (B, 8[, d]) with per-body columns
        mass_0..7 — the shape every pipeline generator emits."""
        from ..analysis.batch import ic_feature_frame

        df = ic_feature_frame(mass, pos, vel, mask, cfg, G=G,
                              softening=softening,
                              min_softening=min_softening, dt=dt)
        return self.predict_frame(df, cohorts=cohorts)
