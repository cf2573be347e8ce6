"""MLP stability-classifier training.

Parity: ``minbody/train_mlp.py:29-267`` (MLPTrainer): load + scale,
Adam lr 1e-3, BCE-with-logits, batch 32, <= 200 epochs with early
stopping (patience 20), optimal threshold by Youden's J over 100
thresholds on the validation set, test metrics
(accuracy/precision/recall/F1/AUROC), artifact saving
(mlp_model + scaler + model_metadata.json).

TPU-first: Flax/optax with a jitted train step; the full (tiny)
dataset is padded to full batches so every epoch is a single
``lax``-friendly loop of fixed-shape steps.
"""

from __future__ import annotations

import json
import pickle
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .dataset import StabilityDataset
from .data_utils import DataUtils
from .model_zoo import MLP
from ..utils.seeding import set_global_seed


def bce_with_logits(logits, labels):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits.squeeze(-1),
                                                       labels))


class MLPTrainer:
    def __init__(self, csv_path: str = "stability_data.csv", device=None,
                 seed: int = 42, features: str = "all"):
        """``features``: 'all' | 'pre' | 'post' — the honest headline
        classifier trains on 'pre' (pre-integration columns only; the
        post-integration group contains the quantities that define
        is_stable, so training on it is label leakage — VERDICT round-1
        item 1)."""
        self.csv_path = csv_path
        self.seed = seed
        self.features = features
        self.model = MLP()
        self.params = None
        self.scaler = None
        self.optimal_threshold = 0.5
        self.feature_names = None

    # ------------------------------------------------------------------
    def load_and_prepare_data(self):
        X, y, feature_names = StabilityDataset.load(self.csv_path,
                                                    features=self.features)
        self.feature_names = feature_names
        if len(X) == 0:
            print("[error] No data loaded")
            return None
        out = DataUtils.split_and_scale(X, y, test_size=0.15, val_size=0.15,
                                        seed=42)
        if out[0] is None:
            print("[error] Data splitting failed")
            return None
        X_train, X_val, X_test, y_train, y_val, y_test, scaler = out
        self.scaler = scaler
        print(f"Data shapes: train={X_train.shape}, val={X_val.shape}, "
              f"test={X_test.shape}")
        return (X_train.astype(np.float32), y_train.astype(np.float32),
                X_val.astype(np.float32), y_val.astype(np.float32),
                X_test.astype(np.float32), y_test.astype(np.float32))

    # ------------------------------------------------------------------
    def train(self, X_train, y_train, X_val, y_val, epochs: int = 200,
              patience: int = 20, batch_size: int = 32, lr: float = 1e-3):
        key = jax.random.PRNGKey(self.seed)
        key, init_key = jax.random.split(key)
        params = self.model.init(init_key,
                                 jnp.zeros((1, X_train.shape[1]), jnp.float32))
        tx = optax.adam(lr)
        opt_state = tx.init(params)

        n = len(X_train)
        steps = max(1, n // batch_size)
        Xd = jnp.asarray(X_train)
        yd = jnp.asarray(y_train)
        Xv = jnp.asarray(X_val)
        yv = jnp.asarray(y_val)

        # One jitted scan per epoch (per-batch dispatch is round-trip
        # bound on a remote accelerator link).  The data arrays are
        # explicit arguments, NOT closure captures: closed-over arrays
        # are embedded in the lowered program, and at >= 1e6 rows that
        # blows the axon remote-compile request limit (HTTP 413).
        @jax.jit
        def train_epoch(params, opt_state, perm, key, Xd, yd, Xv, yv):
            def body(carry, idx):
                params, opt_state, key = carry
                key, dk = jax.random.split(key)
                xb = Xd[idx]
                yb = yd[idx]

                def loss_fn(p):
                    logits = self.model.apply(p, xb, train=True,
                                              rngs={"dropout": dk})
                    return bce_with_logits(logits, yb)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state,
                        key), loss

            (params, opt_state, key), losses = jax.lax.scan(
                body, (params, opt_state, key), perm)
            val = bce_with_logits(self.model.apply(params, Xv, train=False),
                                  yv)
            return params, opt_state, key, jnp.mean(losses), val

        best_val = np.inf
        best_params = params
        patience_ctr = 0
        rng = np.random.default_rng(self.seed)

        for epoch in range(epochs):
            perm = rng.permutation(n)[: steps * batch_size].reshape(
                steps, batch_size)
            params, opt_state, key, ep_loss_j, val_loss_j = train_epoch(
                params, opt_state, jnp.asarray(perm), key, Xd, yd, Xv, yv)
            ep_loss = float(ep_loss_j)
            val_loss = float(val_loss_j)
            if epoch % 10 == 0:
                print(f"Epoch {epoch}: Train Loss = {ep_loss:.4f}, "
                      f"Val Loss = {val_loss:.4f}")
            if val_loss < best_val:
                best_val = val_loss
                best_params = params
                patience_ctr = 0
            else:
                patience_ctr += 1
            if patience_ctr >= patience:
                print(f"Early stopping at epoch {epoch}")
                break

        self.params = best_params

    # ------------------------------------------------------------------
    def predict_proba(self, X):
        logits = self.model.apply(self.params, jnp.asarray(X, jnp.float32),
                                  train=False)
        return np.asarray(jax.nn.sigmoid(logits)).squeeze(-1)

    def compute_optimal_threshold(self, X_val, y_val):
        """Youden's J over 100 thresholds (train_mlp.py:141-187)."""
        probs = self.predict_proba(X_val)
        best_j, best_t = -1.0, 0.5
        for t in np.linspace(0.1, 0.9, 100):
            preds = (probs > t).astype(int)
            tp = np.sum((preds == 1) & (y_val == 1))
            tn = np.sum((preds == 0) & (y_val == 0))
            fp = np.sum((preds == 1) & (y_val == 0))
            fn = np.sum((preds == 0) & (y_val == 1))
            tpr = tp / (tp + fn) if (tp + fn) > 0 else 0
            tnr = tn / (tn + fp) if (tn + fp) > 0 else 0
            j = tpr + tnr - 1
            if j > best_j:
                best_j, best_t = j, t
        self.optimal_threshold = best_t
        print(f"Optimal threshold (Youden index): {best_t:.3f}")

    def evaluate(self, X_test, y_test) -> dict:
        probs = self.predict_proba(X_test)
        preds = (probs > self.optimal_threshold).astype(int)
        metrics = _binary_metrics(y_test, preds, probs)
        print("\nTest Set Performance:")
        print(f"Threshold used: {self.optimal_threshold:.3f}")
        for k in ("accuracy", "precision", "recall", "f1", "auroc"):
            print(f"{k.capitalize()}: {metrics[k]:.4f}")
        return metrics

    def save_model(self, prefix: str = ""):
        with open(prefix + "mlp_model.msgpack", "wb") as f:
            from flax import serialization

            f.write(serialization.to_bytes(self.params))
        print("Model saved to mlp_model.msgpack")
        with open(prefix + "scaler.pkl", "wb") as f:
            pickle.dump(self.scaler, f)
        print("Scaler saved to scaler.pkl")
        metadata = {
            "feature_names": self.feature_names,
            "optimal_threshold": float(self.optimal_threshold),
            "input_dim": int(np.asarray(
                self.params["params"]["Dense_0"]["kernel"]).shape[0]),
        }
        with open(prefix + "model_metadata.json", "w") as f:
            json.dump(metadata, f, indent=2)
        print("Model metadata saved to model_metadata.json")

    @classmethod
    def load_model(cls, prefix: str = "", csv_path: str = ""):
        """Rebuild an inference-ready trainer from ``save_model``
        artifacts (the reference reloads mlp_model.pth + scaler.pkl the
        same way for its >= 1e5x-speedup serving claim, README.md:56;
        scalers via scaler_utils.py:20-29)."""
        from flax import serialization

        from .model_zoo import make_mlp

        with open(prefix + "model_metadata.json") as f:
            meta = json.load(f)
        trainer = cls(csv_path, features="pre")
        trainer.feature_names = meta["feature_names"]
        trainer.optimal_threshold = float(meta["optimal_threshold"])
        _model, params0 = make_mlp(int(meta["input_dim"]))
        with open(prefix + "mlp_model.msgpack", "rb") as f:
            trainer.params = serialization.from_bytes(params0, f.read())
        with open(prefix + "scaler.pkl", "rb") as f:
            trainer.scaler = pickle.load(f)
        return trainer

    def run(self):
        data = self.load_and_prepare_data()
        if data is None:
            return
        X_train, y_train, X_val, y_val, X_test, y_test = data
        print("Starting training...")
        self.train(X_train, y_train, X_val, y_val)
        print("\nComputing optimal threshold on validation set...")
        self.compute_optimal_threshold(X_val, y_val)
        print("\nEvaluating on test set...")
        metrics = self.evaluate(X_test, y_test)
        self.save_model()
        return metrics


def _binary_metrics(y_true, y_pred, y_prob) -> dict:
    y_true = np.asarray(y_true).astype(int)
    y_pred = np.asarray(y_pred).astype(int)
    tp = np.sum((y_pred == 1) & (y_true == 1))
    tn = np.sum((y_pred == 0) & (y_true == 0))
    fp = np.sum((y_pred == 1) & (y_true == 0))
    fn = np.sum((y_pred == 0) & (y_true == 1))
    acc = (tp + tn) / max(len(y_true), 1)
    prec = tp / (tp + fp) if (tp + fp) else 0.0
    rec = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    tpr = tp / (tp + fn) if (tp + fn) else 0.0
    tnr = tn / (tn + fp) if (tn + fp) else 0.0
    try:
        from sklearn.metrics import roc_auc_score

        auroc = float(roc_auc_score(y_true, y_prob))
    except Exception:
        auroc = _auroc_np(y_true, y_prob)
    return dict(accuracy=float(acc), precision=float(prec),
                recall=float(rec), f1=float(f1), auroc=auroc,
                balanced_accuracy=float(0.5 * (tpr + tnr)),
                tpr=float(tpr), tnr=float(tnr))


def _auroc_np(y_true, y_prob) -> float:
    order = np.argsort(y_prob)
    ranks = np.empty_like(order, dtype=float)
    ranks[order] = np.arange(1, len(y_prob) + 1)
    pos = y_true == 1
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2)
                 / (n_pos * n_neg))


def main():
    set_global_seed(42)
    trainer = MLPTrainer()
    trainer.run()


if __name__ == "__main__":
    main()
