"""Distributed supervised training: full-batch logistic regression.

The missing family next to k-means (stages/sample.py) and PCA (the
embedding_cov sufficient-stats reduce): a SUPERVISED learner whose
per-iteration work is a sufficient-statistics reduce. Full-batch
gradient descent on the logistic loss is exactly Dataset-shaped:

  per iteration:  broadcast w  ->  per-batch gradient partial
                  X^T (sigmoid(Xw) - y)  (one numpy matmul per batch,
                  d+1 floats out)  ->  one Sum aggregate  ->  driver
                  update w -= lr * g / n.

Only the weight vector (d+1 floats) and the summed gradient ever touch
the driver; the feature matrix stays distributed and is materialized
ONCE (iterated consumption — the same pin rule as k-means' corpus and
PageRank's edges). Deterministic up to float summation order across
blocks (the usual distributed-float caveat; the pytest twin uses a
tolerance, the ACCURACY check is exact).

Public algorithm (textbook logistic regression); no reference
counterpart — the reference engine has no model training surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .link import get_broadcast


def _design(t: pa.Table, xcols) -> np.ndarray:
    cols = [np.ones(t.num_rows, dtype=np.float64)]
    cols += [t[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in xcols]
    return np.column_stack(cols)


def logreg_fit(ds, xcols, ycol: str, iters: int = 25, lr: float = 0.5):
    """Fit logistic regression on a Dataset with numeric feature columns
    ``xcols`` and a 0/1 label column ``ycol``. Returns (weights, n,
    train_accuracy) where weights[0] is the intercept. ``lr`` is the
    step on the MEAN gradient, so it is scale-free in corpus size."""
    import ray
    from ray.data.aggregate import Sum

    d = len(xcols) + 1
    gcols = [f"g{i}" for i in range(d)]
    data = ds.materialize()
    n = data.count()
    if n == 0:
        return np.zeros(d), 0, float("nan")
    w = np.zeros(d, dtype=np.float64)

    for _ in range(iters):
        w_ref = ray.put(w)

        def grad_partial(t: pa.Table, _wr=w_ref) -> pa.Table:
            wv = get_broadcast(_wr)
            X = _design(t, xcols)
            y = t[ycol].to_numpy(zero_copy_only=False).astype(np.float64)
            p = 1.0 / (1.0 + np.exp(-(X @ wv)))
            g = X.T @ (p - y)
            return pa.table({c: pa.array([g[i]], pa.float64())
                             for i, c in enumerate(gcols)})

        agg = data.map_batches(grad_partial, batch_format="pyarrow"
                               ).aggregate(*[Sum(c, alias_name=c)
                                             for c in gcols])
        g = np.array([agg[c] for c in gcols], dtype=np.float64)
        w = w - lr * g / n

    w_ref = ray.put(w)

    def acc_partial(t: pa.Table, _wr=w_ref) -> pa.Table:
        wv = get_broadcast(_wr)
        X = _design(t, xcols)
        y = t[ycol].to_numpy(zero_copy_only=False).astype(np.float64)
        pred = (X @ wv) > 0
        return pa.table({"ok": pa.array([int((pred == (y > 0.5)).sum())],
                                        pa.int64())})

    ok = data.map_batches(acc_partial, batch_format="pyarrow").aggregate(
        Sum("ok", alias_name="ok"))["ok"]
    return w, n, float(ok) / n
