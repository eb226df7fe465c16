"""JAX Lasso / LassoCV for kernel-ridge-style regression on gkm kernels.

Replaces the reference's sklearn ``LassoCV(cv=5)`` on kernel rows
(old_utils.py:452-499, results/run_gridsearch_for_regression.py). FISTA
(accelerated proximal gradient) with a power-iteration Lipschitz estimate,
fully jitted; the CV alpha path mirrors sklearn's eps/n_alphas grid.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

@functools.partial(jax.jit, static_argnames=("max_iter",))
def _fista(Xc, yc, alpha, L, max_iter: int, tol: float):
    """min_w (1/2n)||yc - Xc w||^2 + alpha ||w||_1 (centered data)."""
    n = Xc.shape[0]

    def soft(u, t):
        return jnp.sign(u) * jnp.maximum(jnp.abs(u) - t, 0.0)

    def body(state):
        w, z, tk, it, _ = state
        grad = Xc.T @ (Xc @ z - yc) / n
        w_new = soft(z - grad / L, alpha / L)
        t_new = (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk)) / 2.0
        z_new = w_new + ((tk - 1.0) / t_new) * (w_new - w)
        delta = jnp.max(jnp.abs(w_new - w))
        return w_new, z_new, t_new, it + 1, delta

    def cond(state):
        _, _, _, it, delta = state
        return (it < max_iter) & (delta > tol)

    w0 = jnp.zeros(Xc.shape[1])
    state = (w0, w0, jnp.asarray(1.0, w0.dtype), jnp.int32(0), jnp.asarray(jnp.inf, w0.dtype))
    w, _, _, iters, _ = jax.lax.while_loop(cond, body, state)
    return w, iters


@dataclass
class Lasso:
    alpha: float = 1.0
    max_iter: int = 5000
    tol: float = 1e-6

    def fit(self, X, y) -> "Lasso":
        X = jnp.asarray(np.asarray(X, dtype=np.float32))
        y = jnp.asarray(np.asarray(y, dtype=np.float32))
        self._x_mean = jnp.mean(X, axis=0)
        self._y_mean = jnp.mean(y)
        Xc = X - self._x_mean
        yc = y - self._y_mean
        # Lipschitz constant of the quadratic part via power iteration
        v = jnp.ones(X.shape[1]) / np.sqrt(X.shape[1])
        for _ in range(20):
            v = Xc.T @ (Xc @ v)
            v = v / (jnp.linalg.norm(v) + 1e-12)
        L = jnp.linalg.norm(Xc.T @ (Xc @ v)) / X.shape[0] + 1e-8
        w, self.n_iter_ = _fista(
            Xc, yc, self.alpha, L, self.max_iter, self.tol
        )
        self.coef_ = np.asarray(w, dtype=np.float64)
        self.intercept_ = float(
            self._y_mean - jnp.dot(self._x_mean, w)
        )
        return self

    def predict(self, X) -> np.ndarray:
        return np.asarray(X, dtype=np.float64) @ self.coef_ + self.intercept_

    def score(self, X, y) -> float:
        from ..metrics import r2_score

        return r2_score(np.asarray(y, dtype=np.float64), self.predict(X))


@dataclass
class LassoCV:
    """5-fold CV over an eps-grid of alphas (sklearn LassoCV semantics)."""

    cv: int = 5
    n_alphas: int = 30
    eps: float = 1e-3
    max_iter: int = 5000
    tol: float = 1e-5
    random_state: int = 0
    alphas_: Optional[np.ndarray] = field(default=None, repr=False)

    def fit(self, X, y) -> "LassoCV":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n = len(y)
        Xc = X - X.mean(axis=0)
        yc = y - y.mean()
        alpha_max = np.max(np.abs(Xc.T @ yc)) / n
        alpha_max = max(alpha_max, 1e-12)
        self.alphas_ = np.logspace(
            np.log10(alpha_max * self.eps), np.log10(alpha_max), self.n_alphas
        )[::-1]

        rng = np.random.default_rng(self.random_state)
        order = rng.permutation(n)
        folds = np.array_split(order, self.cv)
        mse = np.zeros(len(self.alphas_))
        for f in folds:
            tr = np.setdiff1d(np.arange(n), f)
            for ai, alpha in enumerate(self.alphas_):
                model = Lasso(alpha=float(alpha), max_iter=self.max_iter, tol=self.tol)
                model.fit(X[tr], y[tr])
                pred = model.predict(X[f])
                mse[ai] += float(np.mean((pred - y[f]) ** 2))
        self.mse_path_ = mse / self.cv
        self.alpha_ = float(self.alphas_[int(np.argmin(self.mse_path_))])
        best = Lasso(alpha=self.alpha_, max_iter=self.max_iter, tol=self.tol)
        best.fit(X, y)
        self.coef_ = best.coef_
        self.intercept_ = best.intercept_
        self._model = best
        return self

    def predict(self, X) -> np.ndarray:
        return self._model.predict(X)

    def score(self, X, y) -> float:
        return self._model.score(X, y)
