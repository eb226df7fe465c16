"""User-facing FastSK model class.

Signature-compatible with the reference Python surface (bindings.cpp:12-51):
``FastSK(g, m, t=-1, approx=False, delta=0.025, max_iters=-1,
skip_variance=False)`` plus ``compute_kernel / compute_train /
get_train_kernel / get_test_kernel / get_stdevs / save_kernel / fit /
score``. Differences are deliberate improvements:

- ``t`` (thread count) is accepted for compatibility but parallelism is
  device-mesh driven (``KernelConfig.mesh``), not thread driven.
- approx mode is deterministic given ``seed`` (the reference seeds its work
  queue shuffle with time(0), fastsk_kernel.cpp:37).
- labels can be passed to ``compute_kernel`` (or via ``set_labels``) so
  ``fit``/``score`` actually work end-to-end — in the reference's released
  Python bindings the label members are never populated.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .kernel.config import KernelConfig
from .kernel.engine import ApproxResult, DenseGkmEngine, cosine_normalize
from .kernel.sorted_engine import SortedGkmEngine
from .ops.encode import EncodedSeqs, encode_sequences, validate_g


class FastSK:
    def __init__(
        self,
        g: int,
        m: int,
        t: int = -1,
        approx: bool = False,
        delta: float = 0.025,
        max_iters: int = -1,
        skip_variance: bool = False,
        seed: int = 0,
        config: Optional[KernelConfig] = None,
    ):
        self.g = int(g)
        self.m = int(m)
        self.k = self.g - self.m
        self.t = t  # accepted for API parity; see module docstring
        self.approx = bool(approx)
        self.delta = float(delta)
        self.max_iters = int(max_iters)
        self.skip_variance = bool(skip_variance)
        self.seed = int(seed)
        self.config = config or KernelConfig()

        self._counts: Optional[np.ndarray] = None  # int64 [N, N]
        self._K: Optional[np.ndarray] = None  # float64 normalized [N, N]
        self._stdevs: List[float] = []
        self._iters: int = 0
        self.n_str_train = 0
        self.n_str_test = 0
        self.train_labels: Optional[np.ndarray] = None
        self.test_labels: Optional[np.ndarray] = None
        self._model = None

    # ------------------------------------------------------------ kernel

    def _make_engine(self, enc: EncodedSeqs):
        b_total = enc.hash_base ** self.k
        if b_total <= self.config.b_max_dense:
            return DenseGkmEngine(enc, self.g, self.m, self.config)
        return SortedGkmEngine(enc, self.g, self.m, self.config)

    def _make_exact_engine(self, enc: EncodedSeqs):
        """Exact mode prefers the all-pairs engines (single fused sweep over
        window pairs, no C(g,m) pass loop): the seq-aligned one when
        lengths are near-uniform, the packed one on ragged data or when
        the seq-aligned int32 bound rejects the shape; the theta engine is
        the forced/fallback path."""
        from .kernel.pairs_engine import PackedPairsEngine, PairsGkmEngine

        choice = self.config.exact_engine
        if choice not in ("auto", "pairs", "packed", "theta"):
            raise ValueError(f"unknown exact_engine {choice!r}")
        if choice == "theta":
            return self._make_engine(enc)
        if choice == "packed":
            return PackedPairsEngine(enc, self.g, self.m, self.config)
        windows = enc.num_windows(self.g)
        waste = enc.n * ((int(windows.max()) + 7) // 8 * 8) / max(
            int(((windows + 7) // 8 * 8).sum()), 1
        )
        try:
            if choice == "auto" and waste > 1.5:
                return PackedPairsEngine(enc, self.g, self.m, self.config)
            return PairsGkmEngine(enc, self.g, self.m, self.config)
        except ValueError:
            if choice == "pairs":
                raise
            try:
                return PackedPairsEngine(enc, self.g, self.m, self.config)
            except ValueError:
                pass
            return self._make_engine(enc)

    def _compute(self, enc: EncodedSeqs) -> None:
        validate_g(enc, self.g, self.m)
        engine = (
            self._make_engine(enc) if self.approx else self._make_exact_engine(enc)
        )
        if self.approx:
            res: ApproxResult = engine.approx(
                conv_delta=self.delta,
                max_iters=self.max_iters,
                skip_variance=self.skip_variance,
                seed=self.seed,
            )
            self._stdevs = res.stdevs
            self._iters = res.iters
            counts = res.counts
        else:
            counts = engine.exact()
            self._iters = 0
            self._stdevs = []
        self._counts = counts
        self._K = cosine_normalize(counts)
        self.n_str_train = enc.n_train
        self.n_str_test = enc.n_test
        # total g-mer count across all sequences — the reference's nfeat
        # (fastsk.cpp:117: features->n), used as the rbf gamma denominator
        self.nfeat = int(enc.num_windows(self.g).sum())

    def compute_kernel(
        self,
        Xtrain: Sequence[Sequence[int]],
        Xtest: Sequence[Sequence[int]],
        Ytrain: Optional[Sequence[int]] = None,
        Ytest: Optional[Sequence[int]] = None,
    ) -> None:
        """Compute the joint (train+test) normalized kernel matrix."""
        enc = encode_sequences(Xtrain, Xtest)
        self._compute(enc)
        if Ytrain is not None:
            self.train_labels = np.asarray(Ytrain)
        if Ytest is not None:
            self.test_labels = np.asarray(Ytest)

    def compute_train(self, Xtrain: Sequence[Sequence[int]], Ytrain=None) -> None:
        """Compute the train-only kernel matrix."""
        enc = encode_sequences(Xtrain, None)
        self._compute(enc)
        if Ytrain is not None:
            self.train_labels = np.asarray(Ytrain)

    def set_labels(self, Ytrain: Sequence[int], Ytest: Optional[Sequence[int]] = None):
        self.train_labels = np.asarray(Ytrain)
        if Ytest is not None:
            self.test_labels = np.asarray(Ytest)

    # ------------------------------------------------------------ access

    def _require_kernel(self) -> np.ndarray:
        if self._K is None:
            raise RuntimeError("call compute_kernel or compute_train first")
        return self._K

    @property
    def kernel(self) -> np.ndarray:
        """Full normalized (train+test) kernel matrix, float64 [N, N]."""
        return self._require_kernel()

    @property
    def kernel_counts(self) -> np.ndarray:
        """Unnormalized integer count kernel, int64 [N, N]."""
        if self._counts is None:
            raise RuntimeError("call compute_kernel or compute_train first")
        return self._counts

    def get_train_kernel(self) -> List[List[float]]:
        """Train block of the normalized kernel (fastsk.cpp:190-200)."""
        k = self._require_kernel()
        ntr = self.n_str_train
        return k[:ntr, :ntr].tolist()

    def get_test_kernel(self) -> List[List[float]]:
        """Test-vs-train block of the normalized kernel (fastsk.cpp:202-217)."""
        k = self._require_kernel()
        ntr = self.n_str_train
        return k[ntr:, :ntr].tolist()

    def get_stdevs(self) -> List[float]:
        """Per-iteration convergence sd trace (approx mode)."""
        return list(self._stdevs)

    @property
    def iterations(self) -> int:
        """Number of Monte-Carlo iterations consumed (approx mode)."""
        return self._iters

    def save_kernel(self, kernel_file: str) -> None:
        """Write the kernel: the reference text format (fastsk.cpp:223-237,
        one row of 1-indexed ``col:value`` pairs per sequence) by default,
        or fast binary ``.npy``/``.npz`` (with counts + split sizes) when
        the filename says so — the text format is quadratic in python-loop
        time and impractical at 7k+ sequences."""
        k = self._require_kernel()
        if kernel_file.endswith(".npy"):
            np.save(kernel_file, k)
            return
        if kernel_file.endswith(".npz"):
            np.savez_compressed(
                kernel_file,
                kernel=k,
                counts=self._counts,
                n_train=np.int64(self.n_str_train),
                n_test=np.int64(self.n_str_test),
            )
            return
        n = k.shape[0]
        with open(kernel_file, "w") as f:
            for i in range(n):
                f.write(
                    "".join(f"{j + 1}:{k[i, j]:e} " for j in range(n))
                )
                f.write("\n")

    # ------------------------------------------------------------ svm

    def fit(
        self,
        C: float = 1.0,
        nu: float = 0.5,
        eps: float = 0.001,
        kernel_type: str = "linear",
        svm_type: str = "c_svc",
    ) -> None:
        """Train an SVM on the computed kernel (defaults match
        bindings.cpp:36-41). ``kernel_type``:

        - "fastsk": SVM directly on the precomputed gkm kernel
        - "linear": SVM with a linear kernel over kernel rows (the
          reference's default — kernel rows as an empirical kernel map)
        - "rbf":    SVM with an RBF kernel over kernel rows,
          gamma = 1/nfeat (fastsk.cpp:273)

        ``svm_type`` selects the solver, like LIBSVM's -s
        (svm_parameter.svm_type, svm.h:26; the reference's FastSK class
        pins C_SVC, fastsk.hpp:19, but the full LIBSVM surface is part of
        its capability set): "c_svc" (default), "nu_svc", "one_class",
        "epsilon_svr", "nu_svr". ``nu`` parameterizes the nu_* and
        one_class solvers — the reference accepts it but C_SVC ignores it.
        Multiclass labels train one-vs-one automatically (svm.cpp:2163+).
        """
        from .svm.kernel_svm import (
            EpsilonSVR,
            KernelSVC,
            NuSVC,
            NuSVR,
            OneClassSVM,
        )

        if svm_type not in ("c_svc", "nu_svc", "one_class", "epsilon_svr", "nu_svr"):
            raise ValueError(
                "svm_type must be one of c_svc, nu_svc, one_class, "
                f"epsilon_svr, nu_svr; got {svm_type!r}"
            )
        needs_labels = svm_type != "one_class"
        if needs_labels and self.train_labels is None:
            raise RuntimeError(
                "labels are required: pass Ytrain to compute_kernel or call set_labels"
            )
        k = self._require_kernel()
        ntr = self.n_str_train
        rows_train = k[:ntr, :ntr]
        if kernel_type == "fastsk":
            gram = rows_train
        elif kernel_type == "linear":
            gram = rows_train @ rows_train.T
        elif kernel_type == "rbf":
            gamma = 1.0 / max(self.nfeat, 1)
            sq = np.sum(rows_train**2, axis=1)
            gram = np.exp(-gamma * (sq[:, None] + sq[None, :] - 2 * rows_train @ rows_train.T))
        else:
            raise ValueError("kernel must be 'linear', 'fastsk', or 'rbf'")
        self._fit_kernel_type = kernel_type
        self._fit_svm_type = svm_type
        if svm_type == "c_svc":
            self._model = KernelSVC(C=C, eps=eps, probability=True).fit(
                gram, np.asarray(self.train_labels)
            )
        elif svm_type == "nu_svc":
            self._model = NuSVC(nu=nu, eps=eps, probability=True).fit(
                gram, np.asarray(self.train_labels)
            )
        elif svm_type == "one_class":
            self._model = OneClassSVM(nu=nu, eps=eps).fit(gram)
        elif svm_type == "epsilon_svr":
            self._model = EpsilonSVR(C=C, eps=eps).fit(
                gram, np.asarray(self.train_labels)
            )
        else:  # nu_svr
            self._model = NuSVR(C=C, nu=nu, eps=eps).fit(
                gram, np.asarray(self.train_labels)
            )

    def _test_gram(self) -> np.ndarray:
        """Test-vs-train Gram matrix under the fitted kernel_type."""
        k = self._require_kernel()
        ntr = self.n_str_train
        rows_train = k[:ntr, :ntr]
        rows_test = k[ntr:, :ntr]
        kt = self._fit_kernel_type
        if kt == "fastsk":
            return rows_test
        if kt == "linear":
            return rows_test @ rows_train.T
        gamma = 1.0 / max(self.nfeat, 1)  # rbf, gamma=1/nfeat (fastsk.cpp:273)
        sq_tr = np.sum(rows_train**2, axis=1)
        sq_te = np.sum(rows_test**2, axis=1)
        return np.exp(
            -gamma * (sq_te[:, None] + sq_tr[None, :] - 2 * rows_test @ rows_train.T)
        )

    def score(self, metric: str = "auc") -> float:
        """Predict on the test block and report accuracy or AUROC
        (fastsk.cpp:418-530, minus the unconditional auc_file.txt side
        effect)."""
        from .metrics import accuracy_score, auc_pairwise, r2_score

        if metric not in ("accuracy", "auc", "r2"):
            raise ValueError("metric argument must be 'accuracy', 'auc', or 'r2'")
        if self._model is None:
            raise RuntimeError("call fit() first")
        if self.test_labels is None:
            raise RuntimeError("test labels are required for score()")
        gram_test = self._test_gram()
        y_test = np.asarray(self.test_labels)
        svm_type = getattr(self, "_fit_svm_type", "c_svc")
        if svm_type in ("epsilon_svr", "nu_svr"):
            if metric != "r2":
                raise ValueError("regression models score with metric='r2'")
            return r2_score(
                y_test.astype(np.float64), self._model.predict(gram_test)
            )
        preds = self._model.predict(gram_test)
        if metric == "auc":
            if svm_type == "one_class" or len(self._model.classes_) != 2:
                raise ValueError(
                    "metric='auc' requires a binary classifier; use 'accuracy'"
                )
            probs = self._model.predict_proba(gram_test)[:, 1]
            return auc_pairwise(y_test, probs)
        if metric == "r2":
            raise ValueError("metric='r2' is for the SVR types")
        return accuracy_score(y_test, preds) * 100.0

    def score_report(self) -> dict:
        """Full scoring report: acc, AUROC, TPR/TNR/FNR/FPR — everything
        the reference's score() prints (fastsk.cpp:508-529), as a dict."""
        from .metrics import accuracy_score, auc_pairwise, confusion_rates

        if self._model is None:
            raise RuntimeError("call fit() first")
        if self.test_labels is None:
            raise RuntimeError("test labels are required")
        gram_test = self._test_gram()
        y = np.asarray(self.test_labels)
        preds = self._model.predict(gram_test)
        out = {"accuracy": accuracy_score(y, preds)}
        if len(getattr(self._model, "classes_", [])) == 2:
            probs = self._model.predict_proba(gram_test)[:, 1]
            out["auc"] = auc_pairwise(y, probs)
            out.update(confusion_rates(y, preds))
        return out
