"""Mid-computation checkpoint/resume for kernel accumulation.

The reference can save finished kernels (fastsk.cpp:223-237) but cannot
resume a partially computed one — exact mode at large C(g, m) just runs
for hours (SURVEY.md §5). Here every engine driver can periodically
persist its integer accumulator plus the work-queue cursor (and, in
Monte-Carlo mode, the Welford state), keyed by a digest of the inputs so
a stale checkpoint is never silently reused.

Format: a single .npz written atomically (tmp + rename).
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Optional

import numpy as np


def problem_digest(ids: np.ndarray, lengths: np.ndarray, g: int, m: int, extra: str = "") -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(ids).tobytes())
    h.update(np.ascontiguousarray(lengths).tobytes())
    h.update(f"g={g};m={m};{extra}".encode())
    return h.hexdigest()[:32]


class KernelCheckpoint:
    def __init__(self, path: str, digest: str):
        self.path = path
        self.digest = digest

    def save(self, **arrays) -> None:
        tmp = self.path + ".tmp"
        np.savez(tmp, __digest__=np.bytes_(self.digest), **arrays)
        # np.savez appends .npz to names without it
        if not tmp.endswith(".npz"):
            tmp_real = tmp + ".npz"
        else:
            tmp_real = tmp
        os.replace(tmp_real, self.path)

    def load(self) -> Optional[Dict[str, np.ndarray]]:
        """Returns the saved arrays, or None if absent/mismatched."""
        if not os.path.exists(self.path):
            return None
        try:
            with np.load(self.path, allow_pickle=False) as z:
                if z["__digest__"].item().decode() != self.digest:
                    return None
                return {k: z[k] for k in z.files if k != "__digest__"}
        except Exception:
            return None
