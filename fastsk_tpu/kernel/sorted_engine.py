"""Sorted/rank-based engine for huge bucket spaces (placeholder).

When ``dict_size ** k`` is too large to materialize densely (large-alphabet
protein/text workloads at big k), the observed projected k-mers are ranked by
an on-device sort and the count matmul runs over rank chunks. Implementation
lands after the dense path; the class exists so the API's path selection is
stable.
"""

from __future__ import annotations

from typing import Optional

from ..ops.encode import EncodedSeqs
from .config import KernelConfig


class SortedGkmEngine:
    def __init__(self, enc: EncodedSeqs, g: int, m: int, config: Optional[KernelConfig] = None):
        raise NotImplementedError(
            f"bucket space dict_size**k = {enc.dict_size ** (g - m)} exceeds "
            "the dense limit and the sorted path is not implemented yet; "
            "raise KernelConfig.b_max_dense if memory allows"
        )
