"""Configuration for the gapped k-mer kernel engine."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax


@dataclass
class KernelConfig:
    """Tuning knobs for the kernel engine.

    Defaults are sized for a single 16 GB TPU chip; everything is
    overridable. ``mesh`` enables multi-device execution with the theta
    (work-queue) axis sharded across devices.
    """

    # Largest dense bucket space B = dict_size**k handled by the dense
    # count-matmul path; beyond this the sorted/rank path takes over.
    b_max_dense: int = 1 << 17

    # Approximate HBM budget (bytes) for the count tensor C [T, N, B] of one
    # theta batch; sets the theta batch size.
    counts_budget_bytes: int = 2 << 30

    # Approximate HBM budget for one row-chunk's one-hot intermediates.
    onehot_budget_bytes: int = 1 << 30

    # Upper bound on thetas per device step.
    max_theta_batch: int = 64

    # Optional fixed overrides (None = auto).
    theta_batch: Optional[int] = None
    row_chunk: Optional[int] = None

    # Multi-device execution: a jax Mesh whose axes include "theta" (the
    # work-queue data-parallel axis). None = single local device.
    mesh: Optional[jax.sharding.Mesh] = None

    # Device to place single-device work on (None = default backend device).
    device: Optional[jax.Device] = None

    # Mesh memory layout for the packed and sorted engines' exact paths:
    # "sharded" keeps only a kernel row block (sorted: [N/R, N]; packed:
    # row-block digit planes) per device, so per-device memory is
    # O(N^2 / n_dev) — the pod-scale layout matching the dense engine
    # (parallel/sharding.py:exact_batch_update_sharded). "replicated"
    # keeps private full-size replicas per device (round-2 layout:
    # lowest wall-clock on small meshes, memory does not shrink with
    # device count). The dense engine is always row-sharded.
    mesh_state: str = "sharded"

    # Exact-mode engine selection: "auto" prefers the all-pairs engine
    # (kernel/pairs_engine.py) and falls back to the theta engine when the
    # int32 count bound rules it out; "pairs" / "theta" force one.
    exact_engine: str = "auto"

    # All-pairs backend: "auto" uses the fused Pallas kernel on TPU and the
    # blocked XLA path elsewhere; "pallas" (pair-list sweep) /
    # "pallas_grouped" (per-a-strip grouped calls) / "xla" force one;
    # "*_interpret" variants run the Pallas kernels in interpret mode.
    pairs_backend: str = "auto"

    # Sorted/rank engine: pairs per count-matmul slab ("pairs" layout) /
    # pairs per scatter chunk ("runs" layout).
    sorted_slab: int = 8192

    # Sorted/rank engine slab decomposition: "runs" (run-aligned slabs —
    # fully dense gram columns, no cross-slab corrections, one fewer sort;
    # ~3-4x faster per pass on the NLP suite) or "pairs" (the round-1..3
    # pair-aligned layout). Integer-identical results.
    sorted_layout: str = "runs"

    # Runs per slab for sorted_layout="runs" (the gram width).
    sorted_run_width: int = 2048

    # Mid-computation checkpointing (utils/checkpoint.py): persist the
    # accumulator + work-queue cursor every `checkpoint_every` thetas so a
    # long exact/approx run can resume after interruption.
    checkpoint_path: Optional[str] = None
    checkpoint_every: int = 512

    # Keep kernel counts resident on device (kernel/device_counts.py):
    # fit/score then run end to end on device and the O(N^2) host pull —
    # the dominant cost of a kernel+SVM workflow through the remote
    # tunnel — happens only if the host matrix is explicitly accessed.
    # Single-device engines only; mesh and checkpointed runs use the
    # host-accumulating paths regardless.
    device_resident: bool = False

    # Write a jax.profiler device trace of kernel computation here.
    profile_dir: Optional[str] = None

    quiet: bool = True

    def __post_init__(self):
        if self.mesh_state not in ("sharded", "replicated"):
            raise ValueError(
                "mesh_state must be 'sharded' or 'replicated'; got "
                f"{self.mesh_state!r}"
            )
        if self.sorted_layout not in ("runs", "pairs"):
            raise ValueError(
                "sorted_layout must be 'runs' or 'pairs'; got "
                f"{self.sorted_layout!r}"
            )
