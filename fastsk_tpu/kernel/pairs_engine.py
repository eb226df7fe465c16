"""All-pairs exact-kernel engine (the TPU fast path for exact mode).

Computes the full exact gapped k-mer kernel in ONE pass over window pairs
via ``K[i,j] = sum_{p,q} C(matches(w_ip, w_jq), k)`` (see ops/pairs.py),
instead of the C(g, m) counting passes of the theta engine — the
position-subset loop the reference threads over (fastsk_kernel.cpp:145-322)
disappears entirely. On EP300_47848 at g=16, m=10 this is the difference
between 8008 histogram passes and a single dense 0/1 matmul pipeline that
the MXU runs near peak.

Exactness: bit-identical integer counts to the reference/theta engine.
Guard: every K entry must stay < 2^31 (int32 accumulation); the engine
checks the worst-case bound ``p_pad^2 * C(g, k)`` and refuses shapes where
a single sequence pair could overflow — those fall back to the theta
engine upstream.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pairs
from ..ops.encode import EncodedSeqs
from ..utils.observe import Progress, profiler_trace, timed
from .config import KernelConfig


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_onehot_windows_jit = jax.jit(
    pairs.onehot_windows,
    static_argnames=("g", "alpha", "code_min", "p_pad", "dtype"),
)


@functools.partial(
    jax.jit,
    static_argnames=("g", "k", "p_pad", "c_ti", "c_tj", "n", "interpret"),
)
def _pairs_full_device_jit(
    x, *, g, k, p_pad, c_ti, c_tj, n, interpret=False
):
    """Whole device-resident exact kernel in ONE dispatch.

    The banded loop exists for the *streaming host* path (each band's
    bytes pull while later bands compute); a device-resident consumer
    gains nothing from banding and pays ~12 eager dispatches plus an
    eager transpose/concat/mirror epilogue for it — measured ~0.2 s of
    the 1.56 s round-5 headline wall (the wall sat ABOVE the composite
    MXU+VPU ceiling before this). One jit = one dispatch: the full-grid
    Pallas call, the block relayout, and the triu+mirror all land in a
    single XLA program.
    """
    from ..ops import pairs_pallas

    blocks = pairs_pallas.pairs_kernel_blocks(
        x, jnp.int32(0), g=g, k=k, p_pad=p_pad, c_ti=c_ti, c_tj=c_tj,
        n_i_band=0, interpret=interpret,
    )  # [n_i, n_j, c_ti, c_tj]
    n_i, n_j, _, _ = blocks.shape
    n_pad = n_i * c_ti
    upper = blocks.transpose(0, 2, 1, 3).reshape(n_pad, n_j * c_tj)
    full = jnp.triu(upper) + jnp.triu(upper, 1).T
    return full[:n, :n]


class PairsGkmEngine:
    """Exact-mode engine over the all-pairs binomial identity."""

    def __init__(
        self,
        enc: EncodedSeqs,
        g: int,
        m: int,
        config: Optional[KernelConfig] = None,
    ):
        self.enc = enc
        self.g = g
        self.m = m
        self.k = g - m
        self.config = config or KernelConfig()
        self.alpha = enc.hash_base
        self.code_min = enc.code_min
        self.n = enc.n

        self.p = enc.max_len - g + 1
        self.p_pad = _next_multiple(self.p, 8)
        if self.p_pad**2 * math.comb(g, self.k) >= 2**31:
            raise ValueError(
                "per-pair count bound exceeds int32; use the theta engine "
                f"(p_pad={self.p_pad}, C(g,k)={math.comb(g, self.k)})"
            )

        # backend: the fused Pallas kernel on TPU (VMEM-resident D tiles),
        # the blocked XLA path elsewhere / for huge windows-per-sequence
        self.mesh = self.config.mesh
        if self.mesh is not None:
            # The round-1..3 mesh path here replicated the O(N*p*gA)
            # window encoding on every device — it never memory-scaled.
            # Mesh exact runs are the packed engine's job: its ring path
            # shards input AND state (parallel/sharding.py:
            # packed_ring_rowsharded); the auto engine selection routes
            # there when this raises (api.py:_make_exact_engine).
            raise ValueError(
                "the seq-aligned pairs engine is single-device; mesh "
                "exact kernels run on the packed engine (fully "
                "input+state sharded) — use exact_engine='packed' or "
                "'auto'"
            )
        backend = self.config.pairs_backend
        if backend == "auto":
            backend = (
                "pallas"
                if (
                    jax.default_backend() == "tpu"
                    and self.p_pad <= 256
                    and self.mesh is None
                )
                else "xla"
            )
        self.backend = backend

        if backend == "pallas":
            # i tiles target ~6144 window rows; j spans 128 sequences so
            # the output block is lane-aligned (the kernel chunks D
            # internally). c_i must divide c_j so both strip grids tile
            # n_pad. Tile-size rationale (measured, v5e headline,
            # experiments/probe_pairs.py --ci): the Mosaic grid step
            # costs ~4.5 us, so the old 768-row tiles paid 0.47 s of
            # pure grid overhead (noop variant) on a 104k-step grid;
            # 6144-row tiles cut the grid 8x (noop 0.09 s) at equal MXU
            # efficiency — headline 1.55 -> 1.36 s. Larger tiles blow
            # the ~16 MB scoped VMEM (c_i=128 at p_pad=192 OOMs), hence
            # the budget loop below.
            c_i = max(1, 6144 // self.p_pad)
            c_i = 1 << (c_i.bit_length() - 1)  # floor to a power of two
            self.c_i = min(c_i, 128)
            self.c_j = 128
            # shrink c_i until the kernel's VMEM residents fit the 16 MB
            # scoped budget: D chunk tile + s1 scratch + operand tiles.
            # The 15.5 MB bound is calibrated to the measured boundary
            # (c_i=32 at p_pad=192/F=80 models 15.0 MB and compiles;
            # c_i=64 models 28 MB and OOMs at 17.7 MB actual).
            f_width = self.g * self.alpha
            from ..ops.pairs_pallas import d_chunk

            while self.c_i > 1:
                ti = self.c_i * self.p_pad
                tj = self.c_j * self.p_pad
                chunk = d_chunk(ti, tj)
                vmem = (
                    ti * chunk * 4          # D tile (int32)
                    + self.c_i * tj * 4     # s1 scratch
                    + ti * f_width          # xi (int8)
                    + tj * f_width          # xj
                )
                if vmem <= int(15.5 * 2**20):
                    break
                self.c_i //= 2
            self.n_pad = _next_multiple(self.n, self.c_j)
        else:
            # strip sizing: i strips ~2048 window rows, j strips 8x wider;
            # prefer multiples that keep the D-tile lane dim 128-aligned
            align = 128 // math.gcd(self.p_pad, 128)
            c_i = max(1, 2048 // self.p_pad)
            if c_i >= align:
                c_i -= c_i % align
            self.c_i = c_i
            self.c_j = c_i * 8
            self.n_pad = _next_multiple(self.n, self.c_j)
        self.n_strips_i = self.n_pad // self.c_i
        self.n_strips_j = self.n_pad // self.c_j

        ids = np.asarray(enc.ids)
        lengths = np.asarray(enc.lengths)
        if self.n_pad > self.n:
            ids = np.pad(ids, ((0, self.n_pad - self.n), (0, 0)))
            lengths = np.pad(lengths, (0, self.n_pad - self.n))
        dev = self.config.device
        self._ids = jax.device_put(jnp.asarray(ids), dev)
        self._lengths = jax.device_put(jnp.asarray(lengths), dev)

    def _build_x(self) -> jnp.ndarray:
        # the Pallas path runs D on the int8 MXU (2x bf16 peak on v5e);
        # the XLA/mesh paths matmul in bf16
        dtype = jnp.int8 if self.backend == "pallas" and self.mesh is None else jnp.bfloat16
        x = _onehot_windows_jit(
            self._ids,
            self._lengths,
            g=self.g,
            alpha=self.alpha,
            code_min=self.code_min,
            p_pad=self.p_pad,
            dtype=dtype,
        )
        return x.reshape(self.n_pad * self.p_pad, self.g * self.alpha)

    def exact(self) -> np.ndarray:
        """Exact unnormalized kernel, int64 [N, N] — all C(g, m) subsets."""
        progress = Progress(quiet=self.config.quiet)
        progress.log(
            f"pairs exact ({self.backend}): {self.n} sequences, "
            f"p_pad={self.p_pad}, strips={self.n_strips_i}"
        )
        import math as _math

        pairs_total = (
            self.n * (self.n + 1) / 2 * _math.comb(self.g, self.k)
        )
        ctx_t = timed(progress, "pairs exact kernel", pairs_total, "pairs")
        ctx_p = profiler_trace(self.config.profile_dir)
        ctx_p.__enter__()
        ctx_t.__enter__()
        try:
            x = self._build_x()
            if self.backend == "pallas":
                # returns the full symmetric matrix (blocked host mirror)
                out = self._exact_pallas(x)[: self.n, : self.n]
                return out
            else:
                upper = self._exact_xla(x)
            upper = upper[: self.n, : self.n]
            # both paths computed the (block) upper triangle; mirror it
            out = np.triu(upper)
            out = out + np.triu(upper, 1).T
        finally:
            ctx_t.__exit__(None, None, None)
            ctx_p.__exit__(None, None, None)
        return out

    def exact_device(self):
        """Exact unnormalized kernel as device-resident ``DeviceCounts``
        (kernel/device_counts.py): the block-upper triangle is computed
        and mirrored on device, and no O(N^2) host transfer happens —
        the fit/score path consumes the counts where they are.

        Per-pair totals are int32-exact by the constructor guard
        (p_pad**2 * C(g,k) < 2**31), so ``lo`` alone carries the counts.
        """
        from .device_counts import DeviceCounts

        if self.mesh is not None:
            raise ValueError("device-resident exact is single-device")
        x = self._build_x()
        if self.backend == "pallas":
            full = _pairs_full_device_jit(
                x, g=self.g, k=self.k, p_pad=self.p_pad,
                c_ti=self.c_i, c_tj=self.c_j, n=self.n,
            )
        else:
            upper = self._exact_xla_device(x)
            full = (jnp.triu(upper) + jnp.triu(upper, 1).T)[
                : self.n, : self.n
            ]
        return DeviceCounts(full)

    # streaming threshold: matrices under this skip the byte-plane tile
    # machinery (transfer isn't their bottleneck; fewer compilations) —
    # an attribute so tests can force the streaming path on tiny inputs
    _small_bytes = 64 * 2**20

    def _exact_pallas(self, x, interpret: bool = False) -> np.ndarray:
        """Banded execution + byte-plane streaming, returning the FULL
        symmetric matrix.

        ~12 row-band kernel launches; every band's live (upper-triangle)
        blocks are pulled as min-offset byte planes (ops/transfer.py),
        batched into one round trip per plane level — the device->host
        link (per-request latency plus ~8-12 MB/s bandwidth through the
        remote tunnel) is the end-to-end bottleneck, so dead
        lower-triangle blocks never transfer and wide-span data moves at
        3 bytes/count in ~4 round trips. The lower triangle is then
        filled by a cache-blocked transpose of the upper (symmetric
        counts), ~10x faster than a np.triu + transpose-add mirror on a
        400 MB matrix.
        """
        from ..ops import pairs_pallas
        from ..ops.transfer import StreamingTilePuller, pull_array

        n_i = self.n_pad // self.c_i
        n_j = self.n_pad // self.c_j
        small = self.n_pad * self.n_pad * 2 <= self._small_bytes
        band = n_i if small else max(1, -(-n_i // 12))
        kwargs = dict(
            g=self.g, k=self.k, p_pad=self.p_pad,
            c_ti=self.c_i, c_tj=self.c_j, interpret=interpret,
        )
        k_full = np.zeros((self.n_pad, self.n_pad), dtype=np.int32)
        # first live j block per i block (blocks strictly below the
        # window-space diagonal are zero and never pulled)
        j_lo = (np.arange(n_i) * self.c_i) // self.c_j

        if small:
            for i0 in range(0, n_i, band):
                nb = min(band, n_i - i0)
                blocks = pairs_pallas.pairs_kernel_blocks(
                    x, jnp.int32(i0), n_i_band=nb, **kwargs
                )
                j0 = int(j_lo[i0])
                part = pull_array(blocks[:, j0:])
                k_full[
                    i0 * self.c_i : (i0 + nb) * self.c_i, j0 * self.c_j :
                ] = part.transpose(0, 2, 1, 3).reshape(
                    nb * self.c_i, (n_j - j0) * self.c_j
                )
        else:
            puller = StreamingTilePuller()
            meta, handles = [], []
            for i0 in range(0, n_i, band):
                nb = min(band, n_i - i0)
                blocks = pairs_pallas.pairs_kernel_blocks(
                    x, jnp.int32(i0), n_i_band=nb, **kwargs
                )
                tiles = blocks.reshape(nb * n_j, self.c_i, self.c_j)
                live = np.concatenate(
                    [
                        il * n_j + np.arange(j_lo[i0 + il], n_j)
                        for il in range(nb)
                    ]
                )
                meta.append((i0, nb))
                handles.append(puller.dispatch(tiles, live))
            pulled = [
                (i0, nb, arr)
                for (i0, nb), arr in zip(meta, puller.pull_all(handles))
            ]
            for i0, nb, arr in pulled:
                pos = 0
                for il in range(nb):
                    i = i0 + il
                    j0 = int(j_lo[i])
                    cnt = n_j - j0
                    seg = arr[pos : pos + cnt]  # [cnt, c_i, c_j]
                    k_full[
                        i * self.c_i : (i + 1) * self.c_i, j0 * self.c_j :
                    ] = seg.transpose(1, 0, 2).reshape(
                        self.c_i, cnt * self.c_j
                    )
                    pos += cnt

        # blocked symmetric fill: upper entries are complete (every upper
        # block position is live in some band); lower entries inside live
        # diagonal-crossing blocks are already correct and harmlessly
        # overwritten with their (equal) mirror
        bsz = 2048
        for c0 in range(0, self.n_pad, bsz):
            c1 = min(c0 + bsz, self.n_pad)
            blk = k_full[c0:c1, c0:c1]
            blk[:] = np.triu(blk) + np.triu(blk, 1).T
            for r0 in range(c1, self.n_pad, bsz):
                r1 = min(r0 + bsz, self.n_pad)
                k_full[r0:r1, c0:c1] = k_full[c0:c1, r0:r1].T
        return k_full.astype(np.int64)

    def _exact_xla(self, x) -> np.ndarray:
        return np.asarray(self._exact_xla_device(x), dtype=np.int64)

    def _exact_xla_device(self, x) -> jnp.ndarray:
        k_acc = jnp.zeros((self.n_pad, self.n_pad), dtype=jnp.int32)
        if self.config.device is not None:
            k_acc = jax.device_put(k_acc, self.config.device)
        for i in range(self.n_strips_i):
            k_acc = pairs.pairs_strip_update(
                k_acc,
                x,
                jnp.int32(i),
                k=self.k,
                c_i=self.c_i,
                c_j=self.c_j,
                p_pad=self.p_pad,
                n_strips_j=self.n_strips_j,
            )
        return k_acc


from ..ops import pairs_packed as _pairs_packed

_build_packed_x_jit = jax.jit(
    _pairs_packed.build_packed_x,
    static_argnames=("g", "alpha", "code_min", "dtype"),
)
_build_gb_all_jit = jax.jit(
    _pairs_packed.build_gb_all, static_argnames=("tile", "c_pad", "dtype")
)
_build_ga_all_jit = jax.jit(
    _pairs_packed.build_ga_all, static_argnames=("tile", "c_pad", "dtype")
)
_build_gb_land_jit = jax.jit(
    _pairs_packed.build_gb_land, static_argnames=("tile", "c_land", "dtype")
)


@functools.partial(jax.jit, static_argnames=("n_pad", "n_digits"))
def _bands_to_planes_jit(bands, first_seq, *, n_pad: int, n_digits: int):
    """Land the band sweep's row bands onto digit planes: one scatter-add
    of n_strips dense [n_digits, c_pad, w] windows at rows first_seq[a]
    (windows overlap only in the c_max halo where strip-straddling
    sequences live; adds compose). Returns the usual tuple of
    [n_pad, n_pad] planes (upper-complete; callers mirror)."""
    n_strips, nd, c_pad, w = bands.shape
    planes_w = jnp.zeros((n_digits, n_pad, w), jnp.int32)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(1,),
    )
    planes_w = jax.lax.scatter_add(
        planes_w,
        first_seq[:, None],
        bands,  # [n_strips, nd, c_pad, w] — already the update layout
        dnums,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
    )
    return tuple(planes_w[d, :, :n_pad] for d in range(n_digits))


class PackedPairsEngine:
    """Ragged-aware all-pairs exact engine (ops/pairs_packed.py).

    Sequences sorted by descending length pack back to back (rows rounded
    to 8), so D-matmul work tracks the true window count instead of
    N * max_windows — up to ~35x less on SCOP/NLP data — and digit-plane
    accumulation removes the seq-aligned engine's int32 per-pair bound.
    """

    TILE = 2048
    GROUP = 8  # b strips per fused-Pallas call (amortizes op dispatch)
    SLAB_BYTES = 128 << 20  # pair-list parts-array budget per dispatch
    BAND_SLOT_CAP = 55_000  # max prefetched pair-list slots (1 MB SMEM)

    def __init__(
        self,
        enc: EncodedSeqs,
        g: int,
        m: int,
        config: Optional[KernelConfig] = None,
    ):
        from ..ops import pairs_packed

        self.enc = enc
        self.g = g
        self.m = m
        self.k = g - m
        self.config = config or KernelConfig()
        self.alpha = enc.hash_base
        self.code_min = enc.code_min
        self.n = enc.n

        # digit base: small enough that a per-plane kernel entry
        # (p_i * p_j * (base-1)) stays int32-exact even for very long
        # sequences (the reference caps lengths at 15000, shared.h:4)
        p_max = int(enc.num_windows(g).max())
        base = 256
        while base > 2 and p_max**2 * (base - 1) >= 2**31:
            base //= 2
        if p_max**2 * (base - 1) >= 2**31:
            raise ValueError(
                f"windows per sequence too large for int32 digit planes "
                f"(p_max={p_max})"
            )
        c_total = math.comb(g, self.k)

        def _nd(b):
            return max(1, math.ceil(math.log(c_total + 1, b)))

        # prefer base 128 when it doesn't add a plane: digits <= 127 fit
        # the signed int8 MXU operand, so the Pallas landing stages run
        # at 2x bf16 peak (ops/pairs_packed_pallas._land_stages); every
        # int32 bound only loosens with the smaller base
        if base == 256 and _nd(128) == _nd(256):
            base = 128
        self.digit_base = base
        self.n_digits = _nd(base)

        order = np.argsort(-np.asarray(enc.lengths), kind="stable")
        self.order = order
        lengths_sorted = np.asarray(enc.lengths)[order]
        ids_sorted = np.asarray(enc.ids)[order]
        # adaptive tile: small alphabets make the per-tile D matmul cheap,
        # so widen tiles to amortize loop overhead over more work.
        # Widening must preserve the stage-2 int32 cumsum invariant of
        # packed_strip_update: running sums are bounded by
        # tile * min(tile, rows-per-sequence) * (digit_base - 1), which for
        # the default tile=2048/base=256 is always < 2^31 but for a doubled
        # tile only when sequences are short enough.
        self.tile = self.TILE
        p_rows_max = int(-(-p_max // 8) * 8)
        wide = 2 * self.TILE
        if (
            self.TILE >= 2048
            and g * self.alpha <= 64
            and wide * min(wide, p_rows_max) * (base - 1) < 2**31
        ):
            self.tile = wide
        # backend: the fully-fused grouped Pallas path on TPU
        # (ops/pairs_packed_pallas.py) when the strips fit the VMEM budget;
        # the blocked XLA path otherwise. Integer results are identical.
        backend = self.config.pairs_backend
        self.interpret = backend in (
            "pallas_interpret", "pallas_grouped_interpret"
        )
        if backend == "pallas_interpret":
            backend = "pallas"
        elif backend == "pallas_grouped_interpret":
            backend = "pallas_grouped"
        if backend == "auto":
            f = g * self.alpha
            # xa double-buffered + D chunk + digit temps + stage-1 out
            vmem_ok = 2 * self.tile * f * 2 + 10 * 2**20 <= 15 * 2**20
            # the platform that will RUN the kernels: the mesh's devices
            # when sharded (a CPU mesh under a TPU-default backend must
            # not pick Pallas), the default backend otherwise
            platform = (
                self.config.mesh.devices.flat[0].platform
                if self.config.mesh is not None
                else jax.default_backend()
            )
            backend = "pallas" if platform == "tpu" and vmem_ok else "xla"
        self.backend = backend
        self.mesh = self.config.mesh
        # dispatch-amortization group for the grouped fused path ("pallas"
        # = the pair-list sweep, which amortizes over whole slabs instead;
        # the mesh path still drives the per-strip s1 kernel, group 1)
        self.group = (
            self.GROUP
            if backend == "pallas_grouped" and self.mesh is None
            else 1
        )

        if backend == "pallas" and self.mesh is None:
            # band sweep: the whole upper-triangle pair list rides SMEM
            # scalar prefetch (4 int32 arrays of ~n_strips^2/2 slots,
            # counted against the 16 MB scoped budget). Widen tiles until
            # the list fits — legal here because the band kernel's
            # byte-split stage 2 has no tile-bound cumsum invariant
            # (unlike the XLA path's int32 running sums); the digit-base
            # guard above is tile-independent. VMEM feasibility bounds
            # the widening: the D tile can shrink to chunk=128 but the
            # double-buffered [tile, F] operand blocks cannot.
            f = g * self.alpha
            rows_est = int((((np.maximum(lengths_sorted - g + 1, 0)
                              + 7) // 8) * 8).sum())

            def _slots(tile):
                ns_est = -(-rows_est // tile)
                return ns_est * (ns_est + 1) // 2

            if _slots(8192) > int(1.5 * self.BAND_SLOT_CAP):
                # even the max tile cannot fit the slot list: the band
                # path will fall back to the slabbed pair-list sweep,
                # which prefers the default tile — don't widen
                pass
            else:
                while True:
                    if (
                        _slots(self.tile) <= self.BAND_SLOT_CAP
                        or self.tile >= 8192
                    ):
                        break
                    # feasibility of the DOUBLED tile: int8 xa double-
                    # buffered + minimum (chunk=128) D tile + headroom
                    wide = 2 * self.tile
                    vmem_fixed = 2 * wide * f + wide * 128 * 4 + 5 * 2**20
                    if vmem_fixed > 14 * 2**20:
                        break
                    self.tile = wide

        self.pack = pairs_packed.pack_windows(
            lengths_sorted, g, self.tile, self.group
        )
        self.n_strips = self.pack["n_strips"]
        self.c_max = self.pack["c_max"]
        self.c_pad = -(-self.c_max // 16) * 16
        self.total_rows = self.pack["total_pad"]

        dev = self.config.device
        self._ids = jax.device_put(jnp.asarray(ids_sorted), dev)
        self._seq_of = jax.device_put(jnp.asarray(self.pack["seq_of"]), dev)
        # band-path planes are upper-complete only; consumers mirror
        self._planes_upper_only = False
        self._win_of = jax.device_put(jnp.asarray(self.pack["win_of"]), dev)
        self._first_seq = jax.device_put(jnp.asarray(self.pack["first_seq"]), dev)
        self._bounds = jax.device_put(jnp.asarray(self.pack["bounds"]), dev)

    def exact(self) -> np.ndarray:
        from ..ops import pairs_packed
        from ..utils.observe import Progress, timed

        progress = Progress(quiet=self.config.quiet)
        progress.log(
            f"packed pairs exact ({self.backend}): {self.n} sequences, "
            f"{self.total_rows} window rows, strips={self.n_strips}, "
            f"c_max={self.c_max}, digits={self.n_digits}"
        )
        n_pad = self.n + self.c_pad
        with timed(
            progress, "packed pairs kernel",
            self.n * (self.n + 1) / 2 * math.comb(self.g, self.k), "pairs",
        ):
            # int8 feeds the pair-list kernel's int8 MXU D-matmul (0/1
            # operands, exact int32 counts); other backends keep bf16
            x = _build_packed_x_jit(
                self._ids, self._seq_of, self._win_of,
                g=self.g, alpha=self.alpha, code_min=self.code_min,
                dtype=(
                    jnp.int8
                    if self.backend == "pallas" and self.mesh is None
                    else jnp.bfloat16
                ),
            )
            if self.mesh is not None:
                if self.config.mesh_state == "sharded":
                    k_sorted = self._exact_sharded_planes_rows(x, n_pad)
                else:
                    k_sorted = self._exact_sharded_planes(x, n_pad)
            else:
                k_sorted = self._planes_to_host(self._compute_planes(x, n_pad))
        # undo the length sort
        pos = np.empty(self.n, dtype=np.int64)
        pos[self.order] = np.arange(self.n)
        return k_sorted[np.ix_(pos, pos)].astype(np.int64, copy=False)

    def _land_dtype(self):
        """Landing-map dtype for the fused band/pair-list kernels: int8
        when every digit fits the signed int8 MXU operand (digit_base <=
        128) AND the split is single-digit — measured v5e A/B (probe_band,
        same window): protein 1.1 (1 digit) planes 575 -> 436 ms on int8,
        but AImed (2 digits) 1085 -> 1294 ms, the extra per-element
        f32->int8 digit casts outweighing the halved landing matmuls on
        that VPU-bound shape. bf16 otherwise. The interpret-mode tests
        exercise the same dtype the device would pick;
        ``FASTSK_LAND_DTYPE=bf16|int8`` overrides (A/B probes; results
        are bit-identical either way)."""
        import os

        env = os.environ.get("FASTSK_LAND_DTYPE")
        if env == "bf16":
            return jnp.bfloat16
        if env == "int8":
            # digits must fit the signed int8 operand — the override is
            # ignored (not an error) for bases above 128 so a blanket
            # env setting can't corrupt base-256 configurations
            if self.digit_base <= 128:
                return jnp.int8
            return jnp.bfloat16
        return (
            jnp.int8
            if self.digit_base <= 128 and self.n_digits == 1
            else jnp.bfloat16
        )

    def _compute_planes(self, x, n_pad: int):
        """Digit planes for the single-device backends (pallas band
        sweep / pair-list sweep / grouped fused strips / blocked XLA
        strips). The band path returns UPPER-COMPLETE planes (lower
        triangle partial — callers mirror; see ``_planes_upper_only``)."""
        import os

        from ..ops import pairs_packed

        if self.backend == "pallas":
            if os.environ.get("FASTSK_PACKED_PAIRLIST") == "1":
                return self._pairlist_planes(x, n_pad)
            return self._band_planes(x, n_pad)
        planes = tuple(
            jnp.zeros((n_pad, n_pad), jnp.int32)
            for _ in range(self.n_digits)
        )
        if self.backend == "pallas_grouped":
            gb_all = _build_gb_all_jit(
                self._seq_of, self._first_seq,
                tile=self.tile, c_pad=self.c_pad,
            )
            for a in range(self.n_strips):
                planes = pairs_packed.packed_strip_update_grouped(
                    planes, x, self._seq_of, gb_all,
                    self._first_seq, jnp.int32(a),
                    g=self.g, k=self.k, tile=self.tile,
                    c_pad=self.c_pad, n_strips=self.n_strips,
                    n_digits=self.n_digits,
                    digit_base=self.digit_base,
                    group=self.group, interpret=self.interpret,
                )
        else:
            for a in range(self.n_strips):
                planes = pairs_packed.packed_strip_update(
                    planes,
                    x,
                    self._seq_of,
                    self._first_seq,
                    self._bounds,
                    jnp.int32(a),
                    g=self.g,
                    k=self.k,
                    tile=self.tile,
                    c_max=self.c_max,
                    n_strips=self.n_strips,
                    n_digits=self.n_digits,
                    digit_base=self.digit_base,
                    backend="xla",
                    interpret=False,
                )
        return planes

    def exact_device(self):
        """Exact unnormalized kernel as device-resident ``DeviceCounts``
        (kernel/device_counts.py), skipping the digit-plane transfer
        machinery entirely: planes combine to one int32 matrix on device,
        the upper triangle mirrors on device, and the length-sort
        un-permutation is a device gather.

        The int32 combination needs the runtime plane-max bound
        ``sum(max_d * base^d) < 2^31`` (holds on all real data —
        see ``_planes_to_host``); pathological inputs fall back to the
        exact host per-plane int64 combination and return a numpy array,
        which callers must accept (FastSK._compute handles both).
        """
        from ..ops import pairs_packed
        from .device_counts import DeviceCounts

        if self.mesh is not None:
            raise ValueError("device-resident exact is single-device")
        n_pad = self.n + self.c_pad
        x = _build_packed_x_jit(
            self._ids, self._seq_of, self._win_of,
            g=self.g, alpha=self.alpha, code_min=self.code_min,
            dtype=jnp.int8 if self.backend == "pallas" else jnp.bfloat16,
        )
        planes = self._compute_planes(x, n_pad)
        pos = np.empty(self.n, dtype=np.int64)
        pos[self.order] = np.arange(self.n)
        maxes = np.asarray(pairs_packed.plane_maxes(tuple(planes)))
        bound = sum(
            int(mx) * self.digit_base**d for d, mx in enumerate(maxes)
        )
        if bound >= 2**31:
            k_sorted = np.zeros((self.n, self.n), dtype=np.int64)
            for dig in range(self.n_digits):
                k_sorted += (self.digit_base**dig) * np.asarray(
                    planes[dig], dtype=np.int64
                )[: self.n, : self.n]
            if getattr(self, "_planes_upper_only", False):
                k_sorted = np.triu(k_sorted) + np.triu(k_sorted, 1).T
            return k_sorted[np.ix_(pos, pos)]
        k32 = pairs_packed.combine_planes_int32(
            tuple(planes), digit_base=self.digit_base
        )
        full = jnp.triu(k32) + jnp.triu(k32, 1).T
        full = full[: self.n, : self.n]
        full = jnp.take(jnp.take(full, pos, axis=0), pos, axis=1)
        return DeviceCounts(full)

    def _band_planes(self, x, n_pad: int):
        """Band Pallas sweep: ONE fused dispatch over every upper-triangle
        strip pair, each strip a accumulating its full plane row band in
        VMEM (ops/pairs_packed_pallas.py:packed_band_pallas) — no
        per-pair scatter (the pair-list path's residual 0.4 s on protein
        1.1) and no transpose part copies (sequences are packed in order,
        so the upper triangle is complete from (fa, fb) landings alone;
        consumers mirror — which the transfer-optimized host pull and the
        device-resident path already did)."""
        from ..ops.pairs_packed_pallas import packed_band_pallas

        ns = self.n_strips
        c_land = -(-(self.c_pad + 128) // 128) * 128
        land_dtype = self._land_dtype()
        ga_all = _build_ga_all_jit(
            self._seq_of, self._first_seq, tile=self.tile,
            c_pad=self.c_pad, dtype=land_dtype,
        )
        gb_all = _build_gb_land_jit(
            self._seq_of, self._first_seq, tile=self.tile, c_land=c_land,
            dtype=land_dtype,
        )
        first_seq = np.asarray(self.pack["first_seq"])
        pa = np.repeat(np.arange(ns, dtype=np.int32), np.arange(ns, 0, -1))
        pb = np.concatenate(
            [np.arange(a, ns, dtype=np.int32) for a in range(ns)]
        )
        # Diagonal completeness: a sequence straddling strips a < b makes
        # K[s, s] need BOTH w_a*w_b and w_b*w_a cross terms, and only the
        # first lands upper from pair (a, b). Whenever the transposed
        # block (fb, fa) reaches the diagonal (fb < fa + c_pad), add the
        # reversed pair (b, a) — the kernel is direction-generic, so
        # part(b, a) IS the transposed block, landed in strip b's band.
        # All other transposed entries are strictly lower-triangle and
        # come back via the final mirror.
        rev = (first_seq[pb] < first_seq[pa] + self.c_pad) & (pb > pa)
        pa_all = np.concatenate([pa, pb[rev]])
        pb_all = np.concatenate([pb, pa[rev]])
        from ..ops.pairs_packed_pallas import band_vmem_feasible

        w_est = -(-n_pad // 128) * 128 + c_land
        if len(pa_all) > int(1.5 * self.BAND_SLOT_CAP) or not band_vmem_feasible(
            tile=self.tile, f=self.g * self.alpha,
            xsz=1 if (x.dtype == jnp.int8 and land_dtype == jnp.int8) else 2,
            c_pad=self.c_pad, c_land=c_land, w=w_est,
            n_digits=self.n_digits, slots=len(pa_all),
        ):
            # the prefetched slot lists would blow the 1 MB SMEM budget,
            # or the chunk-independent VMEM terms (band out block, part
            # scratch) exceed the scoped cap at any chunk (very long
            # documents / very large N): use the slabbed pair-list sweep
            return self._pairlist_planes(x, n_pad)
        order = np.argsort(pa_all, kind="stable")  # bands need sorted a
        pa = pa_all[order].astype(np.int32)
        pb = pb_all[order].astype(np.int32)
        fbv = (first_seq[pb] // 128).astype(np.int32)  # landing block
        w = -(-n_pad // 128) * 128 + c_land
        bands = packed_band_pallas(
            x, ga_all, gb_all,
            jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(fbv),
            g=self.g, k=self.k, tile=self.tile, c_pad=self.c_pad,
            c_land=c_land, w=w, n_strips=ns, n_digits=self.n_digits,
            digit_base=self.digit_base, interpret=self.interpret,
        )
        planes = _bands_to_planes_jit(
            bands, jnp.asarray(first_seq.astype(np.int32)),
            n_pad=n_pad, n_digits=self.n_digits,
        )
        self._planes_upper_only = True
        return planes

    def _pairlist_planes(self, x, n_pad: int):
        """Pair-list Pallas sweep: the upper-triangle strip pairs are
        processed in fixed-size slabs, each one fused Pallas dispatch +
        one scatter-add per digit plane (ops/pairs_packed.py:
        packed_pairlist_sweep). No sub-diagonal waste, no per-pair XLA
        RMW chains — the two residual costs of the grouped path."""
        from ..ops import pairs_packed

        ns = self.n_strips
        land_dtype = self._land_dtype()
        ga_all = _build_ga_all_jit(
            self._seq_of, self._first_seq, tile=self.tile,
            c_pad=self.c_pad, dtype=land_dtype,
        )
        gb_all = _build_gb_all_jit(
            self._seq_of, self._first_seq, tile=self.tile,
            c_pad=self.c_pad, dtype=land_dtype,
        )
        first_seq = np.asarray(self.pack["first_seq"])
        ab = [(a, b) for a in range(ns) for b in range(a, ns)]
        n_pairs = len(ab)
        # slab size: bound the [S, n_digits, c_pad, c_pad] parts array
        # (and the SMEM-resident prefetch lists) — one compile for all
        # slabs; padding slots compute strip (0, 0) and are dropped at
        # the scatter (FILL_OR_DROP on an out-of-bounds corner)
        cap = self.SLAB_BYTES // (self.n_digits * self.c_pad**2 * 4)
        slab = max(1, min(4096, cap, n_pairs))
        planes = tuple(
            jnp.zeros((n_pad, n_pad), jnp.int32)
            for _ in range(self.n_digits)
        )
        for s0 in range(0, n_pairs, slab):
            chunk = ab[s0 : s0 + slab]
            pad = slab - len(chunk)
            pa = np.fromiter(
                (p[0] for p in chunk), np.int32, len(chunk)
            )
            pb = np.fromiter(
                (p[1] for p in chunk), np.int32, len(chunk)
            )
            pa = np.concatenate([pa, np.zeros(pad, np.int32)])
            pb = np.concatenate([pb, np.zeros(pad, np.int32)])
            idx = np.full((2 * slab, 2), n_pad, dtype=np.int32)
            for i, (a, b) in enumerate(chunk):
                idx[i] = (first_seq[a], first_seq[b])
                if b > a:
                    idx[slab + i] = (first_seq[b], first_seq[a])
            planes = pairs_packed.packed_pairlist_sweep(
                planes, x, ga_all, gb_all,
                jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(idx),
                g=self.g, k=self.k, tile=self.tile, c_pad=self.c_pad,
                n_digits=self.n_digits, digit_base=self.digit_base,
                interpret=self.interpret,
            )
        return planes

    def _planes_to_host(self, planes) -> np.ndarray:
        """Digit planes -> int64 [n, n] counts, transfer-optimized.

        The full per-plane pull costs more than the kernel on remote-
        tunnel hosts (measured: ~39 MB at ~12 MB/s = 3.2 s of protein
        1.1's 4.1 s wall). When the runtime per-plane maxes bound the
        combined entry below 2^31 (always, on real data), the planes
        collapse to one int32 matrix on device, the diagonal — the
        dominant within-tile outlier — pulls separately as a [n] vector,
        and only the upper-triangle 128-tiles of the rest transfer as
        min-offset byte planes (ops/transfer.py), ~1-2 bytes/count on
        real data. Worst-case data falls back to exact per-plane int64
        combination on the host."""
        from ..ops import pairs_packed
        from ..ops.transfer import pull_tiles_int32

        n_pad = int(planes[0].shape[0])
        maxes = np.asarray(pairs_packed.plane_maxes(tuple(planes)))
        bound = sum(
            int(m) * self.digit_base**d for d, m in enumerate(maxes)
        )
        if bound >= 2**31:
            k_sorted = np.zeros((self.n, self.n), dtype=np.int64)
            for dig in range(self.n_digits):
                k_sorted += (self.digit_base**dig) * np.asarray(
                    planes[dig], dtype=np.int64
                )[: self.n, : self.n]
            if getattr(self, "_planes_upper_only", False):
                k_sorted = np.triu(k_sorted) + np.triu(k_sorted, 1).T
            return k_sorted

        ts = 128
        k32 = pairs_packed.combine_planes_int32(
            tuple(planes), digit_base=self.digit_base
        )
        diag_dev, k32 = pairs_packed.split_diagonal(k32)
        tiles = pairs_packed.upper_tiles(k32, tile=ts)
        npt = -(-n_pad // ts)
        tiles_h = pull_tiles_int32(
            tiles, np.arange(npt * (npt + 1) // 2)
        )
        diag = np.asarray(diag_dev)
        # int32 assembly (entries < 2^31 by the bound; the mirror never
        # adds two non-zeros) — half the host memory traffic of int64
        k_full = np.zeros((npt * ts, npt * ts), dtype=np.int32)
        ti = 0
        for i in range(npt):
            for j in range(i, npt):
                k_full[i * ts : (i + 1) * ts, j * ts : (j + 1) * ts] = (
                    tiles_h[ti]
                )
                ti += 1
        k_full = np.triu(k_full, 1) + np.triu(k_full, 1).T
        diag_pad = np.zeros(k_full.shape[0], dtype=np.int32)
        diag_pad[:n_pad] = diag
        np.fill_diagonal(k_full, diag_pad)
        return k_full[: self.n, : self.n]

    def _exact_sharded_planes_rows(self, x, n_pad: int) -> np.ndarray:
        """Ring-sharded mesh planes (KernelConfig.mesh_state="sharded",
        the default): the window table is strip-sharded to match each
        device's plane row block and travels the ring ONCE while every
        device sweeps its own strips against each visiting shard
        (parallel/sharding.py:packed_ring_rowsharded) — per-device
        memory is O(N^2/n_dev) block + O(rows/n_dev) operands, nothing
        replicated but the tiny strip metadata, one dispatch for the
        whole kernel. Overlapping halo extents add on host assembly.
        Integer-identical to the replicated path and the single device.
        """
        from ..parallel import sharding as shd

        mesh = self.mesh
        n_dev = mesh.devices.size
        spd = -(-self.n_strips // n_dev)  # own strips per device
        fs = np.asarray(self.pack["first_seq"])
        row0 = np.zeros(n_dev, np.int32)
        blk = self.c_max
        for d in range(n_dev):
            s0 = d * spd
            s1 = min(s0 + spd, self.n_strips)
            if s0 < self.n_strips:
                row0[d] = fs[s0]
                blk = max(blk, int(fs[s1 - 1]) + self.c_max - int(fs[s0]))

        # pad the window table to n_dev * spd strips (dead strips carry
        # all-zero one-hot rows: D = 0 and C(0, k) = 0, so they
        # contribute exactly nothing)
        rows_pad = n_dev * spd * self.tile
        f = x.shape[1]
        x_p = jnp.pad(x, ((0, rows_pad - x.shape[0]), (0, 0)))
        seq_p = np.pad(
            np.asarray(self.pack["seq_of"]),
            (0, rows_pad - x.shape[0]),
            constant_values=-1,
        )

        dev_sharding = jax.sharding.NamedSharding(
            mesh,
            jax.sharding.PartitionSpec(
                (shd.ROWS_AXIS, shd.THETA_AXIS), None, None, None
            ),
        )
        dev3 = jax.sharding.NamedSharding(
            mesh,
            jax.sharding.PartitionSpec(
                (shd.ROWS_AXIS, shd.THETA_AXIS), None, None
            ),
        )
        dev2 = jax.sharding.NamedSharding(
            mesh,
            jax.sharding.PartitionSpec((shd.ROWS_AXIS, shd.THETA_AXIS), None),
        )
        dev1 = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec((shd.ROWS_AXIS, shd.THETA_AXIS))
        )
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        blocks = jnp.zeros(
            (n_dev, self.n_digits, blk, n_pad), jnp.int32, device=dev_sharding
        )
        x_dev = jax.device_put(
            np.asarray(x_p).reshape(n_dev, spd * self.tile, f), dev3
        )
        seq_dev = jax.device_put(
            seq_p.reshape(n_dev, spd * self.tile).astype(np.int32), dev2
        )
        first_seq = jax.device_put(self._first_seq, rep)
        bounds = jax.device_put(self._bounds, rep)
        r0_dev = jax.device_put(row0, dev1)
        blocks = shd.packed_ring_rowsharded(
            blocks, x_dev, seq_dev, first_seq, bounds, r0_dev,
            mesh=mesh, spd=spd, g=self.g, k=self.k, tile=self.tile,
            c_max=self.c_max, n_strips=self.n_strips,
            n_digits=self.n_digits, digit_base=self.digit_base,
        )
        blocks_host = shd.host_gather(blocks)
        rows_total = max(int(row0.max()) + blk, n_pad)
        planes = np.zeros((self.n_digits, rows_total, n_pad), np.int64)
        for d in range(n_dev):
            planes[:, row0[d] : row0[d] + blk] += blocks_host[d]
        k_sorted = np.zeros((self.n, self.n), dtype=np.int64)
        for dig in range(self.n_digits):
            k_sorted += (self.digit_base**dig) * planes[dig][
                : self.n, : self.n
            ]
        return k_sorted

    def _exact_sharded_planes(self, x, n_pad: int) -> np.ndarray:
        """Mesh-parallel strips, round-robin: each device accumulates its
        strips' contributions into a private digit-plane replica; the host
        sums replicas (each (a, b) pair lands on exactly one device)
        (KernelConfig.mesh_state="replicated")."""
        from ..parallel import sharding as shd

        mesh = self.mesh
        n_dev = mesh.devices.size
        dev_sharding = jax.sharding.NamedSharding(
            mesh,
            jax.sharding.PartitionSpec(
                (shd.ROWS_AXIS, shd.THETA_AXIS), None, None, None
            ),
        )
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        planes_dev = jnp.zeros(
            (n_dev, self.n_digits, n_pad, n_pad), jnp.int32,
            device=dev_sharding,
        )
        x = jax.device_put(x, rep)
        seq_of = jax.device_put(self._seq_of, rep)
        first_seq = jax.device_put(self._first_seq, rep)
        bounds = jax.device_put(self._bounds, rep)
        spd = -(-self.n_strips // n_dev)  # rounds
        for ridx in range(spd):
            planes_dev = shd.packed_round_sharded(
                planes_dev, x, seq_of, first_seq, bounds, jnp.int32(ridx),
                mesh=mesh, g=self.g, k=self.k, tile=self.tile,
                c_max=self.c_max, n_strips=self.n_strips,
                n_digits=self.n_digits, digit_base=self.digit_base,
                backend=self.backend,
            )
        planes_host = shd.host_gather(planes_dev).sum(axis=0)
        k_sorted = np.zeros((self.n, self.n), dtype=np.int64)
        for dig in range(self.n_digits):
            k_sorted += (self.digit_base**dig) * planes_host[dig][
                : self.n, : self.n
            ]
        return k_sorted
