"""Pallas in-VMEM row sort: the merge-sort HBM end-run.

The fused detector step's largest remaining cost is `_merge_runs`'s two
per-event-window sorts ([E, W] with W = point_budget * 100 = 57,600 at
bench shapes, ~61 ms of the 235 ms step). `lax.sort` lowers to a
bitonic-style network that stages every compare-exchange pass through
HBM: for W padded to 65,536 that is 136 passes x 412 MB ≈ 56 GB of
traffic — 68 ms at the v5e's 819 GB/s, matching the measured 75 ms
(docs/roofline.md). But one event row is only 57,600 x 8 B = 460 KB:
it FITS IN VMEM. This kernel loads a row once, runs the whole bitonic
network on-chip, and writes it once — HBM is paid 2x instead of 136x,
leaving the VPU compare-exchange work (~10-20 ms/batch estimated) as
the cost.

Representation: two i32 planes instead of one i64 (Mosaic's i64 support
is weak). Ordering is lexicographic (hi, then lo), ascending, with BOTH
planes required nonnegative — exactly the order of the caller's
`pack64(key, f32_bits)` i64 sort (keys are nonnegative i32; f32 bit
patterns of nonnegative floats compare like the floats), so swapping
this kernel for `lax.sort` is bit-exact (tests/test_sort_pallas.py).

Layout: a row of P = 2^k elements is viewed as [S, 128] (sublane-major:
element i sits at sublane i >> 7, lane i & 127). A bitonic stage with
XOR-distance d becomes a roll-and-select along lanes (d < 128) or
sublanes (d >= 128) — no transposes, no in-kernel lane-split reshapes
(both measured Mosaic hazards, CLAUDE.md). Masks ride int32 iotas
(8-bit broadcasts are another Mosaic hazard).

Reference semantics context: the sorts implement the reference's
per-event (pad, tb) dict merge (transporter.py:124-249); this kernel
changes only WHERE the sorting network runs, not its result.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sort_pairs_pallas", "sort_i64_pallas", "merge_runs_fused_pallas"]

_LANES = 128
_PAD = np.int32(2**31 - 1)  # sorts after every real (nonneg) element
_F0 = np.float32(0.0)  # pinned f32 zero: a bare 0.0 is weak-f64 under x64,
# and any in-kernel f64->f32 convert is unsupported by Mosaic (r4 TPU A/B)
# rows padded beyond this no longer fit the ~10 MB usable scoped VMEM
# (working set ~ 8 copies x P x 4 B): callers fall back to lax.sort
MAX_INVMEM_TOTAL = 1 << 18


def fits_invmem(width: int) -> bool:
    """True if a row of ``width`` lanes, padded to the next power of two,
    fits the kernels' VMEM budget. Callers keep the lax path otherwise."""
    return 1 << (int(width) - 1).bit_length() <= MAX_INVMEM_TOTAL


def _bit_mask(shape, dist: int, trans: bool = False):
    """Boolean mask: (element_index & dist) == 0 for power-of-two dist.

    Normal layout [S, L]: lane dim (axis 1) holds index bits 0-6, sublane
    dim (axis 0) bits 7+. Transposed layout [L, S] swaps the axes.
    """
    if dist < _LANES:
        io = jax.lax.broadcasted_iota(jnp.int32, shape, 0 if trans else 1)
        return (io & np.int32(dist)) == 0
    io = jax.lax.broadcasted_iota(jnp.int32, shape, 1 if trans else 0)
    return (io & np.int32(dist // _LANES)) == 0


def _bit(shape, dist: int, trans: bool = False):
    """int32 0/1: bit log2(dist) of the flattened element index (the
    power-of-two ``dist`` selects the bit). Same axis split as _bit_mask."""
    if dist < _LANES:
        io = jax.lax.broadcasted_iota(jnp.int32, shape, 0 if trans else 1)
        return (io // np.int32(dist)) & np.int32(1)
    io = jax.lax.broadcasted_iota(jnp.int32, shape, 1 if trans else 0)
    return (io // np.int32(dist // _LANES)) & np.int32(1)


def _partner(x, low, dist: int, trans: bool = False):
    """Value at index i XOR dist: roll both directions, pick per element."""
    if dist < _LANES:
        axis, k = (0 if trans else 1), dist
    else:
        axis, k = (1 if trans else 0), dist // _LANES
    fwd = jnp.roll(x, -k, axis=axis)
    bwd = jnp.roll(x, k, axis=axis)
    return jnp.where(low, fwd, bwd)


def _stage(h, l, d: int, sz: int, trans: bool):  # noqa: E741
    """One bitonic compare-exchange stage at XOR-distance d, phase sz."""
    shape = h.shape
    low = _bit_mask(shape, d, trans)
    # ascending & low-index keeps the min (swap on gt); the other three
    # (asc, low) cases follow by symmetry. asc == low compared as BOOLS
    # lowers to an i8->i1 arith.trunci Mosaic cannot legalize — the real
    # root cause of every round-4 "HTTP 500" sort-kernel compile failure
    # (r5 probe, tools/probe_mosaic_sort.py). Compare the index bits as
    # int32 instead: asc == low  <=>  bit_sz(i) == bit_d(i), since
    # asc = (bit_sz == 0) and low = (bit_d == 0); bit_sz of any index is
    # 0 in the final phase (sz == total), keeping asc's all-True case.
    same = _bit(shape, sz, trans) == _bit(shape, d, trans)
    ph = _partner(h, low, d, trans)
    plo = _partner(l, low, d, trans)
    eq = h == ph
    gt = (h > ph) | (eq & (l > plo))
    lt = (h < ph) | (eq & (l < plo))
    # NOT jnp.where(same, gt, lt): a select with BOOL value operands is
    # the second Mosaic legalize failure (i8->i1 trunci, r5 micro-probe);
    # pure i1 logic lowers fine
    take = (same & gt) | (~same & lt)
    return jnp.where(take, ph, h), jnp.where(take, plo, l)


def _seg_dyn(h, l, dlog_hi: int, dlog_lo: int, bitsz, sub_units: bool):  # noqa: E741
    """Stages dlog = dlog_hi..dlog_lo (descending) of one bitonic phase,
    run under a ``lax.fori_loop`` with a TRACED stage index — the
    compile-time end-run around the fully unrolled network (the backend
    compiler dies without a diagnostic past ~150-270 unrolled stages,
    BASELINE.md round-5). Requires element-index bit ``dlog`` to live on
    axis 0: ``sub_units=True`` means the [S, 128] layout where axis 0
    carries index bits 7+ (roll amount 2^(dlog-7) rows), ``False`` the
    transposed [128, S] layout where axis 0 carries bits 0-6 (roll
    amount 2^dlog). ``bitsz`` is the int32 0/1 plane of index bit
    log2(sz) for this phase (static per segment). Dynamic-amount
    rotations use ``pltpu.roll`` (compile + bit-exactness probed on
    silicon first — tools/probe_roll_loop.py)."""
    n = dlog_hi - dlog_lo + 1
    if n <= 0:
        return h, l
    alen = np.int32(h.shape[0])
    io0 = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
    base = np.int32(dlog_hi - (7 if sub_units else 0))

    def body(i, hl):
        hh, ll = hl
        slog = base - i
        k = jnp.int32(1) << slog
        bit_d = (io0 >> slog) & np.int32(1)
        low = bit_d == np.int32(0)
        ph = jnp.where(low, pltpu.roll(hh, alen - k, 0),
                       pltpu.roll(hh, k, 0))
        plo = jnp.where(low, pltpu.roll(ll, alen - k, 0),
                        pltpu.roll(ll, k, 0))
        # identical hazard-safe compare/select as _stage (int32 bit
        # compare for `same`, pure-i1 logic, no bool VALUE selects)
        same = bitsz == bit_d
        eq = hh == ph
        gt = (hh > ph) | (eq & (ll > plo))
        lt = (hh < ph) | (eq & (ll < plo))
        take = (same & gt) | (~same & lt)
        return jnp.where(take, ph, hh), jnp.where(take, plo, ll)

    # fori bounds MUST be traced-i32 (jnp.int32 minted here, inside the
    # kernel trace): concrete np/Python bounds make the lowered loop carry
    # an i64 induction variable under global x64, and Mosaic's
    # _convert_helper infinitely recurses on the resulting i64->i32
    # convert (RecursionError at lowering — measured, r5)
    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, (h, l))


def _bit_of(shape, pos: int, axis: int):
    """int32 0/1 plane: bit ``pos`` of the axis-``axis`` iota."""
    io = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return (io >> np.int32(pos)) & np.int32(1)


def _bitonic_loop(h, l, total: int):  # noqa: E741
    """Transposed-layout bitonic network with fori_loop stage segments
    (lane_mode="loop"): ~25 traced stage bodies instead of 136 at
    total=65536, trading unrolled-network compile time (and the
    backend's stage-count death) for per-iteration loop overhead. Same
    ordering as the unrolled networks — bit-exact drop-in."""
    tlog = total.bit_length() - 1
    # phases sz = 2..128: every stage is lane-dim -> one transposed run
    ht, lt = h.T, l.T
    for szlog in range(1, 8):
        # bit log2(sz) of the element index: lane bit (axis 0 of the
        # transposed plane) below 7, sublane bit (axis 1) at 7
        bitsz = (_bit_of(ht.shape, szlog, 0) if szlog <= 6
                 else _bit_of(ht.shape, szlog - 7, 1))
        ht, lt = _seg_dyn(ht, lt, szlog - 1, 0, bitsz, False)
    h, l = ht.T, lt.T  # noqa: E741
    for szlog in range(8, tlog + 1):
        # sublane-dim stages (d >= 128) on the normal [S, 128] layout
        h, l = _seg_dyn(  # noqa: E741
            h, l, szlog - 1, 7, _bit_of(h.shape, szlog - 7, 0), True
        )
        # lane-dim tail (d = 64..1) on the transposed layout
        ht, lt = h.T, l.T
        ht, lt = _seg_dyn(ht, lt, 6, 0, _bit_of(ht.shape, szlog - 7, 1),
                          False)
        h, l = ht.T, lt.T  # noqa: E741
    return h, l


def _bitonic(h, l, total: int, lane_mode: str):  # noqa: E741
    """Full bitonic network over the flattened [S, 128] pair (see
    _sort_kernel for lane_mode semantics). Generic over the l plane's
    dtype — i32 bit-compare of nonneg f32 equals f32 compare, so the
    fused merge kernel carries charges as f32 directly."""
    if lane_mode == "loop":
        return _bitonic_loop(h, l, total)
    if lane_mode == "roll":
        sz = 2
        while sz <= total:
            d = sz // 2
            while d >= 1:
                h, l = _stage(h, l, d, sz, False)  # noqa: E741
                d //= 2
            sz *= 2
        return h, l
    ht, lt = h.T, l.T
    sz = 2
    while sz <= min(total, _LANES):
        d = sz // 2
        while d >= 1:
            ht, lt = _stage(ht, lt, d, sz, True)
            d //= 2
        sz *= 2
    h, l = ht.T, lt.T  # noqa: E741
    while sz <= total:
        d = sz // 2
        while d >= _LANES:
            h, l = _stage(h, l, d, sz, False)  # noqa: E741
            d //= 2
        ht, lt = h.T, l.T
        while d >= 1:
            ht, lt = _stage(ht, lt, d, sz, True)
            d //= 2
        h, l = ht.T, lt.T  # noqa: E741
        sz *= 2
    return h, l


def _cumsum_flat(c):
    """Inclusive prefix sum of an [S, 128] f32 tile in flattened index
    order, entirely in VMEM: Hillis-Steele along lanes, then an
    exclusive sublane prefix of the row totals added back. NOTE: the
    summation association differs from XLA's tree cumsum, so results
    match it only to f32 ulps (documented where consumed)."""
    s, l = c.shape  # noqa: E741
    lane = jax.lax.broadcasted_iota(jnp.int32, (s, l), 1)
    d = 1
    while d < l:
        c = c + jnp.where(lane >= d, jnp.roll(c, d, axis=1), _F0)
        d *= 2
    # row totals (lane L-1 of the inclusive row prefix), [S, 1]
    rt = jnp.sum(
        jnp.where(lane == l - 1, c, _F0), axis=1, keepdims=True
    )
    sub = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    x = jnp.where(sub >= 1, jnp.roll(rt, 1, axis=0), _F0)
    d = 1
    while d < s:
        x = x + jnp.where(sub >= d, jnp.roll(x, d, axis=0), _F0)
        d *= 2
    return c + x


def _run_last_flat(u, sentinel_mask):
    """Mask of run-last elements of i32 keys in flattened [S, 128] order
    (the very last element is always a run end)."""
    s, l = u.shape  # noqa: E741
    lane = jax.lax.broadcasted_iota(jnp.int32, (s, l), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (s, l), 0)
    a = jnp.roll(u, -1, axis=1)
    b = jnp.roll(jnp.roll(u, -1, axis=0), -1, axis=1)
    nxt = jnp.where(lane == l - 1, b, a)
    last = (u != nxt) | ((lane == l - 1) & (sub == s - 1))
    return last & ~sentinel_mask


def _merge_kernel(pk_ref, qv_ref, ok_ref, oc_ref, on_ref, *, total: int,
                  rank_bits: int, lane_mode: str):
    """The whole _merge_runs of one event row in one kernel: sort by
    (packed key, charge), in-VMEM charge prefix, run-end mask, compacting
    second sort — HBM is paid once in and once out instead of at every
    network stage + every XLA pass between the two lax.sorts."""
    h = pk_ref[0]
    q = qv_ref[0]
    h, q = _bitonic(h, q, total, lane_mode)
    c = _cumsum_flat(q)
    sent = h == _PAD  # KEY_SENTINEL == INT32_MAX == the wrapper's pad
    real_last = _run_last_flat(h >> np.int32(rank_bits), sent)
    # axis-at-a-time with keepdims: a scalar-output reduce would take
    # Mosaic's proxy path, which re-traces jnp.sum WITHOUT our dtype and
    # mints an int64 accumulator under global x64 ("64-bit types are not
    # supported" — the r4 TPU A/B failure mode for +fused)
    nrow = jnp.sum(
        real_last.astype(jnp.int32), axis=1, dtype=jnp.int32, keepdims=True
    )
    on_ref[0] = jnp.sum(
        nrow, axis=0, dtype=jnp.int32, keepdims=True
    ) * jnp.ones_like(on_ref[0])
    h2 = jnp.where(real_last, h, _PAD)
    c2 = jnp.where(real_last, c, _F0)
    h2, c2 = _bitonic(h2, c2, total, lane_mode)
    cap_s = ok_ref.shape[1]
    ok_ref[0] = h2[:cap_s]
    oc_ref[0] = c2[:cap_s]


@partial(jax.jit, static_argnames=("cap", "rank_bits", "interpret",
                                   "lane_mode"))
def merge_runs_fused_pallas(
    packed: jax.Array,
    qv: jax.Array,
    cap: int,
    rank_bits: int,
    interpret: bool | None = None,
    lane_mode: str = "roll",
):
    """Fused equal-key merge: returns (key2 [E, cap] ascending with
    sentinel padding, c2 [E, cap] inclusive prefix at run ends, n_uniq
    [E]). Drop-in for the two-lax.sort + jnp.cumsum formulation in
    deposition._merge_runs, with integer outputs BIT-exact and the f32
    prefix equal to XLA's tree cumsum only to ulps (different summation
    association) — callers difference consecutive entries, so per-run
    sums inherit that ulp-level difference.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    e, w = packed.shape
    cap = min(cap, w)
    total = max(_LANES * 2, 1 << (w - 1).bit_length())
    if total != w:
        packed = jnp.pad(
            packed, ((0, 0), (0, total - w)), constant_values=_PAD
        )
        qv = jnp.pad(qv, ((0, 0), (0, total - w)))
    s = total // _LANES
    cap_s = min(s, -(-cap // _LANES))  # sublane rows covering cap
    pk3 = packed.reshape(e, s, _LANES)
    qv3 = qv.astype(jnp.float32).reshape(e, s, _LANES)

    zero = np.int32(0)
    spec_in = pl.BlockSpec((1, s, _LANES), lambda b: (b, zero, zero))
    spec_cap = pl.BlockSpec((1, cap_s, _LANES), lambda b: (b, zero, zero))
    spec_n = pl.BlockSpec((1, 1, _LANES), lambda b: (b, zero, zero))
    ok, oc, on = pl.pallas_call(
        partial(_merge_kernel, total=total, rank_bits=rank_bits,
                lane_mode=lane_mode),
        grid=(e,),
        in_specs=[spec_in, spec_in],
        out_specs=[spec_cap, spec_cap, spec_n],
        out_shape=[
            jax.ShapeDtypeStruct((e, cap_s, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((e, cap_s, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((e, 1, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(pk3, qv3)
    return (
        ok.reshape(e, cap_s * _LANES)[:, :cap],
        oc.reshape(e, cap_s * _LANES)[:, :cap],
        on[:, 0, 0],
    )


def _sort_kernel(hi_ref, lo_ref, oh_ref, ol_ref, *, total: int,
                 lane_mode: str):
    """Full bitonic sort of one [S, 128] row pair, entirely in VMEM.

    lane_mode selects how lane-dim stages (XOR distance < 128) run:
    "roll" uses lane rotations in place; "transpose" moves the data to
    [128, S] once per lane-stage run so every rotation is a cheap
    sublane roll (hedge: Mosaic lane rotations may lower as expensive
    relayouts — measure both on silicon, tools/microbench_sort_pallas.py);
    "loop" is the transpose layout with fori_loop stage segments
    (_bitonic_loop) — same result, ~5x fewer traced stages to compile.
    """
    h = hi_ref[0]
    l = lo_ref[0]  # noqa: E741 — paired with h throughout
    if lane_mode == "loop":
        h, l = _bitonic_loop(h, l, total)  # noqa: E741
    elif lane_mode == "roll":
        sz = 2
        while sz <= total:
            d = sz // 2
            while d >= 1:
                h, l = _stage(h, l, d, sz, False)  # noqa: E741
                d //= 2
            sz *= 2
    else:
        # phases sz = 2..128 are entirely lane-dim: one transposed run
        ht, lt = h.T, l.T
        sz = 2
        while sz <= min(total, _LANES):
            d = sz // 2
            while d >= 1:
                ht, lt = _stage(ht, lt, d, sz, True)
                d //= 2
            sz *= 2
        h, l = ht.T, lt.T  # noqa: E741
        while sz <= total:
            d = sz // 2
            while d >= _LANES:
                h, l = _stage(h, l, d, sz, False)  # noqa: E741
                d //= 2
            ht, lt = h.T, l.T
            while d >= 1:
                ht, lt = _stage(ht, lt, d, sz, True)
                d //= 2
            h, l = ht.T, lt.T  # noqa: E741
            sz *= 2
    oh_ref[0] = h
    ol_ref[0] = l


@partial(jax.jit, static_argnames=("interpret", "lane_mode"))
def sort_pairs_pallas(
    hi: jax.Array,
    lo: jax.Array,
    interpret: bool | None = None,
    lane_mode: str = "roll",
) -> tuple[jax.Array, jax.Array]:
    """Row-wise ascending lexicographic sort of (hi, lo) i32 pairs.

    hi, lo: [E, W] int32, BOTH nonnegative (the caller's key plane and
    f32-bit value plane). Rows are padded to the next power of two with
    INT32_MAX pairs (they sort last and are sliced back off), so W may
    be arbitrary. Bit-exact drop-in for
    ``lax.sort(key<<32 | f32_bits, dimension=1)`` on nonneg planes.
    ``lane_mode``: see ``_sort_kernel``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    e, w = hi.shape
    total = max(_LANES * 2, 1 << (w - 1).bit_length())
    if total != w:
        padc = ((0, 0), (0, total - w))
        hi = jnp.pad(hi, padc, constant_values=_PAD)
        lo = jnp.pad(lo, padc, constant_values=_PAD)
    s = total // _LANES
    hi3 = hi.reshape(e, s, _LANES)
    lo3 = lo.reshape(e, s, _LANES)

    zero = np.int32(0)
    spec = pl.BlockSpec((1, s, _LANES), lambda b: (b, zero, zero))
    oh, ol = pl.pallas_call(
        partial(_sort_kernel, total=total, lane_mode=lane_mode),
        grid=(e,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((e, s, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((e, s, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(hi3, lo3)
    return (
        oh.reshape(e, total)[:, :w],
        ol.reshape(e, total)[:, :w],
    )


@partial(jax.jit, static_argnames=("interpret", "lane_mode"))
def sort_i64_pallas(
    x: jax.Array, interpret: bool | None = None, lane_mode: str = "roll"
) -> jax.Array:
    """Row-wise ascending sort of [E, W] int64 via the 2-plane kernel.

    Split ordering: the hi plane carries the SIGNED top 32 bits (so i64
    sign order is preserved), the lo plane the low 32 compared as signed
    i32. Exact i64 order therefore requires that within any equal-hi
    group the low words share a sign (or their order be irrelevant) —
    true for `_convert_to_spyral`'s key (low word = f32 charge bits of a
    nonnegative charge; the only negative low words belong to dropped
    rows pinned to i64 max, whose mutual order is meaningless). The pad
    pairs (INT32_MAX, INT32_MAX) == i64 max still sort last.
    """
    hi = (x >> 32).astype(jnp.int32)
    lo = (x & 0xFFFFFFFF).astype(jnp.uint32).astype(jnp.int32)
    sh, sl = sort_pairs_pallas(hi, lo, interpret=interpret,
                               lane_mode=lane_mode)
    return (sh.astype(jnp.int64) << 32) | sl.astype(jnp.uint32).astype(
        jnp.int64
    )


def lane_mode_from_flag(flag) -> str:
    """Map an ``EngineParams.pallas_sort`` flag value to the kernels'
    ``lane_mode``. Single source of truth for BOTH the merge sorts
    (deposition._merge_runs) and the convert-path sort
    (DetectorSimulator): a one-sided edit would silently run different
    kernels for the same flag. Precedence: "loop" is checked before
    "transpose" (the loop variants ARE the transposed layout plus
    fori_loop stage segments, and flags like "fused_loop" contain no
    other ordering hint)."""
    s = flag if isinstance(flag, str) else ""
    if "loop" in s:
        return "loop"
    if "transpose" in s:
        return "transpose"
    return "roll"
