"""Pallas TPU traversal: banded block-BVH walk with exact windowed refill.

The XLA formulation in ops/block_bvh.py phase C does a *fixed* `top_m`-step
scan whose per-step block gathers XLA lowers as giant dynamic-slice loops —
every ray tile pays for all `top_m` candidate blocks even when the first
one already contains the closest hit.  This module keeps the two-level
candidate selection (dense super culling + per-subtile block top-k, both
pure XLA and VPU-friendly) but runs the hot triangle loop as a
hand-written Pallas kernel, and makes the whole traversal EXACT:

  - triangle blocks live packed in HBM as (NB, 16, 128) component rows —
    128 triangles per block along the lane axis, global slot ids in row 10;
  - each Pallas program owns GROUP=8 subtiles of ST=16 coherent rays that
    advance through their entry-ordered candidate lists in LOCKSTEP
    rounds: round r intersects every live band's r-th block as one dense
    (8, 16, 128) Moller-Trumbore op (reference acceptance tests
    app/MobileRT/Shapes/Triangle.cpp:63-109), 8 block DMAs per round
    pipelined _PIPE deep; a band stops when its next candidate's entry
    exceeds its worst hit — the reference's near-child-first early-out
    (app/MobileRT/Accelerators/BVH.hpp:327-384) vectorized across bands;
  - subtiles are pre-sorted by candidate count so the lockstep bands of a
    program have near-equal walks (rounds ~ mean, not max);
  - shadow rays use an any-hit variant that additionally stops once every
    ray in a band is occluded (BVH.hpp shadow early-out);
  - EXACTNESS (the reference's unbudgeted stack-walk contract): a window
    with cutoff `cut` provably lists every block with conservative entry
    bound < cut, so rays whose best hit clears their window's cutoff are
    done; the rest take fresh per-ray windows (duplicated ST-fold so the
    interval hull collapses to exact slab bounds, making per-ray
    floor-windows sound) until resolved.  Oracle parity vs the naive
    intersector is enforced in tests; 0/2048 sampled mismatches on
    331k-triangle conference primaries.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import constants as C
from ..types import Hit, Scene, Triangles
from . import intersect as nv
from .block_bvh import _entry_cw
from .bvh import build_triangle_bvh

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = C.RAY_LENGTH_MAX

LANES = 128            # default triangles per block (= lane-tile multiple)
ST = C.SUBTILE         # rays per subtile (candidate-selection granularity)
GROUP = max(1, 128 // ST)   # subtiles per Pallas program (128 rays each)
DEFAULT_BPS = 16       # blocks per super
DEFAULT_TOP_S = 32     # candidate supers per subtile
DEFAULT_TOP_M = 48     # candidate blocks per subtile
_RAY_CHUNK = 65536


def _interpret() -> bool:
    # "axon" is a tunneled TPU backend; everything else (cpu test meshes)
    # runs the kernel in interpreter mode.
    return jax.default_backend() not in ("tpu", "axon")


@struct.dataclass
class PallasGrid:
    """Two-level block table packed for the Pallas traversal kernel."""
    super_lo: jnp.ndarray     # (3, K1)
    super_hi: jnp.ndarray     # (3, K1)
    # Per-block metadata packed one row per super so candidate selection
    # issues a single large-row gather (XLA's TPU gather is pathologically
    # slow for small slices).  Component-grouped — [lox x BPS][loy x BPS]
    # ... [first x BPS][count x BPS] — so the gathered rows slice into
    # clean (nt, s*BPS) lane-major arrays with zero relayouts (interleaved
    # per-block fields forced transposes costing ~60 ms/traversal on TPU).
    blocks_packed: jnp.ndarray  # (K1, 8 * BPS) f32
    # Packed triangle blocks: rows 0-2 point_a xyz, 3-5 ab, 6-8 ac,
    # 9 validity (1.0/0.0), 10 global triangle slot id per lane.
    tb: jnp.ndarray           # (NB, 16, LANES) f32, NB = K1 * BPS
    # Pre-packed Baldwin-Weber matmul operand per block for the MXU tile
    # kernel (layout documented in build_blocks).
    tw: jnp.ndarray           # (NB, 8, 3 * LANES) f32
    # Packed per-triangle shading attributes for the hit fill (layout in
    # intersect._fill_hit's docstring); aligned to the reordered triangles.
    tri_attr: jnp.ndarray     # (N, 32) f32
    top_s: int = struct.field(pytree_node=False, default=DEFAULT_TOP_S)
    top_m: int = struct.field(pytree_node=False, default=DEFAULT_TOP_M)
    # Global absolute t-margin for the MXU tile kernel's loose acceptance
    # and early-exit tests (covers the Baldwin-Weber error bound at the
    # largest block in the scene).
    t_margin: float = struct.field(pytree_node=False, default=1e-3)

    @property
    def num_supers(self) -> int:
        return self.super_lo.shape[1]

    @property
    def bps(self) -> int:
        return self.blocks_packed.shape[1] // 8

    def packed_field(self, gathered: jnp.ndarray, f: int) -> jnp.ndarray:
        """Slices component f out of gathered (nt, s, 8*BPS) rows and
        flattens to (nt, s*BPS)."""
        nt, s, _ = gathered.shape
        bps = self.bps
        return gathered[:, :, f * bps:(f + 1) * bps].reshape(nt, s * bps)


def build_blocks(tris: Triangles, blocks_per_super: int = DEFAULT_BPS,
                 top_s: int = DEFAULT_TOP_S,
                 top_m: int = DEFAULT_TOP_M,
                 lanes: int = LANES) -> Tuple[Triangles, PallasGrid]:
    """SAH build cut at `lanes`-triangle leaves, packed for Pallas.  Wider
    blocks amortize per-visit DMA/loop overhead for long (shadow) rays that
    cross many leaves; 128/256 are the sensible choices."""
    assert lanes % 128 == 0, "block width must be a lane-tile multiple"
    tris2, bvh = build_triangle_bvh(tris, leaf_size=lanes)
    counts = np.asarray(bvh.node_count)
    leaf = counts > 0
    bmin = np.asarray(bvh.node_min)[leaf]
    bmax = np.asarray(bvh.node_max)[leaf]
    bfirst = np.asarray(bvh.node_first)[leaf]
    bcount = counts[leaf]
    k = bmin.shape[0]

    bps = min(blocks_per_super, max(k, 1))
    k1 = max(1, -(-k // bps))
    padded = k1 * bps

    def pad(a, fill):
        out = np.full((padded,) + a.shape[1:], fill, a.dtype)
        out[:k] = a
        return out

    bmin_p = pad(bmin, np.float32(3e38)).reshape(k1, bps, 3)
    bmax_p = pad(bmax, np.float32(-3e38)).reshape(k1, bps, 3)
    bfirst_p = pad(bfirst, np.int32(0)).reshape(k1, bps)
    bcount_p = pad(bcount.astype(np.int32), np.int32(0)).reshape(k1, bps)

    pa = np.asarray(tris2.point_a)
    ab = np.asarray(tris2.ab)
    ac = np.asarray(tris2.ac)
    va = np.asarray(tris2.valid).astype(np.float32)

    # Baldwin-Weber precomputed-triangle rows (per-triangle, f64
    # precompute, global frame): the intersection becomes an affine form
    # evaluable as one MXU contraction per (ray tile, block) pair — see
    # _make_tile_kernel.
    #   n_hat : unit plane normal;   dist(X) = n_hat . X + d_n
    #   w_u   : barycentric-u gradient (w_u.ab = 1, w_u.ac = 0, w_u.n = 0)
    #   w_v   : barycentric-v gradient (symmetric)
    # The affine evaluation carries catastrophic cancellation at the scene
    # -coordinate scale (the precompute folds the `o - pa` subtraction
    # into the contraction, unlike Moller-Trumbore), so its absolute error
    # is O(ulp * scene extent) — covered by the margins in the kernel's
    # loose acceptance, with the exact Moller-Trumbore refine making the
    # final decision (see the tile-kernel header comment).
    pa64, ab64, ac64 = (pa.astype(np.float64), ab.astype(np.float64),
                        ac.astype(np.float64))
    n_vec = np.cross(ab64, ac64)
    n_sq = np.einsum("ij,ij->i", n_vec, n_vec)
    n_hat = n_vec / np.maximum(np.sqrt(np.maximum(n_sq, 1e-300)), 1e-150)[:, None]
    inv_nsq = 1.0 / np.maximum(n_sq, 1e-300)
    w_u = np.cross(ac64, n_vec) * inv_nsq[:, None]
    w_v = np.cross(n_vec, ab64) * inv_nsq[:, None]
    d_n = -np.einsum("ij,ij->i", n_hat, pa64)
    c_u = -np.einsum("ij,ij->i", w_u, pa64)
    c_v = -np.einsum("ij,ij->i", w_v, pa64)

    tb = np.zeros((padded, 16, lanes), np.float32)
    # The tile kernel's DMA unit: the (8, 3*lanes) Baldwin-Weber matmul
    # operand, pre-packed so the kernel contracts the block as-loaded —
    # rows 0-2 the three affine row-vectors per column group
    # [n_hat | w_u | w_v], row 3 their offsets [d_n | c_u | c_v], row 4
    # per-lane metadata (valid, slot, block center+diag), rows 5-7 zero.
    # Rows 4-7 may hold anything: the ray matrix has zeros in columns 4-7,
    # so they never reach the contraction.
    tw = np.zeros((padded, 8, 3 * lanes), np.float32)
    bf = bfirst_p.reshape(-1)
    bc = bcount_p.reshape(-1)
    for bi in range(padded):
        cnt = int(bc[bi])
        if cnt == 0:
            continue
        f0 = int(bf[bi])
        sl = slice(f0, f0 + cnt)
        tb[bi, 0:3, :cnt] = pa[sl].T
        tb[bi, 3:6, :cnt] = ab[sl].T
        tb[bi, 6:9, :cnt] = ac[sl].T
        tb[bi, 9, :cnt] = va[sl]
        # Row 10: per-lane global triangle slot id (f32 exact to 2^24) —
        # the banded kernel reads hit ids straight from the block instead
        # of fetching per-round `first` offsets.
        tb[bi, 10, :cnt] = np.arange(f0, f0 + cnt, dtype=np.float32)
        # Baldwin-Weber affine rows.
        tw[bi, 0:3, :cnt] = n_hat[sl].T
        tw[bi, 3, :cnt] = d_n[sl]
        tw[bi, 0:3, lanes:lanes + cnt] = w_u[sl].T
        tw[bi, 3, lanes:lanes + cnt] = c_u[sl]
        tw[bi, 0:3, 2 * lanes:2 * lanes + cnt] = w_v[sl].T
        tw[bi, 3, 2 * lanes:2 * lanes + cnt] = c_v[sl]
        tw[bi, 4, :cnt] = va[sl]
        tw[bi, 4, lanes:lanes + cnt] = np.arange(f0, f0 + cnt,
                                                 dtype=np.float32)
        # |ab x ac| per lane: the exact Moller-Trumbore det equals
        # (n_hat . d) * |n_vec|, so acceptance gates in the kernel must
        # compare |nd| * nlen (not bare |nd|) against EPSILON — bare-|nd|
        # gates silently drop exact hits on triangles with |n_vec| > 2
        # (advisor finding, round 4).
        tw[bi, 4, 2 * lanes:2 * lanes + cnt] = np.sqrt(
            np.maximum(n_sq[sl], 0.0)).astype(np.float32)

    packed = np.zeros((k1, 8, bps), np.float32)
    packed[:, 0:3] = np.moveaxis(bmin_p, 2, 1)
    packed[:, 3:6] = np.moveaxis(bmax_p, 2, 1)
    packed[:, 6] = bfirst_p.astype(np.float32)
    packed[:, 7] = bcount_p.astype(np.float32)

    n = pa.shape[0]
    attr = np.zeros((n, 32), np.float32)
    attr[:, 0:3] = pa
    attr[:, 3:6] = ab
    attr[:, 6:9] = ac
    attr[:, 9:12] = np.asarray(tris2.normal_a)
    attr[:, 12:15] = np.asarray(tris2.normal_b)
    attr[:, 15:18] = np.asarray(tris2.normal_c)
    attr[:, 18:20] = np.asarray(tris2.uv_a)
    attr[:, 20:22] = np.asarray(tris2.uv_b)
    attr[:, 22:24] = np.asarray(tris2.uv_c)
    attr[:, 24] = np.asarray(tris2.mat_id).astype(np.float32)

    grid = PallasGrid(
        super_lo=bmin_p.min(1).T.copy(),
        super_hi=bmax_p.max(1).T.copy(),
        blocks_packed=packed.reshape(k1, 8 * bps),
        tb=tb,
        tw=tw,
        tri_attr=attr,
        top_s=min(top_s, k1),
        top_m=min(top_m, k1 * bps),
        # Absolute t-margin covering the Baldwin-Weber evaluation error
        # (O(ulp) at scene-extent scale; ~8x slack over the 2-ulp bound).
        t_margin=float(max(1e-6, 2e-6 * float(
            np.linalg.norm(bmax.max(0) - bmin.min(0))))) if k else 1e-6,
    )
    return tris2, grid


# ---------------------------------------------------------------------------
# Candidate selection (XLA): per ST-ray subtile, the top_m nearest candidate
# blocks in entry order — same phases A/B as ops/block_bvh.py.
# ---------------------------------------------------------------------------

def _subtile_intervals(o, inv_d, nt, st=ST):
    """Per-axis per-bundle [min, max] of origin and reciprocal direction,
    each a (nt, 1) array; the ray-bundle intervals driving the conservative
    slab bounds.  `st` = rays per bundle (ST subtiles for the banded
    kernel, TILE for the MXU tile kernel).

    One explicit (B, 3) -> (3, B) transpose up front: per-axis strided
    column slices of a 3-wide-minor array each pay a full lane-relayout
    on TPU (the 3-element minor dim occupies 3 of 128 lanes), which
    round-5 profiling measured as the selection pass's hidden hot spot."""
    o_t = jnp.transpose(o)            # (3, B), rows contiguous
    i_t = jnp.transpose(inv_d)
    out = []
    for a in range(3):
        oa = o_t[a].reshape(nt, st)
        ia = i_t[a].reshape(nt, st)
        out.append((jnp.min(oa, 1)[:, None], jnp.max(oa, 1)[:, None],
                    jnp.min(ia, 1)[:, None], jnp.max(ia, 1)[:, None]))
    return out


def _interval_entry_lb(ivals, lo_hi, with_ub=False):
    """Conservative per-subtile lower bound of min-over-rays slab entry,
    with a *sound* certain-miss filter (optionally also the conservative
    exit upper bound, used to prove a super exhausted during refill).

    Interval arithmetic over the subtile's ray bundle: with per-axis
    o in [o0, o1] and 1/d in [i0, i1] across the ST rays, each slab time
    (bound - o) * ix lies between the min and max of the four corner
    products.  Then

      LB(entry)  = max_axis( LB_axis(min(t0, t1)) )  <=  every ray's tnear
      UB(exit)   = min_axis( UB_axis(max(t0, t1)) )  >=  every ray's tfar

    so UB(exit) < max(LB(entry), 0) proves *every* ray misses the box and
    the candidate is dropped outright.  Because LB <= the true entry of
    every ray, ordering + early-exit on LB keep the walk exact; looseness
    only costs extra visits.

    ivals: per-axis (o0, o1, i0, i1) each (nt, 1); lo_hi: per-axis
    (lo, hi) each (nt, NC).  Everything stays in (nt, NC) lane-major
    layout — no trailing-3 dims, no transposes."""
    lb = None
    ub_far = None
    for a in range(3):
        o0, o1, i0, i1 = ivals[a]
        lo, hi = lo_hi[a]

        def corners(bound):
            a0 = bound - o1
            a1 = bound - o0
            p00, p01 = a0 * i0, a0 * i1
            p10, p11 = a1 * i0, a1 * i1
            return (jnp.minimum(jnp.minimum(p00, p01),
                                jnp.minimum(p10, p11)),
                    jnp.maximum(jnp.maximum(p00, p01),
                                jnp.maximum(p10, p11)))

        lo_min, lo_max = corners(lo)
        hi_min, hi_max = corners(hi)
        near = jnp.minimum(lo_min, hi_min)
        far = jnp.maximum(lo_max, hi_max)
        lb = near if lb is None else jnp.maximum(lb, near)
        ub_far = far if ub_far is None else jnp.minimum(ub_far, far)
    # NOTE: lb is deliberately NOT clamped at 0: the raw (possibly
    # negative) value stays a valid lower bound, and keeping boxes that
    # contain the ray origins *distinct* (instead of all tying at 0)
    # lets the windowed refill in `traverse` make progress by value.
    certain_miss = (ub_far < jnp.maximum(lb, 0.0)) | (ub_far < 0.0)
    if with_ub:
        return jnp.where(certain_miss, jnp.inf, lb), ub_far
    return jnp.where(certain_miss, jnp.inf, lb)


def _candidates(grid: PallasGrid, o, d, cap=None, floor=None, st=ST,
                top_s=None, top_m=None):
    """One *window* of candidate blocks per `st`-ray bundle (two-level:
    super culling then per-block bounds).

    Returns (cand_gid, cand_first, cand_entry, cut): the top_m candidate
    blocks in ascending conservative-entry order (entry RAY_LENGTH_MAX on
    non-candidates), plus the per-subtile window cutoff `cut` — every
    block with entry lower bound in [floor, cut) is in this window, so a
    subtile is fully resolved once cut clears its worst current hit.
    `cap` (worst t_init; blocks at or beyond it cannot matter) prunes
    shadow segments outright; `floor` (previous window's cut) excludes
    already-visited blocks — sound only while the subtile's ray membership
    is FIXED across windows, which `traverse`'s refill guarantees by
    duplicating each unresolved ray into its own subtile.  Together the
    windows give the reference's unbudgeted stack-walk semantics
    (BVH.hpp:327-384) in fixed-shape passes.
    """
    b = o.shape[0]
    nt = b // st
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                            jnp.where(d < 0, -1e-30, 1e-30), d)
    ivals = _subtile_intervals(o, inv_d, nt, st)

    # Phase A: conservative per-subtile super entries via the same interval
    # bounds (16x less work than per-ray slab + reduce).
    sup_lo_hi = [(grid.super_lo[a][None, :], grid.super_hi[a][None, :])
                 for a in range(3)]
    e_super_t, ub_super = _interval_entry_lb(ivals, sup_lo_hi, with_ub=True)
    if cap is not None:
        e_super_t = jnp.where(e_super_t >= cap[:, None], jnp.inf, e_super_t)
    if floor is not None:
        # A super whose conservative exit bound is below the floor cannot
        # hold any block with lb >= floor: it is fully covered by earlier
        # windows, so free its phase-A slot for farther supers (without
        # this, rays crossing > top_s supers would stall at sup_cut).
        e_super_t = jnp.where(ub_super < floor[:, None], jnp.inf, e_super_t)
    s = min(top_s if top_s is not None else grid.top_s, grid.num_supers)
    neg_s, sup_ids = jax.lax.top_k(-e_super_t, s)
    e_sel = -neg_s
    sup_ok = jnp.isfinite(e_sel)
    # Supers beyond the selection have entry >= sup_cut: blocks inside them
    # are covered by later windows.
    sup_cut = jnp.where(jnp.all(sup_ok, axis=1), -neg_s[:, -1], jnp.inf)

    # Phase B: one large-row gather of the selected supers' packed block
    # metadata (component-grouped — slices stay lane-major), conservative
    # tile-interval bounds, one top-k.  (A bf16 copy of the packed rows
    # was tried in round 5 and measured ~5% SLOWER: the 256-byte bf16 rows
    # sit below HBM transaction granularity, so the half-width gather
    # saves no transactions while the upcasts add VPU work.)
    bps = grid.bps
    nc = s * bps
    gb = grid.blocks_packed[sup_ids]                  # (nt, s, 8*BPS)
    f = lambda i: grid.packed_field(gb, i)            # (nt, nc) each
    lo_hi = [(f(0), f(3)), (f(1), f(4)), (f(2), f(5))]
    cb_first = f(6).astype(jnp.int32)
    cb_count = f(7)

    lb = _interval_entry_lb(ivals, lo_hi)                          # (nt, nc)
    # max with the containing super's entry: makes lb monotone w.r.t. the
    # super ordering, which the `cut` soundness argument needs (a block's
    # own interval LB is not provably >= its super's).
    lb = jnp.maximum(lb, jnp.repeat(e_sel, bps, 1))
    cand_ok = (cb_count > 0) & jnp.repeat(sup_ok, bps, 1)
    lb = jnp.where(cand_ok, lb, jnp.inf)
    if cap is not None:
        lb = jnp.where(lb >= cap[:, None], jnp.inf, lb)
    if floor is not None:
        # Strict: blocks with lb == floor re-enter (window boundaries may
        # split ties); duplicates only re-confirm t_best.
        lb = jnp.where(lb < floor[:, None], jnp.inf, lb)

    m = min(top_m if top_m is not None else grid.top_m, nc)
    neg_lb, cand = jax.lax.top_k(-lb, m)                           # (nt, m)
    cand_entry = -neg_lb
    window_full = jnp.isfinite(cand_entry[:, -1])
    cut = jnp.minimum(jnp.where(window_full, cand_entry[:, -1], jnp.inf),
                      sup_cut)
    cand_first = jnp.take_along_axis(cb_first, cand, 1)
    gids = (sup_ids[:, :, None] * bps
            + jnp.arange(bps, dtype=jnp.int32)[None, None, :])
    cand_gid = jnp.take_along_axis(gids.reshape(nt, nc), cand, 1)
    # Clamp padding-candidate ids so the kernel's DMA source stays in
    # bounds (their entry is +inf, so the walk never reaches them; valid=0
    # masks them if it does).
    nb = grid.tb.shape[0]
    cand_gid = jnp.clip(cand_gid, 0, nb - 1)
    return (cand_gid, cand_first,
            jnp.where(jnp.isfinite(cand_entry), cand_entry, _BIG),
            jnp.where(jnp.isfinite(cut), cut, _BIG))


# ---------------------------------------------------------------------------
# The Pallas kernel.
# ---------------------------------------------------------------------------

_PIPE = 4  # outstanding block-DMA rounds; hides HBM latency behind compute


def _pipe_depth(m: int, any_hit: bool) -> int:
    """DMA pipeline depth: any-hit walks average ~3.6 lockstep rounds on
    shadow batches, so a 4-deep pipeline mostly issues DMAs that are then
    drained unused after the early exit — 2 is the measured sweet spot;
    closest walks run longer and keep the full depth."""
    return min(2 if any_hit else _PIPE, m)


def _make_kernel(m: int, any_hit: bool):
    """Banded lockstep traversal: the program's GROUP subtiles advance
    through their candidate lists in shared rounds — round r intersects
    every live band's r-th candidate block as ONE dense
    (GROUP, ST, LANES) Moller-Trumbore op (16 VREGs per op, saturating the
    VPU), with GROUP block DMAs per round pipelined _PIPE rounds deep.  A
    band drops out when its next candidate's conservative entry exceeds its
    worst current hit (the reference's near-first early-out,
    BVH.hpp:327-384, vectorized across bands); the loop ends when every
    band is done.  Sequential per-subtile walks wasted ~70% of the VPU on
    (ST, LANES)-sized ops and scalar control — the banded walk trades a few
    masked extra visits (lockstep skew) for 8x wider compute."""
    depth = _pipe_depth(m, any_hit)
    nslots = depth + 1

    def kernel(gid_ref, entry_ref, rays_ref, tb_ref,
               t_out, id_out, steps_out, scratch, sem):
        g_n = GROUP
        rays = rays_ref[:]                                  # (G*ST, 8)

        def comp(c):
            return rays[:, c:c + 1].reshape(g_n, ST, 1)

        ox, oy, oz = comp(0), comp(1), comp(2)
        dx, dy, dz = comp(3), comp(4), comp(5)
        t_init = comp(6)                                    # (G, ST, 1)
        prev = comp(7)

        def start(r):
            sl = jax.lax.rem(r, nslots)
            for g in range(g_n):
                pltpu.make_async_copy(
                    tb_ref.at[gid_ref[0, 0, g * m + r]],
                    scratch.at[sl, g], sem.at[sl, g]).start()

        for j in range(depth):
            start(jnp.int32(j))

        def all_done(r, t_best):
            """Scalar: no band's next candidate (round r+1) can still beat
            its worst current hit — visits past this point are provably
            useless (entries ascend, t_worst only shrinks), the banded form
            of the reference's near-first early-out (BVH.hpp:327-384).
            Dead bands keep lockstep-visiting until every band is done;
            their extra masked visits only re-confirm t_best (exactness
            never depends on the exit test)."""
            done = None
            nxt_idx = jnp.minimum(r + 1, m - 1)
            past = r + 1 >= m
            for g in range(g_n):
                tw_g = jnp.max(t_best[g])
                dead_g = past | (entry_ref[0, 0, g * m + nxt_idx] >= tw_g)
                if any_hit:
                    # Band fully occluded: every ray found a blocker.
                    not_occ = jnp.max(
                        jnp.where(t_best[g] < t_init[g], 0.0, 1.0))
                    dead_g = dead_g | (not_occ < 0.5)
                done = dead_g if done is None else (done & dead_g)
            return done

        def cond(carry):
            r, t_best, slot_best, alive = carry
            return alive

        def body(carry):
            r, t_best, slot_best, alive = carry
            sl = jax.lax.rem(r, nslots)
            for g in range(g_n):
                pltpu.make_async_copy(
                    tb_ref.at[gid_ref[0, 0, g * m + r]],
                    scratch.at[sl, g], sem.at[sl, g]).wait()

            @pl.when(r + depth < m)
            def _():
                start(r + depth)

            tr = scratch[sl]                                # (G, 16, LANES)
            pax, pay, paz = tr[:, 0:1, :], tr[:, 1:2, :], tr[:, 2:3, :]
            abx, aby, abz = tr[:, 3:4, :], tr[:, 4:5, :], tr[:, 5:6, :]
            acx, acy, acz = tr[:, 6:7, :], tr[:, 7:8, :], tr[:, 8:9, :]
            tvalid = tr[:, 9:10, :] > 0.5
            slot = tr[:, 10:11, :]                          # (G, 1, LANES)

            # Dense banded Moller-Trumbore (Triangle.cpp:63-109 acceptance).
            px = dy * acz - dz * acy
            py = dz * acx - dx * acz
            pz = dx * acy - dy * acx
            det = abx * px + aby * py + abz * pz
            inv = 1.0 / jnp.where(jnp.abs(det) < C.EPSILON, 1.0, det)
            tvx, tvy, tvz = ox - pax, oy - pay, oz - paz
            u = inv * (tvx * px + tvy * py + tvz * pz)
            qx = tvy * abz - tvz * aby
            qy = tvz * abx - tvx * abz
            qz = tvx * aby - tvy * abx
            v = inv * (dx * qx + dy * qy + dz * qz)
            t = inv * (acx * qx + acy * qy + acz * qz)

            ok = ((jnp.abs(det) >= C.EPSILON) & (u >= 0.0) & (u <= 1.0)
                  & (v >= 0.0) & (u + v <= 1.0) & (t >= C.EPSILON)
                  & tvalid & (slot != prev))
            t = jnp.where(ok & (t < t_best), t, _BIG)
            tmin = jnp.min(t, axis=2, keepdims=True)        # (G, ST, 1)
            smin = jnp.min(jnp.where(t <= tmin,
                                     jnp.broadcast_to(slot, t.shape), _BIG),
                           axis=2, keepdims=True)
            closer = tmin < t_best
            t_best = jnp.where(closer, tmin, t_best)
            slot_best = jnp.where(closer, smin, slot_best)

            return (r + 1, t_best, slot_best, ~all_done(r, t_best))

        init = (jnp.int32(0), t_init,
                jnp.full((g_n, ST, 1), -1.0, jnp.float32),
                ~all_done(jnp.int32(-1), t_init))
        r_fin, t_best, slot_best, _ = jax.lax.while_loop(cond, body, init)

        # Drain in-flight DMAs: rounds r_fin .. min(m, r_fin+depth)-1 were
        # started but not waited.
        for j in range(depth):
            @pl.when(r_fin + j < m)
            def _(j=j):
                sl = jax.lax.rem(r_fin + j, nslots)
                for g in range(g_n):
                    pltpu.make_async_copy(
                        tb_ref.at[gid_ref[0, 0, g * m + r_fin + j]],
                        scratch.at[sl, g], sem.at[sl, g]).wait()

        t_out[:] = t_best.reshape(g_n * ST, 1)
        id_out[:] = slot_best.reshape(g_n * ST, 1)
        steps_out[:] = jnp.full((g_n * ST, 1), 1.0) * r_fin.astype(
            jnp.float32)
    return kernel


@functools.partial(jax.jit, static_argnames=("m", "any_hit", "interpret"))
def _traverse_padded(tb, cand_gid, cand_entry, rays,
                     m: int, any_hit: bool, interpret: bool):
    """rays: (Bp, 8) with Bp a multiple of GROUP*ST.  Returns (t, slot_f32)
    each (Bp, 1)."""
    bp = rays.shape[0]
    n_groups = bp // (GROUP * ST)
    grid = (n_groups,)
    kernel = _make_kernel(m, any_hit)
    t, sid, steps = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # (n_groups, 1, GROUP*m): the last two dims of each block equal
            # the array dims, as the Mosaic SMEM block rule requires.
            pl.BlockSpec((1, 1, GROUP * m), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, GROUP * m), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((GROUP * ST, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((GROUP * ST, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP * ST, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP * ST, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_pipe_depth(m, any_hit) + 1, GROUP) + tb.shape[1:],
                       jnp.float32),
            pltpu.SemaphoreType.DMA((_pipe_depth(m, any_hit) + 1, GROUP)),
        ],
        # Ray groups are independent: let Mosaic split the grid across both
        # megacore TensorCores.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(cand_gid.reshape(n_groups, 1, GROUP * m),
      cand_entry.reshape(n_groups, 1, GROUP * m),
      rays, tb)
    return t, sid, steps


def _banded_balanced(grid, cg, ce, rays_in, m, any_hit, interp):
    """Runs the banded kernel with subtiles sorted by candidate count: the
    8 lockstep bands of each program get near-equal walks, so rounds per
    program drop from the max-band count to ~the mean (measured 13 -> ~6 on
    NEE shadow batches).  Outputs are scattered back to the caller's
    subtile order."""
    ntk = cg.shape[0]
    counts = jnp.sum(ce < _BIG * 0.5, axis=1)
    order = jnp.argsort(counts)
    lanes_p = (order[:, None] * ST
               + jnp.arange(ST, dtype=jnp.int32)[None, :]).reshape(-1)
    tp, sp, stp = _traverse_padded(grid.tb, cg[order], ce[order],
                                   rays_in[lanes_p], m, any_hit, interp)
    t_out = jnp.zeros((ntk * ST,), jnp.float32).at[lanes_p].set(tp[:, 0])
    s_out = jnp.zeros((ntk * ST,), jnp.float32).at[lanes_p].set(sp[:, 0])
    st_out = jnp.zeros((ntk * ST,), jnp.float32).at[lanes_p].set(stp[:, 0])
    return t_out, s_out, st_out


def _refill_exact(grid, tris, rays, t, sid, floor_r, any_hit, interp, bp):
    """Per-ray exact windowed refill (shared by all traversal variants).
    Rays with floor_r < t are unresolved: they are gathered and DUPLICATED
    ST-fold so each occupies a whole subtile — the interval hull of ST
    identical rays collapses to the ray's exact slab bounds, making the
    next window both tight (candidates = blocks the ray truly crosses) and
    sound to floor-window per ray (fixed membership).

    Exactness is UNCONDITIONAL: rays that outlast the windowed loop's
    iteration budget or stall on bit-identical entry ties (both arise only
    on adversarial geometry — a 120k-triangle uniform-random soup was the
    round-5 reproducer; real scenes resolve in < 10 iterations) fall
    through to a brute-force dense scan over the live triangle table —
    the naive oracle itself — so the traversal can never silently return
    a non-oracle answer.  Returns (t, sid)."""
    m = min(grid.top_m, min(grid.top_s, grid.num_supers) * grid.bps)
    nr = max(GROUP, min(2048, bp // ST // 4))
    rrange = jnp.arange(bp, dtype=jnp.int32)

    def gather_unresolved(t, floor_r):
        unres = floor_r < t
        pos = jnp.cumsum(unres) - 1
        sel = unres & (pos < nr)
        ridx = jnp.zeros((nr,), jnp.int32).at[
            jnp.where(sel, pos, nr)].set(rrange, mode="drop")
        return ridx

    def refill_cond(carry):
        it, t, sid, floor_r, stall = carry
        return (it < 256) & (stall < 4) & jnp.any(floor_r < t)

    def refill_body(carry):
        it, t, sid, floor_r, stall = carry
        unres = floor_r < t
        ridx = gather_unresolved(t, floor_r)
        lanes = jnp.repeat(ridx, ST)                     # (nr*ST,)
        rays_c = rays[lanes].at[:, 6].set(t[lanes])
        cg, cf, ce, cut2 = _candidates(grid, rays_c[:, 0:3],
                                       rays_c[:, 3:6], cap=t[ridx],
                                       floor=floor_r[ridx])
        t2, s2, _ = _banded_balanced(grid, cg, ce, rays_c, m, any_hit,
                                     interp)
        t2 = t2.reshape(nr, ST)[:, 0]                    # (nr,) per ray
        s2 = s2.reshape(nr, ST)[:, 0]
        better = t2 < t[ridx]
        t_new = jnp.where(better, t2, t[ridx])
        t = t.at[ridx].set(t_new)
        sid = sid.at[ridx].set(jnp.where(better, s2, sid[ridx]))
        floor_r = floor_r.at[ridx].set(jnp.maximum(floor_r[ridx], cut2))
        n_unres = jnp.sum(floor_r < t)
        stall = jnp.where(n_unres < jnp.sum(unres), 0, stall + 1)
        return (it + 1, t, sid, floor_r, stall)

    _, t, sid, floor_r, _ = jax.lax.while_loop(
        refill_cond, refill_body,
        (jnp.int32(0), t, sid, floor_r, jnp.int32(0)))

    # Dense backstop: chunks of `nr` rays through the naive oracle until
    # nothing is unresolved (compiled once; skipped entirely at trace
    # level never, at runtime almost always zero-trip).
    def dense_cond(carry):
        t, sid, floor_r = carry
        return jnp.any(floor_r < t)

    def dense_body(carry):
        t, sid, floor_r = carry
        ridx = gather_unresolved(t, floor_r)
        o_g = rays[ridx, 0:3]
        d_g = rays[ridx, 3:6]
        prev_f = rays[ridx, 7]
        pk_g = jnp.where(prev_f >= 0, C.PRIM_TRIANGLE, C.PRIM_NONE)
        pi_g = prev_f.astype(jnp.int32)
        td, idd = nv.closest_triangles(tris, o_g, d_g, t[ridx], pk_g, pi_g)
        better = idd >= 0
        t = t.at[ridx].set(jnp.where(better, td, t[ridx]))
        sid = sid.at[ridx].set(jnp.where(better, idd.astype(jnp.float32),
                                         sid[ridx]))
        floor_r = floor_r.at[ridx].set(_BIG)
        return (t, sid, floor_r)

    t, sid, _ = jax.lax.while_loop(dense_cond, dense_body,
                                   (t, sid, floor_r))
    return t, sid


def _pack_rays(o, d, t0, prev_kind, prev_id, unit):
    """(B, 8) ray rows [o, d, t_init, prev_triangle_slot] padded to a
    `unit` multiple with inert +x filler rays (t_init 0)."""
    b = o.shape[0]
    guard = prev_kind == C.PRIM_TRIANGLE
    prev_f = jnp.where(guard, prev_id, -1).astype(jnp.float32)
    rays = jnp.concatenate(
        [o, d, t0[:, None], prev_f[:, None]], axis=1)        # (B, 8)
    bp = -(-b // unit) * unit
    if bp - b:
        filler = jnp.zeros((bp - b, 8), jnp.float32).at[:, 3].set(1.0)
        rays = jnp.concatenate([rays, filler], 0)
    return rays, bp


def traverse(grid: PallasGrid, tris: Triangles, o, d, t_init, prev_kind,
             prev_id, any_hit: bool = False, with_steps: bool = False,
             sel_st: int = None, top_s: int = None, top_m: int = None):
    """Closest-hit (or any-hit) over the triangle set via the banded
    subtile kernel.  Returns (t_best (B,), best_id (B,) int32 with -1 for
    miss)[, steps (B,)].

    `sel_st` sets the candidate-SELECTION bundle width (default ST): a
    coarser width (32/64) computes windows over fewer, larger hulls and
    repeats them onto the kernel's ST-ray subtiles — sound because the
    coarser hull's entry bounds lower-bound every contained ray's, and
    profitable when the hulls stay tight (reversed shared-light shadow
    bundles have a point origin, so doubling the bundle barely widens the
    cone while halving the phase-A/B selection cost).  `top_s`/`top_m`
    override the window depths (shadow cones need far shallower windows
    than closest walks — measured mean 4 candidates/subtile on
    conference)."""
    b = o.shape[0]
    # Host-numpy tables must become device arrays before the refill
    # while_loop traces over them.
    grid = jax.tree.map(jnp.asarray, grid)
    t0 = jnp.broadcast_to(jnp.asarray(t_init, jnp.float32), (b,))
    rays, bp = _pack_rays(o, d, t0, prev_kind, prev_id, GROUP * ST)

    op, dp = rays[:, 0:3], rays[:, 3:6]
    sst = sel_st or ST
    assert (GROUP * ST) % sst == 0 and sst % ST == 0
    nt0 = rays.shape[0] // sst
    # Cap window 1 at each subtile's worst t_init: for shadow segments this
    # drops every block beyond the light outright (and resolves the subtile
    # in one window far more often).
    cap0 = jnp.max(rays[:, 6].reshape(nt0, sst), axis=1)
    cand_gid, cand_first, cand_entry, cut = _candidates(
        grid, op, dp, cap=cap0, st=sst, top_s=top_s, top_m=top_m)
    if sst != ST:
        rep = sst // ST
        cand_gid = jnp.repeat(cand_gid, rep, 0)
        cand_entry = jnp.repeat(cand_entry, rep, 0)
        cut = jnp.repeat(cut, rep, 0)
    m = cand_gid.shape[1]
    interp = _interpret()

    t, sid, steps = _banded_balanced(grid, cand_gid, cand_entry, rays, m,
                                     any_hit, interp)

    # Per-ray resolution (soundness): window 1 listed EVERY block whose
    # conservative entry bound is below `cut`, so a ray whose current best
    # t is <= its subtile's cutoff provably cannot be improved by any
    # unlisted block — exact without any visit budget, the reference's
    # unbudgeted stack-walk contract (BVH.hpp:327-384).  floor_r records,
    # per ray, the entry bound below which every block has been visited.
    floor_r = jnp.repeat(cut, ST)
    floor_r = jnp.where(jnp.arange(bp) >= b, _BIG, floor_r)  # filler lanes
    if any_hit:
        # Any blocker settles an occlusion query: rays with a hit below
        # their cap are RESOLVED regardless of the window cutoff (without
        # this, occluded rays whose cut undershoots the blocker distance
        # re-walk through the refill hunting for a closer hit nobody
        # needs; small measured effect on conference — most blockers sit
        # inside the first window's cut — but strictly less work).
        floor_r = jnp.where(t < rays[:, 6], _BIG, floor_r)

    # Banded batches may be incoherent (the compacted walker tail): full
    # windows with near-zero cuts leave most rays unresolved there, so the
    # per-ray windowed refill (cheap, tight per-ray windows) does the bulk
    # of what window 1 left unresolved.
    t, sid = _refill_exact(grid, tris, rays, t, sid, floor_r, any_hit,
                           interp, bp)

    t = t[:b]
    sid = sid[:b]
    hit = t < t0
    out = (jnp.where(hit, t, _BIG), jnp.where(hit, sid.astype(jnp.int32), -1))
    if with_steps:
        return out + (steps[:b],)
    return out


# ---------------------------------------------------------------------------
# Resident-table any-hit traversal.
#
# The banded kernel above issues GROUP=8 HBM DMA descriptors per lockstep
# round; on conference shadow batches the walks are so short (mean 3.6
# rounds/program) that descriptor issue + drain dominates the kernel
# (~3.1 us/round measured, vs ~0.6 us of VPU Moller-Trumbore).  For
# ANY-HIT queries — occlusion needs no near-to-far ordering — this
# variant removes the per-round DMAs entirely: the packed triangle-block
# table is split into VMEM-sized partitions; the grid is (P, n_programs)
# with the partition as the OUTER (sequential) dimension, so Mosaic's
# pipeline fetches each partition's (NBP, 16, LANES) table slab into VMEM
# once and keeps it resident for all programs; each band reads its next
# block with a dynamic VMEM index (a register-speed load, no descriptor).
# Each band's candidate list is pre-sorted by block id so partition p's
# entries form one contiguous run ([starts[g,p], starts[g,p+1])); per-
# partition results combine by min (any-hit is order-free).  Windows,
# cutoffs and the exact refill are unchanged, so the exactness contract
# is exactly the banded kernel's.
# ---------------------------------------------------------------------------

NBP = 640          # table rows per resident partition (640 x 8 KB = 5 MB)


def _make_resident_kernel(m: int, n_parts: int, g_n: int):
    npp = n_parts + 1

    def kernel(starts_ref, gl_ref, rays_ref, tb_ref, t_out, id_out):
        p = pl.program_id(0)
        rays = rays_ref[:]                                  # (G*ST, 8)

        def comp(c):
            return rays[:, c:c + 1].reshape(g_n, ST, 1)

        ox, oy, oz = comp(0), comp(1), comp(2)
        dx, dy, dz = comp(3), comp(4), comp(5)
        t_init = comp(6)
        prev = comp(7)

        s0 = [starts_ref[0, 0, g * npp + p] for g in range(g_n)]
        s1 = [starts_ref[0, 0, g * npp + p + 1] for g in range(g_n)]
        base = jnp.int32(p) * jnp.int32(NBP)

        def n_alive(r, t_best):
            """Band g still has work at round r if it has entries left and
            any of its rays is still unoccluded."""
            done = None
            for g in range(g_n):
                has = s0[g] + r < s1[g]
                not_occ = jnp.max(
                    jnp.where(t_best[g] < t_init[g], 0.0, 1.0)) > 0.5
                live_g = has & not_occ
                done = live_g if done is None else (done | live_g)
            return done

        def cond(carry):
            return carry[-1]

        def body(carry):
            r, t_best, slot_best, alive = carry
            trs = []
            for g in range(g_n):
                # Clamp into the band's run: exhausted bands re-test their
                # last block (idempotent — min over identical hits).
                idx = jnp.clip(s0[g] + r, s0[g], jnp.maximum(s1[g] - 1,
                                                             s0[g]))
                lid = jnp.clip(gl_ref[0, 0, g * m + idx] - base, 0,
                               jnp.int32(NBP - 1))
                trs.append(tb_ref[pl.ds(lid, 1)])           # (1, 16, LANES)
            tr = jnp.concatenate(trs, axis=0)               # (G, 16, LANES)
            pax, pay, paz = tr[:, 0:1, :], tr[:, 1:2, :], tr[:, 2:3, :]
            abx, aby, abz = tr[:, 3:4, :], tr[:, 4:5, :], tr[:, 5:6, :]
            acx, acy, acz = tr[:, 6:7, :], tr[:, 7:8, :], tr[:, 8:9, :]
            tvalid = tr[:, 9:10, :] > 0.5
            slot = tr[:, 10:11, :]

            px = dy * acz - dz * acy
            py = dz * acx - dx * acz
            pz = dx * acy - dy * acx
            det = abx * px + aby * py + abz * pz
            inv = 1.0 / jnp.where(jnp.abs(det) < C.EPSILON, 1.0, det)
            tvx, tvy, tvz = ox - pax, oy - pay, oz - paz
            u = inv * (tvx * px + tvy * py + tvz * pz)
            qx = tvy * abz - tvz * aby
            qy = tvz * abx - tvx * abz
            qz = tvx * aby - tvy * abx
            v = inv * (dx * qx + dy * qy + dz * qz)
            t = inv * (acx * qx + acy * qy + acz * qz)

            ok = ((jnp.abs(det) >= C.EPSILON) & (u >= 0.0) & (u <= 1.0)
                  & (v >= 0.0) & (u + v <= 1.0) & (t >= C.EPSILON)
                  & tvalid & (slot != prev))
            t = jnp.where(ok & (t < t_best), t, _BIG)
            tmin = jnp.min(t, axis=2, keepdims=True)
            smin = jnp.min(jnp.where(t <= tmin,
                                     jnp.broadcast_to(slot, t.shape), _BIG),
                           axis=2, keepdims=True)
            closer = tmin < t_best
            t_best = jnp.where(closer, tmin, t_best)
            slot_best = jnp.where(closer, smin, slot_best)
            return (r + 1, t_best, slot_best, n_alive(r + 1, t_best))

        init = (jnp.int32(0), t_init,
                jnp.full((g_n, ST, 1), -1.0, jnp.float32),
                n_alive(jnp.int32(0), t_init))
        _, t_best, slot_best, _ = jax.lax.while_loop(cond, body, init)

        t_out[:] = t_best.reshape(1, g_n * ST, 1)
        id_out[:] = slot_best.reshape(1, g_n * ST, 1)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("m", "n_parts", "interpret", "g_n"))
def _traverse_resident_padded(tb, starts, glist, rays, m: int,
                              n_parts: int, interpret: bool,
                              g_n: int = GROUP):
    """rays: (Bp, 8).  starts: (n_groups, GROUP*(P+1)) i32 run boundaries;
    glist: (n_groups, GROUP*m) i32 gid-sorted candidate ids.  Returns
    per-partition (P, Bp, 1) t / slot arrays (combine by min outside)."""
    bp = rays.shape[0]
    n_groups = bp // (g_n * ST)
    kernel = _make_resident_kernel(m, n_parts, g_n)
    t, sid = pl.pallas_call(
        kernel,
        grid=(n_parts, n_groups),
        in_specs=[
            pl.BlockSpec((1, 1, g_n * (n_parts + 1)),
                         lambda p, i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, g_n * m), lambda p, i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g_n * ST, 8), lambda p, i: (i, 0),
                         memory_space=pltpu.VMEM),
            # The resident partition slab: index depends only on p (the
            # outer, sequential grid dim), so Mosaic fetches it once per
            # partition and keeps it in VMEM across all programs.
            pl.BlockSpec((NBP,) + tb.shape[1:], lambda p, i: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, g_n * ST, 1), lambda p, i: (p, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_n * ST, 1), lambda p, i: (p, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_parts, bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_parts, bp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel")),
        interpret=interpret,
    )(starts, glist, rays, tb)
    return t, sid


def traverse_resident(grid: PallasGrid, tris: Triangles, o, d, t_init,
                      prev_kind, prev_id, any_hit: bool = True,
                      sel_st: int = None, top_s: int = None,
                      top_m: int = None, res_group: int = GROUP):
    """Any-hit traversal via the resident-table kernel (same contract as
    `traverse(any_hit=True)`); closest-hit queries fall back to the banded
    kernel (they need the entry-ordered early exit)."""
    if not any_hit:
        return traverse(grid, tris, o, d, t_init, prev_kind, prev_id,
                        any_hit=False, sel_st=sel_st, top_s=top_s,
                        top_m=top_m)
    b = o.shape[0]
    grid = jax.tree.map(jnp.asarray, grid)
    t0 = jnp.broadcast_to(jnp.asarray(t_init, jnp.float32), (b,))
    rays, bp = _pack_rays(o, d, t0, prev_kind, prev_id, res_group * ST)

    op, dp = rays[:, 0:3], rays[:, 3:6]
    sst = sel_st or ST
    nt0 = rays.shape[0] // sst
    cap0 = jnp.max(rays[:, 6].reshape(nt0, sst), axis=1)
    cand_gid, _, cand_entry, cut = _candidates(
        grid, op, dp, cap=cap0, st=sst, top_s=top_s, top_m=top_m)
    if sst != ST:
        rep = sst // ST
        cand_gid = jnp.repeat(cand_gid, rep, 0)
        cand_entry = jnp.repeat(cand_entry, rep, 0)
        cut = jnp.repeat(cut, rep, 0)
    m = cand_gid.shape[1]
    interp = _interpret()

    # Per-band gid sort; invalid entries (entry == BIG) sort last.
    nb = grid.tb.shape[0]
    n_parts = -(-nb // NBP)
    nb_pad = n_parts * NBP
    gid_key = jnp.where(cand_entry < _BIG * 0.5, cand_gid, nb_pad + 1)
    order = jnp.argsort(gid_key, axis=1)
    glist = jnp.take_along_axis(cand_gid, order, 1).astype(jnp.int32)
    gsort = jnp.take_along_axis(gid_key, order, 1)
    # Run boundaries per partition: starts[:, p] = #entries with
    # gid < p*NBP (valid entries only).
    bounds = jnp.arange(n_parts + 1, dtype=jnp.int32) * NBP
    starts = jnp.sum(gsort[:, :, None] < bounds[None, None, :],
                     axis=1).astype(jnp.int32)                # (nt, P+1)
    # cap the last boundary at the valid count
    nvalid = jnp.sum(cand_entry < _BIG * 0.5, axis=1).astype(jnp.int32)
    starts = jnp.minimum(starts, nvalid[:, None])

    ntk = glist.shape[0]
    n_groups = ntk // res_group
    tb_pad = grid.tb
    if nb_pad != nb:
        tb_pad = jnp.concatenate(
            [grid.tb, jnp.zeros((nb_pad - nb,) + grid.tb.shape[1:],
                                jnp.float32)], 0)
    tp, sp = _traverse_resident_padded(
        tb_pad, starts.reshape(n_groups, 1, res_group * (n_parts + 1)),
        glist.reshape(n_groups, 1, res_group * m), rays, m, n_parts,
        interp, g_n=res_group)
    t = jnp.min(tp[:, :, 0], axis=0)
    sid = jnp.min(jnp.where(tp[:, :, 0] <= t[None, :], sp[:, :, 0], _BIG),
                  axis=0)
    sid = jnp.where(t < _BIG * 0.5, sid, -1.0)

    floor_r = jnp.repeat(cut, ST)
    floor_r = jnp.where(jnp.arange(bp) >= b, _BIG, floor_r)
    # Occluded rays are resolved regardless of the window cutoff.
    floor_r = jnp.where(t < rays[:, 6], _BIG, floor_r)
    t, sid = _refill_exact(grid, tris, rays, t, sid, floor_r, True, interp,
                           bp)
    t = t[:b]
    sid = sid[:b]
    hit = t < t0
    return (jnp.where(hit, t, _BIG), jnp.where(hit, sid.astype(jnp.int32), -1))


# ---------------------------------------------------------------------------
# MXU tile traversal: Baldwin-Weber contraction kernel.
#
# The banded kernel above keeps the hot loop on the VPU (a dense
# Moller-Trumbore per 16-ray subtile band) and pays 8 block DMAs + 8
# scalar exit tests per round.  This kernel restructures the walk at
# 128-ray TILE granularity so each round is ONE block DMA plus ONE MXU
# contraction: with per-triangle Baldwin-Weber rows [n_hat|d_n],
# [w_u|c_u], [w_v|c_v] (precomputed in build_blocks in the GLOBAL frame,
# f64 — so the affine evaluation's cancellation error is O(ulp x scene
# extent), which is exactly what the global t_margin covers),
# the six per-pair dot products {o,d}x{n,u,v} come out of a single
# (2*TILE, 8) x (8, 3*LANES) matmul, and the VPU epilogue is ~15 ops:
#     t = -(n.o' + d_n) / (n.d);  u = u_o + t*u_d;  v = v_o + t*v_d
# (the matmul evaluates the same plane/barycentric forms the reference
# derives per pair in Triangle.cpp:63-109 — Baldwin & Weber 2016 is the
# classic precomputed formulation).
#
# EXACTNESS: the contraction is approximate (f32-via-bf16 passes +
# catastrophic cancellation bounded by the block-local frame), so the
# kernel only *selects*: it keeps each ray's two nearest loose-accepted
# candidates (acceptance widened by margins that provably cover the BW
# error), counts how many candidates land within the error window of the
# best, and (for shadows) splits acceptance into strict/ambiguous.
# Outside the kernel the kept candidates are re-tested with the exact f32
# Moller-Trumbore (bit-equal to the naive oracle); rays whose count
# overflows the kept set, or whose kept candidate fails the exact test
# while mattering, are *flagged* and re-walked from scratch by the exact
# banded refill.  Unflagged rays are provably exact: every pair that
# could beat the kept winner lies within the margin window, and the
# window never held more than the two kept candidates.
# ---------------------------------------------------------------------------

TILE = GROUP * ST        # rays per tile program
TILE_TOP_S = 48          # candidate supers per tile window
TILE_TOP_M = 64          # candidate blocks per tile window
_MU = 2e-3               # barycentric loose/strict margin
_TREL = 3e-4             # relative t margin (BW-vs-exact error bound)


def _make_tile_kernel(m: int, any_hit: bool, tmg: float):
    """One program = one TILE of rays advancing through its candidate
    list; round r = DMA wait on block r (pipelined _PIPE deep) + one MXU
    Baldwin-Weber contraction + top-2/strict/count bookkeeping."""
    depth = min(_PIPE, m)
    nslots = depth + 1
    big2 = _BIG * 2.0

    def kernel(gid_ref, entry_ref, rays_ref, tb_ref, out_ref, scratch, sem):
        rays = rays_ref[:]                               # (TILE, 8)
        o3 = rays[:, 0:3]
        d3 = rays[:, 3:6]
        cap = rays[:, 6:7]                               # (TILE, 1)
        prev = rays[:, 7:8]
        # The (2*TILE, 8) ray matrix: rows 0..TILE-1 = [o, 1, 0...] (the
        # affine evaluation point), rows TILE.. = [d, 0, 0...] (the
        # direction part); columns 4-7 are zero so the operand's metadata
        # rows never reach the contraction.
        zer4 = jnp.zeros((TILE, 4), jnp.float32)
        a_o = jnp.concatenate(
            [o3, jnp.ones((TILE, 1), jnp.float32), zer4], axis=1)
        a_d = jnp.concatenate(
            [d3, jnp.zeros((TILE, 5), jnp.float32)], axis=1)
        a = jnp.concatenate([a_o, a_d], axis=0)          # (2*TILE, 8)

        def start(r):
            sl = jax.lax.rem(r, nslots)
            pltpu.make_async_copy(tb_ref.at[gid_ref[0, 0, r]],
                                  scratch.at[sl], sem.at[sl]).start()

        for j in range(depth):
            start(jnp.int32(j))

        def cond(carry):
            return carry[-1]

        def body(carry):
            r, t1, s1, t2, s2, t3, ts_m, ts_s, amb, alive = carry
            sl = jax.lax.rem(r, nslots)
            pltpu.make_async_copy(tb_ref.at[gid_ref[0, 0, r]],
                                  scratch.at[sl], sem.at[sl]).wait()

            @pl.when(r + depth < m)
            def _():
                start(r + depth)

            tr = scratch[sl]                             # (8, 3*LANES)
            ln = LANES
            # HIGHEST = full f32 MXU passes (Mosaic supports only DEFAULT
            # -- 1-pass bf16, far outside the margins at scene scale --
            # and HIGHEST).
            dots = jax.lax.dot_general(
                a, tr[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)     # (2*TILE, 3*LANES)
            no, uo, vo = (dots[0:TILE, 0:ln], dots[0:TILE, ln:2 * ln],
                          dots[0:TILE, 2 * ln:3 * ln])
            nd, ud, vd = (dots[TILE:, 0:ln], dots[TILE:, ln:2 * ln],
                          dots[TILE:, 2 * ln:3 * ln])
            inv_nd = 1.0 / jnp.where(jnp.abs(nd) < 0.5 * C.EPSILON, 1.0, nd)
            t = -no * inv_nd
            u = uo + t * ud
            v = vo + t * vd
            tvalid = tr[4:5, 0:ln] > 0.5
            slot_b = jnp.broadcast_to(tr[4:5, ln:2 * ln], t.shape)
            base = tvalid & (slot_b != prev)
            # The exact Moller-Trumbore det is (n_hat . d) * |n_vec|, so
            # the det gate compares the unnormalized scale det_s =
            # |nd| * |n_vec| against EPSILON (factor-2 margin covering the
            # contraction error).  Lanes whose det_s passes but whose bare
            # |nd| is tiny (|n_vec| > ~2) have an untrustworthy t (the
            # division conditioning the margins were derived for no longer
            # holds): they are recorded in `amb` and their rays re-walked
            # exactly outside the kernel instead of being silently dropped
            # (advisor finding, round 4).
            nlen = jnp.broadcast_to(tr[4:5, 2 * ln:3 * ln], t.shape)
            det_s = jnp.abs(nd) * nlen
            well_cond = jnp.abs(nd) >= 0.5 * C.EPSILON
            loose = (base & (det_s >= 0.5 * C.EPSILON) & well_cond
                     & (u >= -_MU) & (v >= -_MU) & (u + v <= 1.0 + _MU)
                     & (t >= C.EPSILON - tmg)
                     & (t <= cap * (1.0 + _TREL) + tmg))
            amb_lane = base & (det_s >= 0.5 * C.EPSILON) & ~well_cond
            amb = jnp.maximum(
                amb, jnp.max(jnp.where(amb_lane, 1.0, 0.0), axis=1,
                             keepdims=True))
            # Strict acceptance = margins negated: the pair provably
            # passes the exact test, so its t (+error) is a SOUND upper
            # bound on the exact winner.  Only strict hits may drive the
            # early exit — a loose-only accept can be an artifact (e.g. a
            # coplanar surface through the ray origin evaluating to t=-0)
            # and must never truncate the walk.
            strict = (base & (det_s >= 1.5 * C.EPSILON) & well_cond
                      & (u >= _MU) & (v >= _MU) & (u + v <= 1.0 - _MU)
                      & (t >= C.EPSILON + tmg)
                      & (t <= cap * (1.0 - _TREL) - tmg))
            tstr = jnp.where(strict, t, big2)
            mo = jnp.min(tstr, axis=1, keepdims=True)
            so = jnp.min(jnp.where(tstr <= mo, slot_b, big2), axis=1,
                         keepdims=True)
            better_o = mo < ts_m
            ts_m = jnp.where(better_o, mo, ts_m)
            ts_s = jnp.where(better_o & (mo < _BIG), so, ts_s)

            # Kept candidates: for shadows only the ambiguous pairs need
            # the exact re-test (strict ones already decide occlusion);
            # for closest-hit every loose pair competes for the top-2.
            track = (loose & ~strict) if any_hit else loose

            # Round top-3 by t (slots only for the top-2: the third-best t
            # value drives the displacement flag, never the refine).
            tl = jnp.where(track, t, big2)
            m1 = jnp.min(tl, axis=1, keepdims=True)
            sl1 = jnp.min(jnp.where(tl <= m1, slot_b, big2), axis=1,
                          keepdims=True)
            sl1 = jnp.where(m1 < _BIG, sl1, -1.0)
            tl2 = jnp.where(slot_b == sl1, big2, tl)
            m2 = jnp.min(tl2, axis=1, keepdims=True)
            sl2 = jnp.min(jnp.where(tl2 <= m2, slot_b, big2), axis=1,
                          keepdims=True)
            m3 = jnp.min(jnp.where((slot_b == sl2) & (tl2 <= m2), big2, tl2),
                         axis=1, keepdims=True)
            sl2 = jnp.where(m2 < _BIG, sl2, -1.0)

            # Merge the round's sorted triple into the running sorted
            # triple (slots carried for the first two).
            take1 = m1 < t1
            n_t1 = jnp.where(take1, m1, t1)
            n_s1 = jnp.where(take1, sl1, s1)
            o_t = jnp.where(take1, t1, m1)
            o_s = jnp.where(take1, s1, sl1)
            a_t = jnp.where(take1, m2, t2)
            a_s = jnp.where(take1, sl2, s2)
            take2 = a_t < o_t
            # 3rd smallest of two sorted triples:
            # min(max(t1,m2), max(t2,m1), t3, m3).
            n_t3 = jnp.minimum(
                jnp.minimum(jnp.maximum(t1, m2), jnp.maximum(t2, m1)),
                jnp.minimum(t3, m3))
            t1, s1 = n_t1, n_s1
            t2 = jnp.where(take2, a_t, o_t)
            s2 = jnp.where(take2, a_s, o_s)
            t3 = n_t3

            if any_hit:
                bound = jnp.where(ts_m < _BIG, -big2, cap)
            else:
                # Sound per-ray upper bound on the exact winner: the best
                # strict hit (+ its error margin), else the cap.
                bound = jnp.minimum(ts_m * (1.0 + _TREL) + tmg, cap)
            t_worst = jnp.max(bound)
            nxt_idx = jnp.minimum(r + 1, m - 1)
            past = r + 1 >= m
            done = past | (entry_ref[0, 0, nxt_idx] >= t_worst)
            return (r + 1, t1, s1, t2, s2, t3, ts_m, ts_s, amb, ~done)

        shp = (TILE, 1)
        init = (jnp.int32(0),
                jnp.full(shp, big2, jnp.float32),
                jnp.full(shp, -1.0, jnp.float32),
                jnp.full(shp, big2, jnp.float32),
                jnp.full(shp, -1.0, jnp.float32),
                jnp.full(shp, big2, jnp.float32),
                jnp.full(shp, big2, jnp.float32),
                jnp.full(shp, -1.0, jnp.float32),
                jnp.zeros(shp, jnp.float32),
                jnp.array(True))
        (r_fin, t1, s1, t2, s2, t3, ts_m, ts_s, amb,
         _) = jax.lax.while_loop(cond, body, init)

        # Drain in-flight DMAs.
        for j in range(depth):
            @pl.when(r_fin + j < m)
            def _(j=j):
                sl = jax.lax.rem(r_fin + j, nslots)
                pltpu.make_async_copy(tb_ref.at[gid_ref[0, 0, r_fin + j]],
                                      scratch.at[sl], sem.at[sl]).wait()

        rounds = jnp.full(shp, 1.0) * r_fin.astype(jnp.float32)
        out_ref[:] = jnp.concatenate(
            [t1, s1, t2, s2, t3, ts_m, ts_s,
             rounds, amb, jnp.zeros((TILE, 7), jnp.float32)], axis=1)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("m", "any_hit", "interpret", "tmg"))
def _traverse_tile_padded(tw, cand_gid, cand_entry, rays, m: int,
                          any_hit: bool, interpret: bool, tmg: float):
    """rays: (Bp, 8), Bp a TILE multiple.  Returns (Bp, 16) packed
    [t1, s1, t2, s2, t3, ts_m, ts_s, rounds, 0 x 8]."""
    bp = rays.shape[0]
    n_tiles = bp // TILE
    kernel = _make_tile_kernel(m, any_hit, tmg)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 16), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((min(_PIPE, m) + 1,) + tw.shape[1:], jnp.float32),
            pltpu.SemaphoreType.DMA((min(_PIPE, m) + 1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(cand_gid.reshape(n_tiles, 1, m), cand_entry.reshape(n_tiles, 1, m),
      rays, tw)


def _make_tilemt_kernel(m: int, any_hit: bool):
    """Exact tile-granular traversal: one TILE of rays advances through a
    shared candidate list; round r = ONE block DMA (pipelined) + one dense
    (GROUP, ST, LANES) Moller-Trumbore of all 128 rays against the block's
    128 triangles (reference acceptance, Triangle.cpp:63-109).  Unlike the
    banded kernel this shares each DMA and exit test across the whole
    tile; unlike the Baldwin-Weber kernel the math is the exact f32 MT, so
    no margins, refine, or fallback flags are needed."""
    depth = min(_PIPE, m)
    nslots = depth + 1

    def kernel(gid_ref, entry_ref, rays_ref, tb_ref, out_ref, scratch, sem):
        g_n = GROUP
        rays = rays_ref[:]                                  # (TILE, 8)

        def comp(c):
            return rays[:, c:c + 1].reshape(g_n, ST, 1)

        ox, oy, oz = comp(0), comp(1), comp(2)
        dx, dy, dz = comp(3), comp(4), comp(5)
        t_init = comp(6)
        prev = comp(7)

        def start(r):
            sl = jax.lax.rem(r, nslots)
            pltpu.make_async_copy(tb_ref.at[gid_ref[0, 0, r]],
                                  scratch.at[sl], sem.at[sl]).start()

        for j in range(depth):
            start(jnp.int32(j))

        def cond(carry):
            return carry[-1]

        def body(carry):
            r, t_best, slot_best, alive = carry
            sl = jax.lax.rem(r, nslots)
            pltpu.make_async_copy(tb_ref.at[gid_ref[0, 0, r]],
                                  scratch.at[sl], sem.at[sl]).wait()

            @pl.when(r + depth < m)
            def _():
                start(r + depth)

            tr = scratch[sl]                                # (16, LANES)
            pax, pay, paz = tr[0:1, :], tr[1:2, :], tr[2:3, :]
            abx, aby, abz = tr[3:4, :], tr[4:5, :], tr[5:6, :]
            acx, acy, acz = tr[6:7, :], tr[7:8, :], tr[8:9, :]
            tvalid = tr[9:10, :] > 0.5
            slot = tr[10:11, :]                             # (1, LANES)

            px = dy * acz - dz * acy
            py = dz * acx - dx * acz
            pz = dx * acy - dy * acx
            det = abx * px + aby * py + abz * pz
            inv = 1.0 / jnp.where(jnp.abs(det) < C.EPSILON, 1.0, det)
            tvx, tvy, tvz = ox - pax, oy - pay, oz - paz
            u = inv * (tvx * px + tvy * py + tvz * pz)
            qx = tvy * abz - tvz * aby
            qy = tvz * abx - tvx * abz
            qz = tvx * aby - tvy * abx
            v = inv * (dx * qx + dy * qy + dz * qz)
            t = inv * (acx * qx + acy * qy + acz * qz)

            ok = ((jnp.abs(det) >= C.EPSILON) & (u >= 0.0) & (u <= 1.0)
                  & (v >= 0.0) & (u + v <= 1.0) & (t >= C.EPSILON)
                  & tvalid & (slot != prev))
            t = jnp.where(ok & (t < t_best), t, _BIG)
            tmin = jnp.min(t, axis=2, keepdims=True)        # (G, ST, 1)
            smin = jnp.min(jnp.where(t <= tmin,
                                     jnp.broadcast_to(slot, t.shape), _BIG),
                           axis=2, keepdims=True)
            closer = tmin < t_best
            t_best = jnp.where(closer, tmin, t_best)
            slot_best = jnp.where(closer, smin, slot_best)

            if any_hit:
                # Tile fully occluded: every ray found a blocker.
                not_occ = jnp.max(jnp.where(t_best < t_init, 0.0, 1.0))
                t_worst = jnp.where(not_occ < 0.5, -_BIG,
                                    jnp.max(jnp.where(t_best < t_init,
                                                      -_BIG, t_init)))
            else:
                t_worst = jnp.max(t_best)
            nxt_idx = jnp.minimum(r + 1, m - 1)
            past = r + 1 >= m
            done = past | (entry_ref[0, 0, nxt_idx] >= t_worst)
            return (r + 1, t_best, slot_best, ~done)

        init = (jnp.int32(0), t_init,
                jnp.full((g_n, ST, 1), -1.0, jnp.float32),
                jnp.array(True))
        r_fin, t_best, slot_best, _ = jax.lax.while_loop(cond, body, init)

        for j in range(depth):
            @pl.when(r_fin + j < m)
            def _(j=j):
                sl = jax.lax.rem(r_fin + j, nslots)
                pltpu.make_async_copy(tb_ref.at[gid_ref[0, 0, r_fin + j]],
                                      scratch.at[sl], sem.at[sl]).wait()

        out_ref[:] = jnp.concatenate(
            [t_best.reshape(TILE, 1), slot_best.reshape(TILE, 1),
             jnp.full((TILE, 1), 1.0) * r_fin.astype(jnp.float32),
             jnp.zeros((TILE, 1), jnp.float32)], axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("m", "any_hit", "interpret"))
def _traverse_tilemt_padded(tb, cand_gid, cand_entry, rays, m: int,
                            any_hit: bool, interpret: bool):
    """rays: (Bp, 8), Bp a TILE multiple.  Returns (Bp, 4) packed
    [t, slot, rounds, 0]."""
    bp = rays.shape[0]
    n_tiles = bp // TILE
    kernel = _make_tilemt_kernel(m, any_hit)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((min(_PIPE, m) + 1,) + tb.shape[1:], jnp.float32),
            pltpu.SemaphoreType.DMA((min(_PIPE, m) + 1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(cand_gid.reshape(n_tiles, 1, m), cand_entry.reshape(n_tiles, 1, m),
      rays, tb)


def traverse_tilemt(grid: PallasGrid, tris: Triangles, o, d, t_init,
                    prev_kind, prev_id, any_hit: bool = False,
                    top_s: int = None, top_m: int = None):
    """Closest-hit (or any-hit) via the exact tile-MT kernel + exact
    banded refill.  Same contract as `traverse`."""
    b = o.shape[0]
    grid = jax.tree.map(jnp.asarray, grid)
    t0 = jnp.broadcast_to(jnp.asarray(t_init, jnp.float32), (b,))
    rays, bp = _pack_rays(o, d, t0, prev_kind, prev_id, TILE)
    op, dp = rays[:, 0:3], rays[:, 3:6]
    ntile = bp // TILE
    cap0 = jnp.max(rays[:, 6].reshape(ntile, TILE), axis=1)
    cg, _, ce, cut = _candidates(grid, op, dp, cap=cap0, st=TILE,
                                 top_s=top_s or TILE_TOP_S,
                                 top_m=top_m or TILE_TOP_M)
    m = cg.shape[1]
    interp = _interpret()
    out = _traverse_tilemt_padded(grid.tb, cg, ce, rays, m, any_hit, interp)
    t_cur, sid = out[:, 0], out[:, 1]

    floor_r = jnp.repeat(cut, TILE)
    lanes_pad = jnp.arange(bp) >= b
    floor_r = jnp.where(lanes_pad, _BIG, floor_r)
    if any_hit:
        # Occluded rays are resolved regardless of the window cutoff.
        floor_r = jnp.where(t_cur < rays[:, 6], _BIG, floor_r)

    t_fin, sid_fin = _refill_exact(grid, tris, rays, t_cur, sid, floor_r,
                                   any_hit, interp, bp)
    t_fin = t_fin[:b]
    sid_fin = sid_fin[:b]
    hit = t_fin < t0
    return (jnp.where(hit, t_fin, _BIG),
            jnp.where(hit, sid_fin.astype(jnp.int32), -1))


def _exact_mt_pair(tri_attr, o, d, slot_f, prev_f):
    """Exact f32 Moller-Trumbore re-test of one BW candidate slot per ray
    (slot_f f32 global slot, -1 = none): the tile kernel's approximate
    winners are re-derived with the reference acceptance
    (Triangle.cpp:63-109) so the traversal's final (t, id) match the
    naive oracle bit-for-bit."""
    s = jnp.maximum(slot_f.astype(jnp.int32), 0)
    row = tri_attr[s]
    t, ok = nv._mt_components(o, d, row[:, 0:3], row[:, 3:6], row[:, 6:9])
    ok = ok & (slot_f >= 0.0) & (slot_f != prev_f)
    return jnp.where(ok, t, _BIG), ok


def traverse_tile(grid: PallasGrid, tris: Triangles, o, d, t_init,
                  prev_kind, prev_id, any_hit: bool = False):
    """Closest-hit (or any-hit) via the MXU tile kernel + exact refine +
    exact banded refill.  Same contract as `traverse`."""
    b = o.shape[0]
    grid = jax.tree.map(jnp.asarray, grid)
    t0 = jnp.broadcast_to(jnp.asarray(t_init, jnp.float32), (b,))
    rays, bp = _pack_rays(o, d, t0, prev_kind, prev_id, TILE)
    op, dp = rays[:, 0:3], rays[:, 3:6]
    ntile = bp // TILE
    cap0 = jnp.max(rays[:, 6].reshape(ntile, TILE), axis=1)
    cg, _, ce, cut = _candidates(grid, op, dp, cap=cap0, st=TILE,
                                 top_s=TILE_TOP_S, top_m=TILE_TOP_M)
    m = cg.shape[1]
    interp = _interpret()
    tmg = grid.t_margin
    out = _traverse_tile_padded(grid.tw, cg, ce, rays, m, any_hit, interp,
                                tmg)
    t1, s1, t2, s2 = out[:, 0], out[:, 1], out[:, 2], out[:, 3]
    t3, ts_m, ts_s = out[:, 4], out[:, 5], out[:, 6]
    amb = out[:, 8] > 0.5   # saw an ill-conditioned (big-|n_vec|) candidate
    prevf = rays[:, 7]
    t0p = rays[:, 6]
    e1, ok1 = _exact_mt_pair(grid.tri_attr, op, dp, s1, prevf)
    e2, ok2 = _exact_mt_pair(grid.tri_attr, op, dp, s2, prevf)
    lanes_pad = jnp.arange(bp) >= b

    floor_r = jnp.repeat(cut, TILE)
    if not any_hit:
        t_ex = jnp.minimum(e1, e2)
        sid = jnp.where(e1 <= e2, s1, s2)
        # Flag rays whose exact winner may not be among the two kept
        # candidates: (a) the third-best approximate t lands inside the
        # error window of the worst kept (every pair that could beat the
        # kept winner satisfies t_bw <= t2 + 2err, so a clear window
        # proves the winner was kept); (b) both kept failed the exact test
        # while a third loose accept existed (the kept pair were artifacts
        # that displaced real candidates).
        flag = (((t3 < _BIG) & (t3 <= t2 * (1.0 + 2.0 * _TREL) + 2.0 * tmg))
                | ((t_ex >= _BIG) & (t3 < _BIG)) | amb)
        t_cur = jnp.minimum(t_ex, t0p)
    else:
        occ1 = ok1 & (e1 < t0p)
        occ2 = ok2 & (e2 < t0p)
        strict_occ = ts_s >= 0
        occ = strict_occ | occ1 | occ2
        t_cur = jnp.where(occ1, e1,
                          jnp.where(occ2, e2,
                                    jnp.where(strict_occ, ts_m, t0p)))
        sid = jnp.where(occ1, s1,
                        jnp.where(occ2, s2,
                                  jnp.where(strict_occ, ts_s, -1.0)))
        # A third ambiguous pair exists that the kept two cannot account
        # for -> exact fallback unless already strictly occluded.
        flag = ~occ & ((t3 < _BIG) | amb)
        floor_r = jnp.where(occ, _BIG, floor_r)  # occluded = resolved

    floor_r = jnp.where(flag, -_BIG, floor_r)
    floor_r = jnp.where(lanes_pad, _BIG, floor_r)
    t_cur = jnp.where(lanes_pad, 0.0, t_cur)

    t_fin, sid_fin = _refill_exact(grid, tris, rays, t_cur, sid, floor_r,
                                   any_hit, interp, bp)
    t_fin = t_fin[:b]
    sid_fin = sid_fin[:b]
    hit = t_fin < t0
    return (jnp.where(hit, t_fin, _BIG),
            jnp.where(hit, sid_fin.astype(jnp.int32), -1))


# ---------------------------------------------------------------------------
# Scene-level dispatch (mirrors ops/block_bvh.py).
# ---------------------------------------------------------------------------

def build(scene: Scene, **kwargs) -> Scene:
    """Attaches the Pallas block table to the scene (reordering its
    triangles).  Stored in the scene's `bvh` slot as a PallasGrid."""
    tris2, grid = build_blocks(scene.triangles, **kwargs)
    # One batched host->device transfer for the whole scene + tables
    # (building in numpy and shipping once avoids per-array RPC latency on
    # tunneled TPU backends, where each device touch costs seconds).
    return jax.device_put(scene.replace(triangles=tris2, bvh=grid))


# Traversal variants, A/B-measured on the conference proxy (512^2 Whitted
# primaries, v5e, round 4): "tilemt" 15.6 ms, "banded" 29.4 ms, "tilebw"
# 54.8 ms per closest pass.  tilemt (tile-granular candidates + exact
# in-kernel Moller-Trumbore) is the production path; tilebw (the MXU
# Baldwin-Weber contraction) is kept as the measured-slower experiment —
# at contraction depth 8 the MXU has no arithmetic advantage and HIGHEST
# precision costs 6 passes (see PERF.md); banded remains the refill
# workhorse.
_TRAVERSALS = {"banded": traverse, "tilebw": traverse_tile,
               "tilemt": traverse_tilemt, "resident": traverse_resident}
DEFAULT_MODE = "tilemt"


def intersect_scene_pallas(scene: Scene, o, d, prev_kind, prev_id,
                           t_max=_BIG, mode: str = None,
                           differentiable: bool = False) -> Hit:
    grid = scene.bvh
    assert isinstance(grid, PallasGrid), "call ops.pallas_bvh.build first"
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (o.shape[0],))
    t_pl, id_pl = nv.closest_planes(scene.planes, o, d, tm, prev_kind, prev_id)
    t_sp, id_sp = nv.closest_spheres(scene.spheres, o, d, tm, prev_kind, prev_id)
    trav = _TRAVERSALS[mode or DEFAULT_MODE]
    if differentiable:
        # The Pallas kernels have no VJP; run them fully off the gradient
        # path and re-derive the winner's t from the live triangle table
        # (gradients then flow through hit attributes, not the walk).
        t_tr, id_tr = jax.lax.stop_gradient(
            trav(grid, jax.lax.stop_gradient(scene.triangles),
                 jax.lax.stop_gradient(o), jax.lax.stop_gradient(d),
                 tm, prev_kind, prev_id))
        t_tr = nv.recompute_tri_t(scene.triangles, o, d, id_tr)
        t_tr = jnp.where(id_tr >= 0, t_tr, _BIG)
        t_li, id_li = nv.closest_lights(scene.lights, o, d, tm, prev_kind,
                                        prev_id)
        return nv._fill_hit(scene, o, d, t_pl, id_pl, t_sp, id_sp, t_tr,
                            id_tr, t_li, id_li)
    t_tr, id_tr = trav(grid, scene.triangles, o, d, tm, prev_kind, prev_id)
    t_tr = jnp.where(id_tr >= 0, t_tr, _BIG)
    t_li, id_li = nv.closest_lights(scene.lights, o, d, tm, prev_kind, prev_id)
    return nv._fill_hit(scene, o, d, t_pl, id_pl, t_sp, id_sp, t_tr, id_tr,
                        t_li, id_li, tri_attr=grid.tri_attr)


# Shadow-tuned traversal knobs.  A/B on conference reversed shared-light
# bundles (round 5) measured the DEFAULT windows fastest: coarser
# selection bundles (sel_st=32/64) or fewer supers (top_s=16) starve the
# super cutoff and blow up the per-ray refill (107/150 ms vs 87 ms), and
# tile-granular shadow windows over-list badly (the 128-ray interval
# hull's axis-aligned cone is far fatter than the true cone: 206+ ms).
# The dict is kept as the tuning hook; exactness holds for ANY setting
# (tests/test_pallas_bvh.py::test_selection_knobs_stay_exact).
SHADOW_SEL = {}


def occluded_pallas(scene: Scene, o, d, max_dist, prev_kind, prev_id,
                    mode: str = None, **sel):
    grid = scene.bvh
    assert isinstance(grid, PallasGrid), "call ops.pallas_bvh.build first"
    md = jnp.broadcast_to(jnp.asarray(max_dist, jnp.float32), (o.shape[0],))
    t_pl, _ = nv.closest_planes(scene.planes, o, d, md, prev_kind, prev_id)
    t_sp, _ = nv.closest_spheres(scene.spheres, o, d, md, prev_kind, prev_id,
                                 exclude_prev=True)
    trav = _TRAVERSALS[mode or DEFAULT_MODE]
    t_tr, id_tr = trav(grid, scene.triangles, o, d, md, prev_kind,
                       prev_id, any_hit=True, **sel)
    return (id_tr >= 0) | (t_pl < md) | (t_sp < md)
