"""Token-expansion kernel v4: MXU batch engine (decode-side hot kernel).

Replaces the v3 serial per-token walk (ops/expand2.py, ~56 ns/token) with a
vector/MXU design in which no scalar work scales with token count:

  * EXTRACTION: tokens stream tile-wise (16 rows = 2048 slots = 64 lanes);
    literal-run detection, per-slot output offsets and item fields are
    (16,128) vector ops (segmented scans along 32-slot lanes); items are
    compacted per tile with lane-gather binary searches and appended to a
    VMEM item queue.  Long-overlap matches (128 < dist < len) split into
    two consecutive-source pieces so every item is either consecutive or
    short-periodic — one uniform fetch shape.
  * LITERALS: each tile's token low bytes are copied verbatim into a ring
    staging buffer (8 tile slots); a literal-run item is a consecutive copy
    out of the ring — no byte compaction anywhere.
  * BATCHES of 128 items expand together: sources are fetched with one-hot
    MXU contractions over a 512-row (64 KiB) window of the output slab
    (every DEFLATE source lies within the 32 KiB window, so the one-hot
    domain is bounded), bytes are aligned with per-lane index arithmetic +
    lane gathers (periodic "mod d" overlap copies resolve in one fetch, cf.
    the reference's wavefront copy, /root/reference/src/inflator.c:1747-53),
    and written back with one-hot scatter contractions.
  * IN-BATCH DEPENDENCIES: pointer-doubling jump rounds re-source items
    through in-batch consecutive or periodic copies (record chains and RLE
    chains collapse in O(log chain) rounds); residual dependencies resolve
    in masked sub-rounds that re-fetch the updated window.
  * All hot paths are straight-line masked vector code: on this chip the
    cost of a lax.cond grows with the size of the code it guards (measured
    ~40 us for an untaken cond around the phase body), so the kernel keeps
    exactly ONE inlined copy of the batch engine and runs phases/rounds
    masked instead of branched.

All index arithmetic is integer; Mosaic's f32 (NB,NB)@(NB,1) contractions
proved numerically unreliable on v5e and are not used.

Reference behavior reproduced (never translated): the inflator's output
loop — literal stores and back-reference copies with window history
(decodefast, /root/reference/src/inflator.c:1678-1812; copybytes
:1213-1290).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import constants as C

HALO = C.WINDOW_SIZE                 # 32768 bytes
HALO_ROWS = HALO // 128              # 256
TROWS = 16                           # token rows per tile (64 lanes)
TSLOTS = TROWS * 128                 # 2048 slots per tile
RING_SLOTS = 8                       # staging ring depth (tiles)
RING_ROWS = RING_SLOTS * TROWS       # 128
WROWS = 320                          # fetch window rows (40 KiB)
QROWS = 64                           # item queue rows (8192 items)
NB = 128                             # items per batch
CH_TILES = 8                         # tiles per DMA chunk
CHROWS = CH_TILES * TROWS            # 128 token rows per chunk
LANES_PER_CHUNK = CH_TILES * 64      # 512
BIGD = np.int32(1 << 28)             # pad-item dst sentinel
CONSEC = np.int32(1024)              # "period" of consecutive-source items
MAXSUB = 256                         # sub-round cap (legit max ~130)

# queue fields, packed 3-wide: A = dst | spc<<26; B = w | per<<9; C = src
F_A, F_B, F_C = range(3)
NQF = 3


def _seg_cumsums(x, iota_c):
    """(exclusive, inclusive) cumsum along lanes within 32-slot segments."""
    from jax.experimental.pallas import tpu as pltpu
    inc = x
    for sh in (1, 2, 4, 8, 16):
        y = pltpu.roll(inc, sh, 1)
        inc = inc + jnp.where((iota_c & 31) >= sh, y, 0)
    return inc - x, inc


def _row_cumsums(x, iota_c):
    """(exclusive, inclusive) cumsum along the full 128-lane row."""
    from jax.experimental.pallas import tpu as pltpu
    inc = x
    for sh in (1, 2, 4, 8, 16, 32, 64):
        y = pltpu.roll(inc, sh, 1)
        inc = inc + jnp.where(iota_c >= sh, y, 0)
    return inc - x, inc


def _expand3_kernel(nt_ref, ldb_ref, tok_hbm, b_in, bo_ref, err_ref,
                    dbg_ref, tbuf, stg, qv, sem):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import os as _env

    del b_in  # aliased with bo_ref
    ntiles = nt_ref[0]
    RB = bo_ref.shape[0]
    STATS = bool(_env.environ.get("EX3_STATS"))

    iota_r16 = jax.lax.broadcasted_iota(jnp.int32, (TROWS, 128), 0)
    iota_c16 = jax.lax.broadcasted_iota(jnp.int32, (TROWS, 128), 1)
    flat16 = iota_r16 * 128 + iota_c16
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (NB, WROWS), 1)
    iota_ring = jax.lax.broadcasted_iota(jnp.int32, (NB, RING_ROWS), 1)
    iota_32 = jax.lax.broadcasted_iota(jnp.int32, (NB, 32), 1)

    def chunk_dma(ck, slot):
        return pltpu.make_async_copy(
            tok_hbm.at[pl.ds(ck * CHROWS, CHROWS), :],
            tbuf.at[pl.ds(slot * CHROWS, CHROWS), :], sem.at[slot])

    # ---------------- batch processing ----------------
    def read_qrow2(field, qh):
        r0 = (qh >> 7) & (QROWS - 1)
        a = qv[pl.ds(field * QROWS + r0, 1), :]
        b = qv[pl.ds(field * QROWS + ((r0 + 1) & (QROWS - 1)), 1), :]
        off = qh & 127
        # rotate left by off (Mosaic gathers don't lower on (1,128) shapes)
        ga = pltpu.roll(a, (128 - off) & 127, 1)
        gb = pltpu.roll(b, (128 - off) & 127, 1)
        return jnp.where(iota1 < 128 - off, ga, gb)

    def process_batch(qh, nvalid):
        """Expand queue items [qh, qh+nvalid) (nvalid in [1, 128]).
        Returns an error count (0 on success)."""
        if _env.environ.get("EX3_NOBATCH"):
            return qh * 0
        a_r = read_qrow2(F_A, qh)                       # (1,128) rows
        b_r = read_qrow2(F_B, qh)
        src_r = read_qrow2(F_C, qh)
        dst_r = a_r & ((1 << 26) - 1)
        spc_r = a_r >> 26
        w_r = b_r & 511
        per_r = b_r >> 9
        valid_r = iota1 < nvalid
        dst_r = jnp.where(valid_r, dst_r, BIGD)
        w_r = jnp.where(valid_r, w_r, 0)
        src_r0 = jnp.where(valid_r, src_r, 0)
        per_r = jnp.maximum(jnp.where(valid_r, per_r, CONSEC), 1)
        spc_r0 = jnp.where(valid_r, spc_r, 0)
        dst_c = dst_r.reshape(NB, 1)
        w_c = w_r.reshape(NB, 1)

        bstart = jnp.min(jnp.where(w_r > 0, dst_r, BIGD))

        # ---- jump rounds (pointer doubling through in-batch items)
        def jcond(c):
            it, src_, spc_, changed = c
            return (it < 4) & (changed > 0)

        def jbody(c):
            it, src_, spc_, _ = c                       # (1,128) rows
            sw_ = jnp.minimum(per_r, w_r)
            inb = ((spc_ == 0) & (src_ >= bstart) & (w_r > 0))
            M = (dst_c <= src_) & (w_c > 0)             # (NB,128): j x i
            cov = jnp.sum(M.astype(jnp.int32), axis=0, keepdims=True) - 1
            covc = jnp.clip(cov, 0, NB - 1)
            F8 = jnp.concatenate(
                [dst_r, w_r, src_, per_r, spc_,
                 jnp.zeros((3, 128), jnp.int32)], axis=0)       # (8,128)
            G = jnp.take_along_axis(
                F8, jnp.broadcast_to(covc, (8, 128)), axis=1)
            cdst, cw, csrc, cper, cspc = (G[0:1], G[1:2], G[2:3], G[3:4],
                                          G[4:5])
            contain = (inb & (cov >= 0) & (cw > 0) & (src_ >= cdst)
                       & (src_ + sw_ - 1 <= cdst + cw - 1))
            okc = cper >= cw                            # consecutive target
            phi = (src_ - cdst) % cper
            okp = (~okc) & (sw_ <= cper) & (phi + sw_ <= cper)
            ok = contain & (okc | okp)
            nsrc = jnp.where(ok,
                             csrc + jnp.where(okc, src_ - cdst, phi), src_)
            nspc = jnp.where(ok, cspc, spc_)
            return it + 1, nsrc, nspc, jnp.sum(ok.astype(jnp.int32))

        if _env.environ.get("EX3_NOJUMP"):
            src_rj, spc_rj = src_r0, spc_r0
        else:
            _, src_rj, spc_rj, _ = jax.lax.while_loop(
                jcond, jbody, (jnp.int32(0), src_r0, spc_r0, jnp.int32(1)))

        src = src_rj.reshape(NB, 1)
        spc = spc_rj.reshape(NB, 1)
        per = per_r.reshape(NB, 1)
        dst = dst_c
        w = w_c
        is_cons = per >= w                              # single-fetch shape

        # ---- sub-rounds
        sw_r = jnp.minimum(per_r, w_r)
        send_r = src_rj + sw_r - 1
        ovl_geo = ((dst_c <= send_r) & (dst_c + w_c - 1 >= src_rj)
                   & (w_c > 0)).astype(jnp.int32)       # (NB,128)

        def scond(c):
            it, resolved_r, err = c
            return (it < MAXSUB) & (jnp.min(resolved_r) == 0) & (err == 0)

        def sbody(c):
            it, resolved_r, err = c                     # resolved: (1,128)
            unres_c = ((resolved_r == 0) & (w_r > 0)).astype(
                jnp.int32).reshape(NB, 1)
            dep_r = jnp.sum(ovl_geo * unres_c, axis=0, keepdims=True)
            ready_r = ((resolved_r == 0) & (w_r > 0)
                       & ((spc_rj == 1) | (dep_r == 0)))

            srcrow_r = src_rj >> 7
            isB = ready_r & (spc_rj == 0)
            minrow = jnp.min(jnp.where(isB, srcrow_r, jnp.int32(1 << 28)))
            wb = jnp.where(jnp.any(isB),
                           jnp.clip((minrow - 16) & ~15, 0, RB - WROWS), 0)
            wb = pl.multiple_of(wb, 16)
            covered_r = ((src_rj + w_r + 256) >> 7) <= wb + WROWS - 2
            ready_r = ready_r & ((spc_rj == 1) | covered_r)
            ready = ready_r.astype(jnp.int32).reshape(NB, 1) > 0

            go = jnp.any(ready_r)
            err = jnp.where(go, err, err + 1)
            maxw = jnp.max(jnp.where(ready_r, w_r, 0))
            nphase = jnp.where(maxw > 256, 3,
                               jnp.where(maxw > 128, 2, 1))

            # ---- fetch + write, straight-line masked; phases as a loop so
            # the body exists ONCE in the instruction stream
            def phase_body(p, _):
                win = bo_ref[pl.ds(wb, WROWS), :]
                ring = stg[:, :]
                act = ready & (w > 128 * p)
                pw = jnp.clip(w - 128 * p, 0, 128)
                qidx = (128 * p + iota_nb) % per
                fbase = src + jnp.where(is_cons, 128 * p, 0)
                off_in = jnp.where(is_cons, iota_nb, qidx)
                fb = jnp.where(act, fbase, 0)
                frow = fb >> 7
                fr = jnp.clip(frow - wb, 0, WROWS - 2)
                oh1 = (iota_w == fr).astype(jnp.bfloat16)
                oh2 = (iota_w == fr + 1).astype(jnp.bfloat16)
                f1 = jnp.dot(oh1, win, preferred_element_type=jnp.float32)
                f2 = jnp.dot(oh2, win, preferred_element_type=jnp.float32)
                rr = jnp.clip(frow, 0, RING_ROWS - 1)
                rr2 = jnp.clip(frow + 1, 0, RING_ROWS - 1)
                ohr1 = (iota_ring == rr).astype(jnp.bfloat16)
                ohr2 = (iota_ring == rr2).astype(jnp.bfloat16)
                g1 = jnp.dot(ohr1, ring, preferred_element_type=jnp.float32)
                g2 = jnp.dot(ohr2, ring, preferred_element_type=jnp.float32)
                isr = spc == 1
                h1 = jnp.where(isr, g1, f1)
                h2 = jnp.where(isr, g2, f2)
                off = jnp.clip((fb & 127) + off_in, 0, 255)
                s1 = jnp.take_along_axis(h1, off & 127, axis=1)
                s2 = jnp.take_along_axis(h2, off & 127, axis=1)
                bytes_ = jnp.where(off < 128, s1, s2)

                dp = dst + 128 * p
                delta_l = dp & 127
                rot = jnp.take_along_axis(
                    bytes_, (iota_nb - delta_l) & 127, axis=1)
                m1 = (act & (iota_nb >= delta_l)
                      & (iota_nb < delta_l + pw)).astype(jnp.int32)
                m2 = (act & (iota_nb < delta_l + pw - 128)).astype(jnp.int32)
                drow = jnp.where(act, dp >> 7, jnp.int32(1 << 28))

                def wcond(cc):
                    rem1, rem2, it2 = cc
                    return (jnp.max(rem1) + jnp.max(rem2) > 0) & (it2 < 40)

                def wbody(cc):
                    rem1, rem2, it2 = cc
                    pend = jnp.sum(rem1 + rem2, axis=1, keepdims=True) > 0
                    minr = jnp.min(jnp.where(pend, drow,
                                             jnp.int32(1 << 28)))
                    wwb = pl.multiple_of(
                        jnp.clip(minr & ~15, 0, RB - 48), 16)
                    inw = ((drow >= wwb) & (drow <= wwb + 30)).astype(
                        jnp.int32)
                    cm1 = rem1 * inw
                    cm2 = rem2 * inw
                    c1 = jnp.where(cm1 > 0, rot, 0.0).astype(jnp.bfloat16)
                    c2 = jnp.where(cm2 > 0, rot, 0.0).astype(jnp.bfloat16)
                    dr = jnp.clip(drow - wwb, 0, 31)
                    ohw1 = (iota_32 == dr).astype(jnp.bfloat16)
                    ohw2 = (iota_32 == jnp.clip(dr + 1, 0, 31)).astype(
                        jnp.bfloat16)
                    dnums = (((0,), (0,)), ((), ()))
                    dlt = (jax.lax.dot_general(
                        ohw1, c1, dimension_numbers=dnums,
                        preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            ohw2, c2, dimension_numbers=dnums,
                            preferred_element_type=jnp.float32))
                    cvm = (jax.lax.dot_general(
                        ohw1, jnp.where(cm1 > 0, 1.0, 0.0).astype(
                            jnp.bfloat16),
                        dimension_numbers=dnums,
                        preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            ohw2, jnp.where(cm2 > 0, 1.0, 0.0).astype(
                                jnp.bfloat16),
                            dimension_numbers=dnums,
                            preferred_element_type=jnp.float32))
                    old = bo_ref[pl.ds(wwb, 32), :].astype(jnp.float32)
                    bo_ref[pl.ds(wwb, 32), :] = jnp.where(
                        cvm > 0, dlt, old).astype(jnp.bfloat16)
                    return (rem1 * (1 - inw), rem2 * (1 - inw), it2 + 1)

                jax.lax.while_loop(wcond, wbody, (m1, m2, jnp.int32(0)))
                return jnp.int32(0)

            if not _env.environ.get("EX3_NOPHASE"):
                jax.lax.fori_loop(0, nphase, phase_body, jnp.int32(0))

            nres = jnp.where(ready_r, 1, resolved_r)
            nres = jnp.where(w_r > 0, nres, 1)
            return it + 1, nres, err

        resolved0 = jnp.where(w_r > 0, jnp.int32(0), jnp.int32(1))
        nit, _, serr = jax.lax.while_loop(
            scond, sbody, (jnp.int32(0), resolved0, jnp.int32(0)))

        if STATS:
            cur = dbg_ref[40:41, :]
            add = (jnp.where(iota1 == 0, 1, 0)
                   + jnp.where(iota1 == 1, nit, 0)
                   + jnp.where(iota1 == 2, nvalid, 0))
            dbg_ref[40:41, :] = cur + add
        return serr + jnp.where(nit >= MAXSUB, 1, 0)

    def drain(qh, qtail, err, all_):
        """Process complete batches (and, when all_, the final partial)."""
        def dcond(cc):
            qh2, err2 = cc
            n = qtail - qh2
            return jnp.where(all_, n > 0, n >= NB)

        def dbody(cc):
            qh2, err2 = cc
            n = jnp.minimum(qtail - qh2, NB)
            e = process_batch(qh2, n)
            return qh2 + n, err2 + e

        return jax.lax.while_loop(dcond, dbody, (qh, err))

    # ---------------- main loop: one drain site, then extraction ----------
    # the ring rides through one-hot matmuls: 0 * garbage(NaN) = NaN, so
    # unwritten rows must be finite
    stg[:, :] = jnp.zeros((RING_ROWS, 128), jnp.bfloat16)
    if STATS:
        dbg_ref[40:41, :] = jnp.zeros((1, 128), jnp.int32)
    chunk_dma(0, 0).start()

    def tile_body(t, carry):
        qhead, qtail, lastflush, err, part = carry
        part = list(part)

        # single in-loop drain call site: full batches always; everything
        # when the ring is about to overwrite a slot items may reference
        stale = (qtail > qhead) & (lastflush <= t - (RING_SLOTS - 1))
        qhead, err = drain(qhead, qtail, err, stale)
        lastflush = jnp.where(qtail == qhead, t, lastflush)

        if True:
            ck = t // CH_TILES
            slot = ck & 1

            @pl.when((t % CH_TILES) == 0)
            def _():
                chunk_dma(ck, slot).wait()

                @pl.when((ck + 1) * CH_TILES < ntiles)
                def _():
                    chunk_dma(ck + 1, 1 - slot).start()

            tok = tbuf[pl.ds(slot * CHROWS + (t % CH_TILES) * TROWS,
                             TROWS), :]
            stg[pl.ds((t % RING_SLOTS) * TROWS, TROWS), :] = (
                tok & 255).astype(jnp.bfloat16)

            kind = (tok >> 30) & 3
            is_lit = kind == 1
            is_m = kind == 2
            mlen = tok & 0x1FF
            dist = ((tok >> 9) & 0x7FFF) + 1
            slen = jnp.where(is_lit, 1, jnp.where(is_m, mlen, 0))

            exc, _ = _seg_cumsums(slen, iota_c16)
            lane_local = iota_r16 * 4 + (iota_c16 >> 5)
            ldb_row = ldb_ref[pl.ds(t >> 1, 1), :]
            ldb16 = ldb_row + jnp.zeros((TROWS, 128), jnp.int32)
            base = jnp.take_along_axis(ldb16, (t & 1) * 64 + lane_local,
                                       axis=1)
            dsts = base + exc

            lit_i = is_lit.astype(jnp.int32)
            prev_lit = (pltpu.roll(lit_i, 1, 1) > 0) & ((iota_c16 & 31) > 0)
            run_start = is_lit & ~prev_lit
            _, lit_inc = _seg_cumsums(lit_i, iota_c16)
            nxt_lit = (pltpu.roll(lit_i, 127, 1) > 0) & ((iota_c16 & 31) < 31)
            run_end = is_lit & ~nxt_lit
            # nearest run end at/after each slot (suffix-min of end indices
            # within the 32-slot segment) — a suffix-max of counts would
            # pick a LATER run's end and fabricate overlapping runs
            segpos = iota_c16 & 31
            sfx = jnp.where(run_end, segpos, 32)
            for sh in (1, 2, 4, 8, 16):
                y = pltpu.roll(sfx, 128 - sh, 1)
                sfx = jnp.minimum(sfx, jnp.where(segpos <= 31 - sh, y, 32))
            run_len = sfx - segpos + 1

            # long-overlap matches (128 < dist < len) emit TWO consecutive
            # pieces: [0,dist) from src, [dist,len) also from src — both
            # plain copies, so the batch fetch needs no wrap round
            is_split = is_m & (dist > 128) & (mlen > dist)
            is_item = run_start | is_m
            npieces = jnp.where(is_split, 2, is_item.astype(jnp.int32))
            ringbase = (t % RING_SLOTS) * TSLOTS

            ii = npieces
            _, rinc = _row_cumsums(ii, iota_c16)
            rowtot = rinc[:, 127:128]
            lo = jnp.zeros_like(iota_c16)
            for sh in (64, 32, 16, 8, 4, 2, 1):
                cand = lo + sh
                v = jnp.take_along_axis(rinc, jnp.clip(cand - 1, 0, 127),
                                        axis=1)
                lo = jnp.where((cand <= 127) & (v <= iota_c16), cand, lo)
            qmask = iota_c16 < rowtot
            rexc = rinc - ii
            piece = iota_c16 - jnp.take_along_axis(
                rexc, lo, axis=1)                         # 0 or 1

            def gat(f):
                return jnp.where(qmask,
                                 jnp.take_along_axis(f, lo, axis=1), 0)

            g_dst = gat(dsts)
            g_runstart = gat(run_start.astype(jnp.int32)) > 0
            g_runlen = gat(run_len)
            g_mlen = gat(mlen)
            g_dist = gat(dist)
            g_flat = gat(flat16)
            g_split = gat(is_split.astype(jnp.int32)) > 0

            p2 = g_split & (piece > 0)
            cf_dst = jnp.where(p2, g_dst + g_dist, g_dst)
            cf_w = jnp.where(g_runstart, g_runlen,
                             jnp.where(g_split,
                                       jnp.where(p2, g_mlen - g_dist,
                                                 g_dist),
                                       g_mlen))
            cf_src = jnp.where(g_runstart, ringbase + g_flat,
                               g_dst - g_dist)
            cf_per = jnp.where(g_runstart | g_split, CONSEC, g_dist)
            cf_spc = jnp.where(g_runstart, 1, 0)
            cf = [cf_dst | (cf_spc << 26), cf_w | (cf_per << 9), cf_src]

            # ---- append compacted rows via a register-carried partial
            # row: merges are pure vector ops, queue stores are plain
            # writes (last-write-wins keeps the partial row consistent)
            def append_row(r, qtail, part):
                cnt_r = jnp.sum(rowtot[r:r + 1, :])
                qpos = qtail & 127
                qr = (qtail >> 7) & (QROWS - 1)
                fullr = qpos + cnt_r >= 128
                npart = []
                for fi in range(NQF):
                    rowv = cf[fi][r:r + 1, :]
                    rolled = pltpu.roll(rowv, qpos, 1)
                    sel = (iota1 >= qpos) & (iota1 < qpos + cnt_r)
                    pfull = jnp.where(sel, rolled, part[fi])
                    qv[pl.ds(fi * QROWS + qr, 1), :] = pfull
                    wrap = jnp.where(iota1 < qpos + cnt_r - 128, rolled, 0)
                    npart.append(jnp.where(fullr, wrap, pfull))
                return qtail + cnt_r, npart

            # adversarial guard: >128 pieces in one 128-slot row cannot be
            # compacted (rank overflow) — flag and let the caller fall back
            err = err + jnp.where(jnp.max(rowtot) > 128, 1, 0)
            for r in range(TROWS):
                qtail, part = append_row(r, qtail, part)
            # flush the in-flight partial row so the next drain sees it
            qr = (qtail >> 7) & (QROWS - 1)
            for fi in range(NQF):
                qv[pl.ds(fi * QROWS + qr, 1), :] = part[fi]
            return qhead, qtail, lastflush, err, tuple(part)

    part0 = tuple(jnp.zeros((1, 128), jnp.int32) for _ in range(NQF))
    qhead, qtail, lastflush, err, _ = jax.lax.fori_loop(
        0, ntiles, tile_body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0), part0))
    qhead, err = drain(qhead, qtail, err, True)
    err_ref[0, 0] = err


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def _expand_tokens_impl(tok_lm: jnp.ndarray, outlen: jnp.ndarray,
                        halo: jnp.ndarray, out_cap: int,
                        interpret: bool = False):
    """Expand lane-major walk tokens into output bytes (v4 MXU engine).

    tok_lm: (L, 32) u32 raw walk tokens (ops/walk.py format; no run
    annotation needed — runs are detected in-kernel).
    outlen: (L,) i32 per-lane output bytes.
    halo: (HALO,) u8 history.
    Returns (out (out_cap,) u8, produced i32, kerr i32, dbg).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = tok_lm.shape[0]
    Lpad = -(-L // LANES_PER_CHUNK) * LANES_PER_CHUNK
    ntiles = Lpad // 64

    laneoff = HALO + jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(outlen)])
    produced = laneoff[L] - HALO
    ldb = jnp.concatenate(
        [laneoff[:L], jnp.broadcast_to(laneoff[L], (Lpad - L,))])
    ldb2d = ldb.reshape(-1, 128)

    tokp = jnp.zeros((Lpad, 32), jnp.uint32).at[:L].set(tok_lm)
    tok2d = jax.lax.bitcast_convert_type(tokp, jnp.int32).reshape(-1, 128)

    RB = HALO_ROWS + -(-out_cap // 128) + 64
    RB = -(-RB // 16) * 16
    RB = max(RB, WROWS + 16)
    b0 = jnp.zeros(RB * 128, jnp.uint8).at[:HALO].set(halo)
    b0 = b0.reshape(RB, 128).astype(jnp.bfloat16)

    bo, errv, dbg = pl.pallas_call(
        _expand3_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # ntiles
            pl.BlockSpec(memory_space=pltpu.VMEM),        # lane dst bases
            pl.BlockSpec(memory_space=pltpu.ANY),         # tokens (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),        # b0 (aliased)
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((RB, 128), jnp.bfloat16),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32),
                   jax.ShapeDtypeStruct((48, 128), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((2 * CHROWS, 128), jnp.int32),      # token chunks
            pltpu.VMEM((RING_ROWS, 128), jnp.bfloat16),    # literal ring
            pltpu.VMEM((NQF * QROWS, 128), jnp.int32),     # item queue
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.full((1,), ntiles, jnp.int32), ldb2d, tok2d, b0)

    out = bo.astype(jnp.uint8).reshape(-1)[HALO:HALO + out_cap]
    return out, produced, errv[0, 0], dbg


def expand_tokens(tok_lm, outlen, halo, out_cap: int,
                  interpret: bool = False):
    out, produced, err, _ = _expand_tokens_impl(tok_lm, outlen, halo,
                                                out_cap, interpret)
    return out, produced, err


def expand_tokens_dbg(tok_lm, outlen, halo, out_cap: int,
                      interpret: bool = False):
    return _expand_tokens_impl(tok_lm, outlen, halo, out_cap, interpret)
