"""Resolve-kernel ablation: where do 15 us/step go?
Variants: full / no-doubling / doubling-only / no-lane-select / no-ohbuild.
Uses a frozen copy of the kernel with feature flags; timings on the real
P plan of the bench batch (correctness irrelevant for disabled variants).
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import functools
import numpy as np
import jax
import jax.numpy as jnp
from bench import make_corpus
from devtime import measure_cycled
from jdeflate_tpu.codec.deflate import RawDeflater
from jdeflate_tpu.codec import inflate as I
from jdeflate_tpu.codec.inflate import RawInflater
from jdeflate_tpu.ops import walk as wk
from jdeflate_tpu.ops import expand5 as ex5
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = ex5.HALO
STEP = ex5.STEP
STEP_ROWS = ex5.STEP_ROWS
CHUNK_ROWS = ex5.CHUNK_ROWS
STEPS_PER_CHUNK = ex5.STEPS_PER_CHUNK
WR = ex5.WR
PADF_ROWS = ex5.PADF_ROWS
HALO_ROWS = ex5.HALO_ROWS
V_VALID = ex5.V_VALID
V_LIT = ex5.V_LIT
DBL = ex5.DBL_ROUNDS


def make_resolve(dbl_rounds, do_gather, do_select, fixed_rounds):
    def kern(halo_ref, p_ref, out_ref, err_ref, stage):
        c = pl.program_id(0)
        base_row = PADF_ROWS + HALO_ROWS + c * CHUNK_ROWS

        @pl.when(c == 0)
        def _init():
            stage[:, :] = jnp.zeros(stage.shape, jnp.bfloat16)
            stage[pl.ds(PADF_ROWS, HALO_ROWS), :] = halo_ref[:, :].astype(
                jnp.int32).astype(jnp.bfloat16)
            err_ref[0, 0] = 0

        lanei = jax.lax.broadcasted_iota(jnp.int32, (STEP_ROWS, 128), 1)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (STEP_ROWS, 128), 0)
        wiota3 = jax.lax.broadcasted_iota(jnp.int32, (STEP_ROWS, 128, WR), 2)
        siota3 = jax.lax.broadcasted_iota(
            jnp.int32, (STEP_ROWS, 128, STEP_ROWS), 2)
        giota3 = jax.lax.broadcasted_iota(jnp.int32, (STEP_ROWS, 128, 128), 2)

        def row_onehot(srel, width, iota3):
            oh3 = jnp.where(srel[:, :, None] == iota3, 1, 0).astype(
                jnp.bfloat16)
            return oh3.reshape(STEP, width)

        def lane_select(g, lane_idx):
            g3 = g.reshape(STEP_ROWS, 128, 128)
            return jnp.sum(
                jnp.where(lane_idx[:, :, None] == giota3, g3, 0), axis=2)

        def step(s, err):
            srow = base_row + s * STEP_ROWS
            sbase = (c * CHUNK_ROWS + s * STEP_ROWS) * 128
            P = p_ref[pl.ds(s * STEP_ROWS, STEP_ROWS), :]
            pos = sbase + rowi * 128 + lanei
            valid = (P & V_VALID) != 0
            is_lit = valid & ((P & V_LIT) != 0)
            is_m = valid & ~is_lit
            lit = P & 0xFF
            d = (P & 0x7FFF) + 1
            phase = (P >> 15) & 0x1FF
            q = jnp.floor(phase.astype(jnp.float32)
                          / d.astype(jnp.float32)).astype(jnp.int32)
            rr = phase - q * d
            rr = jnp.where(rr < 0, rr + d, rr)
            rr = jnp.where(rr >= d, rr - d, rr)
            src = pos - phase - d + jnp.where(phase < d, phase, rr)
            stage[pl.ds(srow, STEP_ROWS), :] = jnp.where(
                is_lit, lit, 0).astype(jnp.bfloat16)
            OFF0 = sbase - (WR - STEP_ROWS) * 128
            cur0 = jnp.where(is_m, jnp.maximum(src, OFF0), pos)

            def d_cond(carry):
                _, changed, it = carry
                return (changed > 0) & (it < dbl_rounds)

            def d_body(carry):
                cur, _, it = carry
                qrel = cur - sbase
                intra = qrel >= 0
                qrow = jnp.clip(qrel, 0, STEP - 1) >> 7
                oh = row_onehot(qrow, STEP_ROWS, siota3)
                coff = cur - OFF0
                plo = (coff & 0xFF).astype(jnp.bfloat16)
                phi = (coff >> 8).astype(jnp.bfloat16)
                glo = jax.lax.dot_general(
                    oh, plo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ghi = jax.lax.dot_general(
                    oh, phi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                gcomb = (ghi * 256.0 + glo).astype(jnp.int32)
                if do_select:
                    vv = lane_select(gcomb, qrel & 127)
                else:
                    vv = gcomb.reshape(STEP_ROWS, 128, 128)[:, :, 0]
                ncur = jnp.where(intra, vv + OFF0, cur)
                ch = jnp.sum((ncur != cur).astype(jnp.int32))
                return ncur, ch, it + 1

            if fixed_rounds:
                def fb(i, cur):
                    ncur, _, _ = d_body((cur, jnp.int32(1), jnp.int32(0)))
                    return ncur
                cur = jax.lax.fori_loop(0, dbl_rounds, fb, cur0)
            elif dbl_rounds > 0:
                cur, _, _ = jax.lax.while_loop(
                    d_cond, d_body, (cur0, jnp.int32(1), jnp.int32(0)))
            else:
                cur = cur0

            if do_gather:
                sidx = jnp.clip(cur + PADF_ROWS * 128 + HALO, 0,
                                (srow + STEP_ROWS) * 128 - 1)
                wrow0 = pl.multiple_of(srow - (WR - STEP_ROWS), 8)
                win = stage[pl.ds(wrow0, WR), :]
                srel = jnp.clip((sidx >> 7) - wrow0, 0, WR - 1)
                oh = row_onehot(srel, WR, wiota3)
                g = jax.lax.dot_general(
                    oh, win, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if do_select:
                    vg = lane_select(g.astype(jnp.int32), sidx & 127)
                else:
                    vg = g.astype(jnp.int32).reshape(
                        STEP_ROWS, 128, 128)[:, :, 0]
                val = jnp.where(is_lit, lit, jnp.where(is_m, vg, 0))
            else:
                val = jnp.where(is_lit, lit, cur & 0xFF)
            stage[pl.ds(srow, STEP_ROWS), :] = val.astype(jnp.bfloat16)
            return err

        err = jax.lax.fori_loop(0, STEPS_PER_CHUNK, step, jnp.int32(0))
        err_ref[0, 0] = err_ref[0, 0] + err
        out_ref[:, :] = stage[pl.ds(base_row, CHUNK_ROWS), :].astype(
            jnp.int32).astype(jnp.uint8)
    return kern


def run_variant(kern, P2d, halo, out_cap):
    nchunk = -(-out_cap // (CHUNK_ROWS * 128))
    rows = nchunk * CHUNK_ROWS
    Pp = jnp.zeros((rows, 128), jnp.int32).at[:P2d.shape[0]].set(P2d)
    halo2d = halo.reshape(HALO_ROWS, 128)
    stage_rows = PADF_ROWS + HALO_ROWS + rows + 8
    return pl.pallas_call(
        kern,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_ROWS, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK_ROWS, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.uint8),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((stage_rows, 128), jnp.bfloat16)],
    )(halo2d, Pp)


# ---- real P plan from the bench batch ----
data = make_corpus(8 << 20)
enc = RawDeflater(level=6, block_size=1 << 16, batch=16)
dec = RawInflater(max_batch_bits=1 << 25, max_batch_blocks=256,
                  max_batch_out=1 << 23)
rsets = []
OC = None
for pert in (0, 1):
    d2 = bytearray(data)
    if pert:
        for p in range(100, len(d2), 8192):
            d2[p] ^= 1
    v = bytes(d2)
    r2, i2 = enc.compress(v)
    dec.capture_calls = True
    out = dec.decompress(r2, index=i2)
    assert out == v
    call = dec.last_calls[0]
    (words_full, metas_dev, row, win, npe, nb, oc, wwords, up, engine) = call
    meta = np.asarray(metas_dev)[int(row)]
    PE = wk.PE_LANES
    o = 2
    word_lo, hist = int(meta[0]), int(meta[1])
    pe_word0 = jnp.asarray(meta[o:o + npe]); o += npe
    pe_tab = jnp.asarray(meta[o:o + npe]); o += npe
    alanes = jnp.asarray(meta[o:o + npe * PE].reshape(npe, PE)); o += npe * PE
    ll = jnp.asarray(meta[o:o + nb * 288].reshape(nb, 288)); o += nb * 288
    dl = jnp.asarray(meta[o:o + nb * 32].reshape(nb, 32))
    words = jax.lax.dynamic_slice(words_full, (word_lo,), (wwords,))
    t1, t2a, t2b, t2c = wk.build_entry_tables(ll, dl)
    def rows_(tab):
        p = jnp.take(tab, pe_tab, axis=0)
        return jnp.broadcast_to(
            p[:, None, :], (npe, wk.PE_ROWS, 128)).reshape(-1, 128)
    seg = jax.vmap(lambda s: jax.lax.dynamic_slice(
        words, (s,), (PE + 8,)))(jnp.maximum(pe_word0, 0))
    seg0 = seg[:, 0:PE].reshape(-1, 128)
    seg1 = seg[:, 1:PE + 1].reshape(-1, 128)
    seg2 = seg[:, 2:PE + 2].reshape(-1, 128)
    lanebit = (jnp.maximum(pe_word0, 0)[:, None]
               + jnp.arange(PE, dtype=jnp.int32)[None, :]) * 32
    start_rel = jnp.where(alanes >= 0, alanes - lanebit, -1).astype(jnp.int32)
    nrows = npe * wk.PE_ROWS
    tok, mta = wk.walk_tpu(seg0, seg1, seg2, start_rel.reshape(-1, 128),
                           rows_(t1), rows_(t2a), rows_(t2b), rows_(t2c),
                           nrows)
    tok_lm = wk.tok_to_lane_major(tok, nrows)
    kind2 = (tok_lm >> 30).astype(jnp.int32)
    len2 = jnp.where(kind2 == 1, 1,
                     jnp.where(kind2 == 2,
                               (tok_lm & 0x1FF).astype(jnp.int32), 0))
    outlen = jnp.sum(len2, axis=1)
    off, seed = ex5.slot_attrs(tok_lm, outlen)
    P = ex5.propagate(ex5.seed_scatter_ref(off, seed, oc)).reshape(-1, 128)
    rsets.append((P, win))
    OC = oc

for name, args in [
        ("full", (DBL, True, True, False)),
        ("fixed3_rounds", (3, True, True, True)),
        ("no_doubling", (0, True, True, False)),
        ("dbl_only", (DBL, False, True, False)),
        ("no_lane_select", (DBL, True, False, False)),
        ("gather_only_nosel", (0, True, False, False)),
]:
    kern = make_resolve(*args)
    fn = jax.jit(functools.partial(run_variant, kern, out_cap=OC))
    stage_fn = lambda P, h, fn=fn: fn(P, h)
    t = measure_cycled(rsets, stage_fn, iters=4)
    print(f"{name}: {t*1e3:.2f} ms ({OC/t/1e9:.3f} GB/s)", flush=True)
