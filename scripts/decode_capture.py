"""Shared helper: reconstruct device-side decode-stage inputs from a
RawInflater capture, for per-kernel timing (bench + jobs).

The capture (RawInflater.capture_calls) records the exact args of every
windowed dispatch; this rebuilds the walk inputs and lane-major tokens for
one batch so each stage (walk / expansion engines) can be timed in
isolation with scripts/devtime.py.
"""
from __future__ import annotations

import numpy as np


def walk_inputs_from_call(call):
    """One captured windowed-dispatch -> dict of stage inputs."""
    import jax
    import jax.numpy as jnp
    from jdeflate_tpu.ops import walk as wk

    (words_full, metas_dev, row, win, npe, nb, oc, wwords, up, engine) = call
    meta = np.asarray(metas_dev)[int(row)]
    PE = wk.PE_LANES
    o = 2
    word_lo = int(meta[0])
    pe_word0 = jnp.asarray(meta[o:o + npe]); o += npe
    pe_tab = jnp.asarray(meta[o:o + npe]); o += npe
    alanes = jnp.asarray(meta[o:o + npe * PE].reshape(npe, PE)); o += npe * PE
    ll = jnp.asarray(meta[o:o + nb * 288].reshape(nb, 288)); o += nb * 288
    dl = jnp.asarray(meta[o:o + nb * 32].reshape(nb, 32))
    words = jax.lax.dynamic_slice(words_full, (word_lo,), (wwords,))
    t1, t2a, t2b, t2c = wk.build_entry_tables(ll, dl)

    def rows(tab):
        p = jnp.take(tab, pe_tab, axis=0)
        return jnp.broadcast_to(
            p[:, None, :], (npe, wk.PE_ROWS, 128)).reshape(-1, 128)

    seg = jax.vmap(lambda s: jax.lax.dynamic_slice(
        words, (s,), (PE + 8,)))(jnp.maximum(pe_word0, 0))
    lanebit = (jnp.maximum(pe_word0, 0)[:, None]
               + jnp.arange(PE, dtype=jnp.int32)[None, :]) * 32
    start_rel = jnp.where(alanes >= 0, alanes - lanebit,
                          -1).astype(jnp.int32)
    return {
        "seg0": seg[:, 0:PE].reshape(-1, 128),
        "seg1": seg[:, 1:PE + 1].reshape(-1, 128),
        "seg2": seg[:, 2:PE + 2].reshape(-1, 128),
        "start_rel": start_rel.reshape(-1, 128),
        "t1r": rows(t1), "t2ar": rows(t2a), "t2br": rows(t2b),
        "t2cr": rows(t2c),
        "nrows": npe * wk.PE_ROWS, "oc": oc, "win": win,
    }


def tok_lm_from_walk(wi):
    """Run the walk on reconstructed inputs -> (tok_lm, outlen)."""
    import jax.numpy as jnp
    from jdeflate_tpu.ops import walk as wk

    tok, meta = wk.walk_tpu(wi["seg0"], wi["seg1"], wi["seg2"],
                            wi["start_rel"], wi["t1r"], wi["t2ar"],
                            wi["t2br"], wi["t2cr"], wi["nrows"])
    tok_lm = wk.tok_to_lane_major(tok, wi["nrows"])
    kind = (tok_lm >> 30).astype(jnp.int32)
    ln = jnp.where(kind == wk.TOK_LIT, 1,
                   jnp.where(kind == wk.TOK_MATCH,
                             (tok_lm & 0x1FF).astype(jnp.int32), 0))
    return tok_lm, jnp.sum(ln, axis=1)


def capture_decode_sets(enc, dec, variants):
    """Encode+decode each variant with capture on; returns the first
    windowed call of each (list of call tuples)."""
    calls = []
    enc_calls = []
    enc.capture_calls = dec.capture_calls = True
    try:
        for v in variants:
            raw, idx = enc.compress(v)
            out = dec.decompress(raw, index=idx)
            if out != v or not dec.last_calls:
                raise RuntimeError("capture failed")
            calls.append(dec.last_calls[0])
            enc_calls.append(enc.last_calls[0] if enc.last_calls else None)
    finally:
        enc.capture_calls = dec.capture_calls = False
        enc.last_calls = []
        dec.last_calls = []
    return calls, enc_calls
