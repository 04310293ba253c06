import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, subprocess, zlib
import bench as B
data = B.make_corpus(8 << 20)[: 2 << 20]
oracle = B.build_oracle()
jd9 = B.oracle_size(oracle, data, 9)

from jdeflate_tpu.codec.deflate import RawDeflater
e = RawDeflater(level=9, block_size=1 << 16, batch=16)
ours, _ = e.compress(data)
print("sizes: jd9", len(jd9), "ours", len(ours), f"{len(ours)/len(jd9):.4f}")

# token stats via a python walk of each stream
from jdeflate_tpu.stream import host_inflate as hi
def stats(raw):
    out, recs, _ = hi.inflate_raw(raw)
    assert out == data
    nlit = nmatch = mbytes = 0
    lens = []
    dists = []
    # re-walk decoding symbols per block
    br = hi._BitReader(raw)
    import numpy as np
    for r in recs:
        if r.btype == 0:
            nlit += r.out_len
            continue
        ld = hi._Decoder(r.litlen_lengths)
        dd = hi._Decoder(r.dist_lengths, allow_incomplete_single=True)
        br.pos = r.sym_bit_offset
        from jdeflate_tpu.formats import constants as C
        while True:
            s = ld.decode(br)
            if s == 256:
                break
            if s < 256:
                nlit += 1
            else:
                li = s - 257
                L = int(C.LENGTH_BASE[li]) + br.read(int(C.LENGTH_EXTRA[li]))
                d = dd.decode(br)
                D = int(C.DIST_BASE[d]) + br.read(int(C.DIST_EXTRA[d]))
                nmatch += 1
                mbytes += L
                lens.append(L)
                dists.append(D)
    lens = np.array(lens); dists = np.array(dists)
    hdr_bits = sum((r.sym_bit_offset - r.bit_offset) for r in recs)
    print(f"  blocks={len(recs)} lits={nlit} matches={nmatch} "
          f"match_bytes={mbytes} avg_len={lens.mean():.1f} "
          f"med_dist={np.median(dists):.0f} hdr_bits={hdr_bits}")
print("jd9:"); stats(jd9)
print("ours:"); stats(ours)
