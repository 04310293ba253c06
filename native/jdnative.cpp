// Native host-side DEFLATE inflator + stream indexer for jdeflate-tpu.
//
// Role (SURVEY.md §2.4): the reference's throughput-critical host loops are
// hand-optimized C (decodefast, src/inflator.c:1529-1823). In this framework
// the *device* (Pallas/XLA wavefront) is the decode hot path for indexed
// streams; this native module covers the two host-side jobs that remain
// serial by nature:
//   1. conformance inflate of arbitrary/foreign streams (full validity
//      matrix, dictionary support), and
//   2. indexing: one sequential pass that records every block's bit offset,
//      type, symbol start, output span and code lengths so the TPU decoder
//      can then process all blocks in parallel.
// Written from scratch (canonical per-length first-code decode with a
// single-level 10-bit fast table); not a translation of the reference.
//
// Built as a shared library; Python binds via ctypes (no pybind11 in image).

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

using u8 = uint8_t;
using u32 = uint32_t;
using u64 = uint64_t;
using i64 = int64_t;

// error codes (mirror utils/errors.py taxonomy)
enum {
  JD_OK = 0,
  JD_EBADCODE = -1,
  JD_EBADTREE = -2,
  JD_EFAROFFSET = -3,
  JD_EBADBLOCK = -4,
  JD_EINPUTEND = -5,
  JD_EOUTCAP = -6,
  JD_EBLOCKCAP = -7,
};

struct BitReader {
  const u8* data;
  size_t nbytes;
  size_t pos;        // byte position of next refill
  u64 buf;
  int nbits;         // valid bits in buf

  void init(const u8* d, size_t n, size_t bitpos) {
    data = d;
    nbytes = n;
    pos = bitpos >> 3;
    buf = 0;
    nbits = 0;
    int skip = (int) (bitpos & 7);
    if (skip) {
      if (pos >= nbytes) { nbits = -1; return; }
      buf = data[pos++] >> skip;
      nbits = 8 - skip;
    }
  }
  // ensure >= n bits (n <= 57)
  bool fill(int n) {
    while (nbits < n) {
      if (pos >= nbytes) return false;
      buf |= (u64) data[pos++] << nbits;
      nbits += 8;
    }
    return true;
  }
  i64 bit_position() const { return (i64) pos * 8 - nbits; }
  u32 peek(int n) const { return (u32) (buf & ((1u << n) - 1)); }
  void drop(int n) { buf >>= n; nbits -= n; }
  bool read(int n, u32* v) {
    if (!fill(n)) return false;
    *v = (u32) (buf & (((u64) 1 << n) - 1));
    drop(n);
    return true;
  }
  void align_byte() {
    int k = nbits & 7;
    drop(k);
  }
};

struct Huff {
  // canonical decode: count[l], first_code[l], symbol table sorted by (l,code)
  u32 count[16];
  u32 first[16];
  u32 offset[16];
  uint16_t syms[320];
  int max_len;
  // fast table: 10-bit LSB-first window -> (sym << 4 | len), 0 = miss
  uint16_t fast[1024];

  // returns JD_OK / JD_EBADTREE; incomplete allowed iff allow_single && m<=1
  int build(const u8* lens, int n, bool allow_single) {
    memset(count, 0, sizeof(count));
    int m = 0;
    max_len = 0;
    for (int i = 0; i < n; i++) {
      if (lens[i]) {
        count[lens[i]]++;
        m++;
        if (lens[i] > max_len) max_len = lens[i];
      }
    }
    long left = 1;
    for (int l = 1; l < 16; l++) {
      left = (left << 1) - count[l];
      if (left < 0) return JD_EBADTREE;
    }
    if (left > 0 && !(allow_single && m <= 1)) return JD_EBADTREE;
    u32 code = 0, off = 0;
    for (int l = 1; l < 16; l++) {
      first[l] = code;
      offset[l] = off;
      code = (code + count[l]) << 1;
      off += count[l];
    }
    u32 idx[16];
    memcpy(idx, offset, sizeof(idx));
    for (int i = 0; i < n; i++)
      if (lens[i]) syms[idx[lens[i]]++] = (uint16_t) i;
    // fast table (LSB-first reversed codes)
    memset(fast, 0, sizeof(fast));
    u32 c2[16];
    memcpy(c2, first, sizeof(c2));
    for (int l = 1; l <= 10 && l < 16; l++) {
      for (u32 k = 0; k < count[l]; k++) {
        u32 code_msb = first[l] + k;
        u32 rev = 0;
        for (int b = 0; b < l; b++) rev |= ((code_msb >> b) & 1) << (l - 1 - b);
        uint16_t entry = (uint16_t) ((syms[offset[l] + k] << 4) | l);
        for (u32 t = rev; t < 1024; t += (1u << l)) fast[t] = entry;
      }
    }
    return JD_OK;
  }

  // decode one symbol; returns symbol or negative error
  int decode(BitReader& br) {
    if (br.fill(15)) {
      u32 e = fast[br.peek(10)];
      if (e) {
        br.drop(e & 15);
        return e >> 4;
      }
      // slow path: >10-bit codes
      u32 code = 0;
      u64 w = br.buf;
      for (int l = 1; l <= max_len; l++) {
        code = (code << 1) | (u32) (w & 1);
        w >>= 1;
        if (l > 10 && code - first[l] < count[l]) {
          br.drop(l);
          return syms[offset[l] + code - first[l]];
        }
        if (l <= 10) continue;
      }
      return JD_EBADCODE;
    }
    // near end of stream: bit-by-bit with exact bounds
    u32 code = 0;
    for (int l = 1; l <= max_len; l++) {
      u32 b;
      if (!br.read(1, &b)) return JD_EINPUTEND;
      code = (code << 1) | b;
      if (code - first[l] < count[l]) return syms[offset[l] + code - first[l]];
    }
    return JD_EBADCODE;
  }
};

const uint16_t LBASE[29] = {3,4,5,6,7,8,9,10,11,13,15,17,19,23,27,31,35,43,51,
                            59,67,83,99,115,131,163,195,227,258};
const u8 LEXTRA[29] = {0,0,0,0,0,0,0,0,1,1,1,1,2,2,2,2,3,3,3,3,4,4,4,4,5,5,5,
                       5,0};
const uint16_t DBASE[30] = {1,2,3,4,5,7,9,13,17,25,33,49,65,97,129,193,257,385,
                            513,769,1025,1537,2049,3073,4097,6145,8193,12289,
                            16385,24577};
const u8 DEXTRA[30] = {0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,6,7,7,8,8,9,9,10,10,11,
                       11,12,12,13,13};
const u8 PORDER[19] = {16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1,15};

struct BlockMeta {
  i64 bit_offset;
  i64 btype;
  i64 bfinal;
  i64 out_offset;
  i64 out_len;
  i64 sym_bit;
  i64 lens_off;   // offset into lengths buffer
  i64 hlit;
  i64 hdist;
  i64 anch_off;   // offset into anchors buffer (-1 if none recorded)
  i64 n_anch;     // anchors recorded for this block
};

int build_fixed(Huff& lit, Huff& dist) {
  u8 ll[288], dl[32];
  for (int i = 0; i < 144; i++) ll[i] = 8;
  for (int i = 144; i < 256; i++) ll[i] = 9;
  for (int i = 256; i < 280; i++) ll[i] = 7;
  for (int i = 280; i < 288; i++) ll[i] = 8;
  for (int i = 0; i < 32; i++) dl[i] = 5;
  int r = lit.build(ll, 288, false);
  if (r) return r;
  return dist.build(dl, 32, false);
}

}  // namespace

extern "C" {

// Parse one block header (no symbol decode) at an absolute bit position.
//   ll: 288 bytes out (litlen code lengths), dl: 32 bytes out.
//   info out: [btype, bfinal, hlit, hdist, sym_bit, stored_len]
// Returns JD_OK or negative error.
int jd_parse_header(const u8* src, size_t srclen, i64 bit, u8* ll, u8* dl,
                    i64* info) {
  BitReader br;
  br.init(src, srclen, (size_t) bit);
  u32 bfinal, btype;
  if (!br.read(1, &bfinal) || !br.read(2, &btype)) return JD_EINPUTEND;
  info[0] = btype;
  info[1] = bfinal;
  info[2] = 0;
  info[3] = 0;
  info[5] = 0;
  if (btype == 3) return JD_EBADBLOCK;
  if (btype == 0) {
    br.align_byte();
    u32 ln, nln;
    if (!br.read(16, &ln) || !br.read(16, &nln)) return JD_EINPUTEND;
    if ((ln ^ nln) != 0xFFFF) return JD_EBADBLOCK;
    info[4] = br.bit_position();
    info[5] = ln;
    return JD_OK;
  }
  if (btype == 1) {
    for (int i = 0; i < 144; i++) ll[i] = 8;
    for (int i = 144; i < 256; i++) ll[i] = 9;
    for (int i = 256; i < 280; i++) ll[i] = 7;
    for (int i = 280; i < 288; i++) ll[i] = 8;
    for (int i = 0; i < 32; i++) dl[i] = 5;
    info[2] = 288;
    info[3] = 32;
    info[4] = br.bit_position();
    return JD_OK;
  }
  u32 hlit, hdist, hclen;
  if (!br.read(5, &hlit) || !br.read(5, &hdist) || !br.read(4, &hclen))
    return JD_EINPUTEND;
  hlit += 257; hdist += 1; hclen += 4;
  if (hlit > 286 || hdist > 30) return JD_EBADTREE;
  u8 plens[19];
  memset(plens, 0, sizeof(plens));
  for (u32 i = 0; i < hclen; i++) {
    u32 v;
    if (!br.read(3, &v)) return JD_EINPUTEND;
    plens[PORDER[i]] = (u8) v;
  }
  Huff pre;
  int r = pre.build(plens, 19, false);
  if (r) return r;
  u8 cl[288 + 30];
  memset(cl, 0, sizeof(cl));
  u32 i = 0;
  while (i < hlit + hdist) {
    int s = pre.decode(br);
    if (s < 0) return s;
    if (s < 16) {
      cl[i++] = (u8) s;
    } else if (s == 16) {
      if (i == 0) return JD_EBADTREE;
      u32 r2;
      if (!br.read(2, &r2)) return JD_EINPUTEND;
      u32 rep = 3 + r2;
      if (i + rep > hlit + hdist) return JD_EBADTREE;
      u8 prev = cl[i - 1];
      while (rep--) cl[i++] = prev;
    } else {
      u32 r2;
      if (s == 17) { if (!br.read(3, &r2)) return JD_EINPUTEND; r2 += 3; }
      else { if (!br.read(7, &r2)) return JD_EINPUTEND; r2 += 11; }
      if (i + r2 > hlit + hdist) return JD_EBADTREE;
      while (r2--) cl[i++] = 0;
    }
  }
  if (cl[256] == 0) return JD_EBADTREE;
  memcpy(ll, cl, hlit);
  memset(ll + hlit, 0, 288 - hlit);
  memcpy(dl, cl + hlit, hdist);
  memset(dl + hdist, 0, 32 - hdist);
  info[2] = hlit;
  info[3] = hdist;
  info[4] = br.bit_position();
  return JD_OK;
}

// Inflate (and optionally index) a raw DEFLATE stream.
//   src/srclen: compressed stream; start_bit: first block's bit offset.
//   dict/dictlen: preset window history.
//   dst/dstcap: output buffer; *dstlen <- produced bytes.
//   meta/metacap: optional per-block records; *nblocks <- count.
//   lens/lenscap: optional code-length dump (u8), rows per meta.lens_off.
//   anchors/anchcap: optional per-block symbol anchors (bit position of every
//     64th symbol, ordinals 65, 129, ... — the same contract the encoder's
//     index uses, so indexed foreign streams take the exact anchored decode
//     path on device with no speculation).
//   *end_bit <- bit position after the final block.
//   partial: if nonzero, a truncated input is not an error — decoding stops
//     at the last COMPLETE block boundary, *dstlen/*end_bit report progress,
//     and the return value is 1 ("more input needed"). This is the native
//     substrate for bounded-memory streaming inflate below member
//     granularity (the reference drives a 32 KiB window the same way,
//     /root/reference/src/zstrm.c:792-958).
// Returns JD_OK, 1 (partial), or a negative error.
// Batched header parse: n blocks at absolute bit positions bits[0..n).
// Outputs are strided: ll 288*n, dl 32*n, info 6*n; status[k] gets the
// per-block JD_* code. One native call replaces n (decodednmc analog,
// /root/reference/src/inflator.c:1103-1190, run once per block there).
// Always returns JD_OK; the caller inspects status.
int jd_parse_headers(const u8* src, size_t srclen, const i64* bits, i64 n,
                     u8* ll, u8* dl, i64* info, int* status) {
  for (i64 k = 0; k < n; k++) {
    status[k] = jd_parse_header(src, srclen, bits[k], ll + 288 * k,
                                      dl + 32 * k, info + 6 * k);
  }
  return JD_OK;
}

int jd_inflate(const u8* src, size_t srclen, i64 start_bit,
               const u8* dict, size_t dictlen,
               u8* dst, size_t dstcap, size_t* dstlen,
               BlockMeta* meta, size_t metacap, size_t* nblocks,
               u8* lens, size_t lenscap, i64* end_bit,
               i64* anchors, size_t anchcap, size_t* nanchors,
               int partial = 0) {
  BitReader br;
  br.init(src, srclen, (size_t) start_bit);
  size_t out = 0;
  size_t nblk = 0;
  size_t lens_used = 0;
  size_t anch_used = 0;
  // history: dict occupies virtual positions [-dictlen, 0)
  for (;;) {
    u32 bfinal, btype;
    i64 hdr_bit = br.bit_position();
    size_t ckpt_out = out;
#define JD_FAILV(v) \
    do { \
      if (partial && (v) == JD_EINPUTEND) { \
        if (dstlen) *dstlen = ckpt_out; \
        if (nblocks) *nblocks = nblk; \
        if (end_bit) *end_bit = hdr_bit; \
        return 1; \
      } \
      return (v); \
    } while (0)
#define JD_FAIL(code) \
    do { \
      if (partial && (code) == JD_EINPUTEND) { \
        if (dstlen) *dstlen = ckpt_out; \
        if (nblocks) *nblocks = nblk; \
        if (end_bit) *end_bit = hdr_bit; \
        return 1; \
      } \
      return (code); \
    } while (0)
    if (!br.read(1, &bfinal) || !br.read(2, &btype)) JD_FAIL(JD_EINPUTEND);
    BlockMeta bm;
    bm.bit_offset = hdr_bit;
    bm.btype = btype;
    bm.bfinal = bfinal;
    bm.out_offset = (i64) out;
    bm.lens_off = -1;
    bm.hlit = 0;
    bm.hdist = 0;
    bm.anch_off = -1;
    bm.n_anch = 0;
    if (btype == 3) return JD_EBADBLOCK;
    if (btype == 0) {
      br.align_byte();
      u32 ln, nln;
      if (!br.read(16, &ln) || !br.read(16, &nln)) JD_FAIL(JD_EINPUTEND);
      if ((ln ^ nln) != 0xFFFF) return JD_EBADBLOCK;
      bm.sym_bit = br.bit_position();
      if (out + ln > dstcap) return JD_EOUTCAP;
      // stored payload is byte-aligned
      size_t p = (size_t) (bm.sym_bit >> 3);
      if (p + ln > srclen) JD_FAIL(JD_EINPUTEND);
      memcpy(dst + out, src + p, ln);
      out += ln;
      br.init(src, srclen, (size_t) (bm.sym_bit + 8 * (i64) ln));
      bm.out_len = ln;
    } else {
      Huff lit, dist;
      if (btype == 1) {
        int r = build_fixed(lit, dist);
        if (r) return r;
        bm.sym_bit = br.bit_position();
      } else {
        u32 hlit, hdist, hclen;
        if (!br.read(5, &hlit) || !br.read(5, &hdist) || !br.read(4, &hclen))
          JD_FAIL(JD_EINPUTEND);
        hlit += 257; hdist += 1; hclen += 4;
        if (hlit > 286 || hdist > 30) return JD_EBADTREE;
        u8 plens[19];
        memset(plens, 0, sizeof(plens));
        for (u32 i = 0; i < hclen; i++) {
          u32 v;
          if (!br.read(3, &v)) JD_FAIL(JD_EINPUTEND);
          plens[PORDER[i]] = (u8) v;
        }
        Huff pre;
        int r = pre.build(plens, 19, false);
        if (r) return r;
        u8 cl[288 + 30];
        u32 i = 0;
        while (i < hlit + hdist) {
          int s = pre.decode(br);
          if (s < 0) JD_FAILV(s);
          if (s < 16) {
            cl[i++] = (u8) s;
          } else if (s == 16) {
            if (i == 0) return JD_EBADTREE;
            u32 r2;
            if (!br.read(2, &r2)) JD_FAIL(JD_EINPUTEND);
            u32 rep = 3 + r2;
            if (i + rep > hlit + hdist) return JD_EBADTREE;
            u8 prev = cl[i - 1];
            while (rep--) cl[i++] = prev;
          } else {
            u32 r2;
            if (s == 17) { if (!br.read(3, &r2)) JD_FAIL(JD_EINPUTEND); r2 += 3; }
            else { if (!br.read(7, &r2)) JD_FAIL(JD_EINPUTEND); r2 += 11; }
            if (i + r2 > hlit + hdist) return JD_EBADTREE;
            while (r2--) cl[i++] = 0;
          }
        }
        if (cl[256] == 0) return JD_EBADTREE;
        r = lit.build(cl, (int) hlit, false);
        if (r) return r;
        r = dist.build(cl + hlit, (int) hdist, true);
        if (r) return r;
        bm.sym_bit = br.bit_position();
        if (lens && lens_used + hlit + hdist <= lenscap) {
          bm.lens_off = (i64) lens_used;
          bm.hlit = hlit;
          bm.hdist = hdist;
          memcpy(lens + lens_used, cl, hlit + hdist);
          lens_used += hlit + hdist;
        }
      }
      // symbol loop; window anchors: for every 32-bit window of the grid
      // anchored at sym_bit & ~31, the bit offset of the first symbol
      // starting in it (-1 if one symbol spans the whole window) — the
      // walk-kernel lane entry points (ops/walk.py)
      i64 org = bm.sym_bit & ~(i64) 31;
      if (anchors) bm.anch_off = (i64) anch_used;
      for (;;) {
        if (anchors) {
          i64 b = br.bit_position();
          i64 w = (b - org) >> 5;
          while (bm.n_anch < w && anch_used < anchcap) {
            anchors[anch_used++] = -1;
            bm.n_anch++;
          }
          if (bm.n_anch == w && anch_used < anchcap) {
            anchors[anch_used++] = b;
            bm.n_anch++;
          }
        }
        int s = lit.decode(br);
        if (s < 0) JD_FAILV(s);
        if (s < 256) {
          if (out >= dstcap) return JD_EOUTCAP;
          dst[out++] = (u8) s;
        } else if (s == 256) {
          break;
        } else {
          if (s > 285) return JD_EBADCODE;
          u32 ext;
          if (!br.read(LEXTRA[s - 257], &ext)) JD_FAIL(JD_EINPUTEND);
          u32 len = LBASE[s - 257] + ext;
          int d = dist.decode(br);
          if (d < 0) JD_FAILV(d);
          if (d > 29) return JD_EBADCODE;
          if (!br.read(DEXTRA[d], &ext)) JD_FAIL(JD_EINPUTEND);
          u32 distv = DBASE[d] + ext;
          if (distv > out + dictlen) return JD_EFAROFFSET;
          if (out + len > dstcap) return JD_EOUTCAP;
          if (distv <= out) {
            const u8* s2 = dst + out - distv;
            u8* dp = dst + out;
            for (u32 k = 0; k < len; k++) dp[k] = s2[k];  // overlap-safe fwd
          } else {
            // partially (or fully) from the dictionary
            size_t from_dict = distv - out;
            const u8* s2 = dict + dictlen - from_dict;
            u8* dp = dst + out;
            u32 k = 0;
            for (; k < len && k < from_dict; k++) dp[k] = s2[k];
            for (; k < len; k++) dp[k] = dst[out - distv + k];
          }
          out += len;
        }
      }
      bm.out_len = (i64) out - bm.out_offset;
    }
    if (meta) {
      if (nblk >= metacap) return JD_EBLOCKCAP;
      meta[nblk] = bm;
    }
    nblk++;
    if (bfinal) break;
  }
  if (dstlen) *dstlen = out;
  if (nblocks) *nblocks = nblk;
  if (end_bit) *end_bit = br.bit_position();
  return JD_OK;
}

}  // extern "C"
