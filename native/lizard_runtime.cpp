// lizard_tpu native host runtime: block/frame decode + xxhash.
//
// Original implementation written against the format semantics pinned by the
// Python oracle (lizard_tpu/ref/*); structured as a cursor-based C++ decoder,
// not a translation of the reference C. Used for host-side IO paths (CLI,
// golden verification) where the TPU round-trip is not wanted.
//
// C ABI:
//   ltpu_xxh32(data, len, seed)            -> u32
//   ltpu_xxh64(data, len, seed)            -> u64
//   ltpu_decompress(src, n, dst, cap)      -> bytes written or -errcode
//   ltpu_frame_decompress(src, n, dst, cap)-> bytes written or -errcode

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ------------------------------------------------------------- xxhash -----

constexpr uint32_t P32_1 = 2654435761u, P32_2 = 2246822519u, P32_3 = 3266489917u,
                   P32_4 = 668265263u, P32_5 = 374761393u;
constexpr uint64_t P64_1 = 11400714785074694791ull, P64_2 = 14029467366897019727ull,
                   P64_3 = 1609587929392839161ull, P64_4 = 9650029242287828579ull,
                   P64_5 = 2870177450012600261ull;

inline uint32_t rotl32(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }
inline uint64_t rotl64(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }

inline uint32_t rd32(const uint8_t* p) {
  uint32_t v; std::memcpy(&v, p, 4); return v;
}
inline uint64_t rd64(const uint8_t* p) {
  uint64_t v; std::memcpy(&v, p, 8); return v;
}
inline uint32_t rd24(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16);
}
inline uint32_t rd16(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8);
}

uint32_t xxh32(const uint8_t* p, size_t n, uint32_t seed) {
  const uint8_t* end = p + n;
  uint32_t h;
  if (n >= 16) {
    uint32_t v1 = seed + P32_1 + P32_2, v2 = seed + P32_2, v3 = seed,
             v4 = seed - P32_1;
    const uint8_t* limit = end - 16;
    do {
      v1 = rotl32(v1 + rd32(p) * P32_2, 13) * P32_1; p += 4;
      v2 = rotl32(v2 + rd32(p) * P32_2, 13) * P32_1; p += 4;
      v3 = rotl32(v3 + rd32(p) * P32_2, 13) * P32_1; p += 4;
      v4 = rotl32(v4 + rd32(p) * P32_2, 13) * P32_1; p += 4;
    } while (p <= limit);
    h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18);
  } else {
    h = seed + P32_5;
  }
  h += (uint32_t)n;
  while (p + 4 <= end) { h = rotl32(h + rd32(p) * P32_3, 17) * P32_4; p += 4; }
  while (p < end) { h = rotl32(h + (*p++) * P32_5, 11) * P32_1; }
  h ^= h >> 15; h *= P32_2; h ^= h >> 13; h *= P32_3; h ^= h >> 16;
  return h;
}

uint64_t xxh64(const uint8_t* p, size_t n, uint64_t seed) {
  const uint8_t* end = p + n;
  uint64_t h;
  auto rnd = [](uint64_t acc, uint64_t lane) {
    return rotl64(acc + lane * P64_2, 31) * P64_1;
  };
  if (n >= 32) {
    uint64_t v1 = seed + P64_1 + P64_2, v2 = seed + P64_2, v3 = seed,
             v4 = seed - P64_1;
    const uint8_t* limit = end - 32;
    do {
      v1 = rnd(v1, rd64(p)); p += 8;
      v2 = rnd(v2, rd64(p)); p += 8;
      v3 = rnd(v3, rd64(p)); p += 8;
      v4 = rnd(v4, rd64(p)); p += 8;
    } while (p <= limit);
    h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
    for (uint64_t v : {v1, v2, v3, v4}) { h = (h ^ rnd(0, v)) * P64_1 + P64_4; }
  } else {
    h = seed + P64_5;
  }
  h += n;
  while (p + 8 <= end) { h = rotl64(h ^ rnd(0, rd64(p)), 27) * P64_1 + P64_4; p += 8; }
  if (p + 4 <= end) { h = rotl64(h ^ (rd32(p) * P64_1), 23) * P64_2 + P64_3; p += 4; }
  while (p < end) { h = rotl64(h ^ ((*p++) * P64_5), 11) * P64_1; }
  h ^= h >> 33; h *= P64_2; h ^= h >> 29; h *= P64_3; h ^= h >> 32;
  return h;
}

// ------------------------------------------------------ Huff0 decode ------

struct BitReader {
  // backward bitstream: payload bits below the top set (marker) bit
  const uint8_t* base;
  int64_t bitpos;  // remaining payload bits
  bool bad = false;

  BitReader(const uint8_t* p, size_t n) : base(p) {
    if (n == 0 || p[n - 1] == 0) { bad = true; bitpos = 0; return; }
    int top = 31 - __builtin_clz((uint32_t)p[n - 1]);
    bitpos = (int64_t)(n - 1) * 8 + top;
  }
  uint32_t look(int nbits) const {
    if (nbits == 0) return 0;
    uint32_t v = 0;
    int64_t lo = bitpos - nbits;
    for (int i = 0; i < nbits; ++i) {
      int64_t b = lo + i;
      if (b >= 0) {
        v |= (uint32_t)((base[b >> 3] >> (b & 7)) & 1) << i;
      }
    }
    return v;
  }
  uint32_t read(int nbits) { uint32_t v = look(nbits); bitpos -= nbits; return v; }
  bool exhausted_exactly() const { return bitpos == 0; }
  bool overflowed() const { return bitpos < 0; }
};

struct HufTable {
  uint8_t sym[1 << 12];
  uint8_t bits[1 << 12];
  int table_log = 0;
};

// FSE decode for the Huffman weights header
bool fse_decompress_weights(const uint8_t* src, size_t n, uint8_t* out,
                            int max_out, int* n_out) {
  if (n < 4) return false;
  // NCount parse
  auto getbits = [&](int64_t bit, int cnt) -> uint32_t {
    uint32_t v = 0;
    for (int i = 0; i < cnt; ++i) {
      int64_t b = bit + i;
      size_t byte = (size_t)(b >> 3);
      if (byte < n) v |= (uint32_t)((src[byte] >> (b & 7)) & 1) << i;
    }
    return v;
  };
  int64_t bit = 0;
  int table_log = (int)getbits(0, 4) + 5;
  if (table_log > 15) return false;
  bit = 4;
  int remaining = (1 << table_log) + 1;
  int threshold = 1 << table_log;
  int nbits = table_log + 1;
  int16_t counts[256];
  int ncount = 0;
  bool prev0 = false;
  while (remaining > 1 && ncount <= 255) {
    if (prev0) {
      while (getbits(bit, 16) == 0xFFFF) {
        for (int i = 0; i < 24 && ncount < 256; ++i) counts[ncount++] = 0;
        bit += 16;
      }
      while (getbits(bit, 2) == 3) {
        for (int i = 0; i < 3 && ncount < 256; ++i) counts[ncount++] = 0;
        bit += 2;
      }
      uint32_t r = getbits(bit, 2);
      for (uint32_t i = 0; i < r && ncount < 256; ++i) counts[ncount++] = 0;
      bit += 2;
    }
    int maxv = (2 * threshold - 1) - remaining;
    int count;
    if ((int)getbits(bit, 31 - __builtin_clz(threshold)) < maxv) {
      count = (int)getbits(bit, 31 - __builtin_clz(threshold));
      bit += nbits - 1;
    } else {
      count = (int)getbits(bit, nbits);
      if (count >= threshold) count -= maxv;
      bit += nbits;
    }
    count--;
    remaining -= count < 0 ? -count : count;
    if (ncount >= 256) return false;
    counts[ncount++] = (int16_t)count;
    prev0 = count == 0;
    while (remaining < threshold) { nbits--; threshold >>= 1; }
  }
  if (remaining != 1) return false;
  size_t consumed = (size_t)((bit + 7) >> 3);
  if (consumed > n) return false;

  // build decode table
  if (table_log > 6) return false;
  int tsize = 1 << table_log;
  uint8_t symbols[64];
  int high = tsize - 1;
  uint16_t sym_next[256];
  for (int s = 0; s < ncount; ++s) {
    if (counts[s] == -1) { symbols[high--] = (uint8_t)s; sym_next[s] = 1; }
    else sym_next[s] = (uint16_t)counts[s];
  }
  int step = (tsize >> 1) + (tsize >> 3) + 3, mask = tsize - 1, pos = 0;
  for (int s = 0; s < ncount; ++s)
    for (int i = 0; i < counts[s]; ++i) {
      symbols[pos] = (uint8_t)s;
      pos = (pos + step) & mask;
      while (pos > high) pos = (pos + step) & mask;
    }
  if (pos != 0) return false;
  uint8_t tbits[64]; uint16_t tnew[64];
  for (int u = 0; u < tsize; ++u) {
    int s = symbols[u];
    uint16_t next = sym_next[s]++;
    int nb = table_log - (31 - __builtin_clz((uint32_t)next));
    tbits[u] = (uint8_t)nb;
    tnew[u] = (uint16_t)((next << nb) - tsize);
  }

  // two-state interleaved decode
  BitReader br(src + consumed, n - consumed);
  if (br.bad) return false;
  uint32_t s1 = br.read(table_log), s2 = br.read(table_log);
  int outn = 0;
  uint32_t* cur = &s1;
  uint32_t* other = &s2;
  while (true) {
    if (outn >= max_out) return false;
    out[outn++] = symbols[*cur];
    *cur = tnew[*cur] + br.read(tbits[*cur]);
    std::swap(cur, other);
    if (br.overflowed()) {
      if (outn >= max_out) return false;
      out[outn++] = symbols[*cur];
      break;
    }
  }
  *n_out = outn;
  return true;
}

bool huf_build_table(const uint8_t* src, size_t n, HufTable* ht, size_t* hsize) {
  if (n < 1) return false;
  uint8_t weights[256];
  int nweights;
  size_t isize = src[0];
  if (isize >= 128) {
    int osize = (int)isize - 127;
    isize = (size_t)((osize + 1) / 2);
    if (isize + 1 > n) return false;
    for (int i = 0; i < osize; ++i)
      weights[i] = (i & 1) ? (src[1 + i / 2] & 15) : (src[1 + i / 2] >> 4);
    nweights = osize;
  } else {
    if (isize + 1 > n) return false;
    if (!fse_decompress_weights(src + 1, isize, weights, 255, &nweights))
      return false;
  }
  *hsize = isize + 1;

  uint32_t total = 0;
  for (int i = 0; i < nweights; ++i) {
    if (weights[i] >= 12) return false;
    total += weights[i] ? (1u << (weights[i] - 1)) : 0;
  }
  if (total == 0) return false;
  int table_log = (31 - __builtin_clz(total)) + 1;
  if (table_log > 12) return false;
  uint32_t rest = (1u << table_log) - total;
  if (rest & (rest - 1)) return false;
  weights[nweights++] = (uint8_t)((31 - __builtin_clz(rest)) + 1);

  // canonical single-symbol table
  uint32_t rank_count[14] = {0}, rank_next[14] = {0};
  for (int i = 0; i < nweights; ++i) rank_count[weights[i]]++;
  uint32_t start = 0;
  for (int w = 1; w <= table_log; ++w) {
    rank_next[w] = start;
    start += rank_count[w] << (w - 1);
  }
  ht->table_log = table_log;
  for (int s = 0; s < nweights; ++s) {
    int w = weights[s];
    if (!w) continue;
    uint32_t len = 1u << (w - 1);
    uint8_t nb = (uint8_t)(table_log + 1 - w);
    for (uint32_t i = rank_next[w]; i < rank_next[w] + len; ++i) {
      ht->sym[i] = (uint8_t)s;
      ht->bits[i] = nb;
    }
    rank_next[w] += len;
  }
  return true;
}

bool huf_decompress(const uint8_t* src, size_t n, uint8_t* dst, size_t dst_size) {
  if (dst_size == 0 || n > dst_size) return false;
  if (n == dst_size) { std::memcpy(dst, src, n); return true; }
  if (n == 1) { std::memset(dst, src[0], dst_size); return true; }
  HufTable ht;
  size_t hsize;
  if (!huf_build_table(src, n, &ht, &hsize)) return false;
  if (hsize + 10 > n) return false;
  const uint8_t* body = src + hsize;
  size_t bn = n - hsize;
  size_t l1 = rd16(body), l2 = rd16(body + 2), l3 = rd16(body + 4);
  if (6 + l1 + l2 + l3 > bn) return false;
  size_t l4 = bn - 6 - l1 - l2 - l3;
  size_t seg = (dst_size + 3) / 4;
  const uint8_t* ps[4] = {body + 6, body + 6 + l1, body + 6 + l1 + l2,
                          body + 6 + l1 + l2 + l3};
  size_t ls[4] = {l1, l2, l3, l4};
  size_t outs[4] = {seg, seg, seg, dst_size - 3 * seg};
  size_t off = 0;
  for (int k = 0; k < 4; ++k) {
    BitReader br(ps[k], ls[k]);
    if (br.bad) return false;
    for (size_t i = 0; i < outs[k]; ++i) {
      uint32_t v = br.look(ht.table_log);
      dst[off + i] = ht.sym[v];
      br.bitpos -= ht.bits[v];
    }
    if (!br.exhausted_exactly()) return false;
    off += outs[k];
  }
  return true;
}

// ------------------------------------------------------ block decode ------

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  size_t left() const { return (size_t)(end - p); }
};

// read one length extension from the literal cursor
inline bool read_ext(Cursor& lit, uint32_t base, uint32_t* out) {
  if (lit.left() < 1) return false;
  uint32_t b0 = *lit.p;
  if (b0 < 254) { *out = base + b0; lit.p += 1; return true; }
  if (b0 == 254) {
    if (lit.left() < 3) return false;
    *out = base + rd16(lit.p + 1); lit.p += 3; return true;
  }
  if (lit.left() < 4) return false;
  *out = base + rd24(lit.p + 1); lit.p += 4; return true;
}

// family selected by level: 10-19 / 30-39 => LZ4 codewords
inline bool level_is_lz4(int level) {
  return (level >= 10 && level <= 19) || (level >= 30 && level <= 39);
}

int64_t decode_block_lz4(Cursor flags, Cursor lit, uint8_t* dst, size_t dpos,
                         size_t dcap, size_t window_base) {
  while (flags.p < flags.end) {
    uint32_t token = *flags.p++;
    uint32_t ll = token & 15;
    if (ll == 15 && !read_ext(lit, 15, &ll)) return -2;
    if (lit.left() < (size_t)ll + 2 || dpos + ll > dcap) return -2;
    std::memcpy(dst + dpos, lit.p, ll);
    lit.p += ll;
    dpos += ll;
    uint32_t off = rd16(lit.p);
    lit.p += 2;
    uint32_t ml = token >> 4;
    if (ml == 15 && !read_ext(lit, 15, &ml)) return -2;
    ml += 4;
    if (off == 0 || dpos < window_base + off || dpos + ml > dcap) return -2;
    // overlap-correct byte copy (offsets >= 8 in valid streams, but stay safe)
    const uint8_t* s = dst + dpos - off;
    uint8_t* d = dst + dpos;
    if (off >= ml) std::memcpy(d, s, ml);
    else for (uint32_t i = 0; i < ml; ++i) d[i] = s[i];
    dpos += ml;
  }
  size_t tail = lit.left();
  if (dpos + tail > dcap) return -2;
  std::memcpy(dst + dpos, lit.p, tail);
  return (int64_t)(dpos + tail);
}

int64_t decode_block_liz(Cursor flags, Cursor lit, Cursor off16, Cursor off24,
                         uint8_t* dst, size_t dpos, size_t dcap,
                         size_t window_base) {
  int64_t last_off = 0;
  while (flags.p < flags.end) {
    uint32_t token = *flags.p++;
    uint32_t ll = 0, ml;
    if (token >= 32) {
      ll = token & 7;
      if (ll == 7 && !read_ext(lit, 7, &ll)) return -2;
      if (lit.left() < ll || dpos + ll > dcap) return -2;
      std::memcpy(dst + dpos, lit.p, ll);
      lit.p += ll;
      dpos += ll;
      if (token < 128) {  // new 16-bit offset
        if (off16.left() < 2) return -2;
        last_off = rd16(off16.p);
        off16.p += 2;
      }
      ml = (token >> 3) & 15;
      if (ml == 15 && !read_ext(lit, 15, &ml)) return -2;
    } else if (token < 31) {
      if (off24.left() < 3) return -2;
      ml = token + 16;
      last_off = rd24(off24.p);
      off24.p += 3;
    } else {
      if (!read_ext(lit, 0, &ml)) return -2;
      ml += 31 + 16;
      if (off24.left() < 3) return -2;
      last_off = rd24(off24.p);
      off24.p += 3;
    }
    if (last_off == 0) {
      if (ml != 0) return -2;  // zero-length rep placeholder token
      continue;
    }
    if (dpos < window_base + (size_t)last_off || dpos + ml > dcap) return -2;
    const uint8_t* s = dst + dpos - last_off;
    uint8_t* d = dst + dpos;
    if ((uint64_t)last_off >= ml) std::memcpy(d, s, ml);
    else for (uint32_t i = 0; i < ml; ++i) d[i] = s[i];
    dpos += ml;
  }
  size_t tail = lit.left();
  if (dpos + tail > dcap) return -2;
  std::memcpy(dst + dpos, lit.p, tail);
  return (int64_t)(dpos + tail);
}

// stream reader: raw (LE24 len) or Huffman (LE24 orig + LE24 comp + blob)
bool read_stream(const uint8_t*& ip, const uint8_t* iend, bool huff,
                 std::vector<uint8_t>& scratch, Cursor* out) {
  if (!huff) {
    if (ip + 3 > iend) return false;
    uint32_t len = rd24(ip);
    if (ip + 3 + len > iend) return false;
    out->p = ip + 3;
    out->end = ip + 3 + len;
    ip += 3 + len;
    return true;
  }
  if (ip + 6 > iend) return false;
  uint32_t orig = rd24(ip), comp = rd24(ip + 3);
  if (ip + 6 + comp > iend || orig > (1u << 17)) return false;
  size_t base = scratch.size();
  scratch.resize(base + orig);
  if (!huf_decompress(ip + 6, comp, scratch.data() + base, orig)) return false;
  // note: scratch may reallocate; caller resolves pointers afterwards
  out->p = (const uint8_t*)(uintptr_t)base;       // offset, fixed up later
  out->end = (const uint8_t*)(uintptr_t)(base + orig);
  ip += 6 + comp;
  return true;
}

int64_t decompress_stream(const uint8_t* src, size_t n, uint8_t* dst,
                          size_t dcap, size_t dpos0, size_t window_base) {
  if (n < 1) return -1;
  int level = src[0];
  if (level < 10 || level > 49) return -1;
  bool lz4 = level_is_lz4(level);

  const uint8_t* ip = src + 1;
  const uint8_t* iend = src + n;
  size_t dpos = dpos0;
  std::vector<uint8_t> scratch;

  while (ip < iend) {
    uint32_t header = *ip++;
    if (header == 128) {  // stored block
      if (ip + 3 > iend) return -1;
      uint32_t len = rd24(ip);
      ip += 3;
      if (ip + len > iend || dpos + len > dcap) return -1;
      std::memcpy(dst + dpos, ip, len);
      dpos += len;
      ip += len;
      continue;
    }
    if (header & 16) return -1;            // FLAG_LEN is never set
    if (header & ~(uint32_t)(1 + 2 + 4 + 8)) return -1;

    scratch.clear();
    Cursor lens, o16, o24, fl, lits;
    bool h16 = header & 4, h24 = header & 8, hfl = header & 2, hlit = header & 1;
    bool hufs[5] = {false, h16, h24, hfl, hlit};
    Cursor* cs[5] = {&lens, &o16, &o24, &fl, &lits};
    for (int k = 0; k < 5; ++k)
      if (!read_stream(ip, iend, hufs[k], scratch, cs[k])) return -1;
    // fix up scratch-relative cursors after all allocations are done
    for (int k = 0; k < 5; ++k) {
      if (hufs[k]) {
        size_t b = (size_t)(uintptr_t)cs[k]->p, e = (size_t)(uintptr_t)cs[k]->end;
        cs[k]->p = scratch.data() + b;
        cs[k]->end = scratch.data() + e;
      }
    }

    int64_t r = lz4 ? decode_block_lz4(fl, lits, dst, dpos, dcap, window_base)
                    : decode_block_liz(fl, lits, o16, o24, dst, dpos, dcap,
                                       window_base);
    if (r < 0) return r;
    dpos = (size_t)r;
  }
  return (int64_t)(dpos - dpos0);
}

}  // namespace

extern "C" {

uint32_t ltpu_xxh32(const uint8_t* p, size_t n, uint32_t seed) {
  return xxh32(p, n, seed);
}
uint64_t ltpu_xxh64(const uint8_t* p, size_t n, uint64_t seed) {
  return xxh64(p, n, seed);
}

int64_t ltpu_decompress(const uint8_t* src, size_t n, uint8_t* dst, size_t cap) {
  return decompress_stream(src, n, dst, cap, 0, 0);
}

// Frame decode (doc/lizard_Frame_format.md): magic, descriptor, blocks,
// endmark, optional xxh32 content checksum. Returns bytes written or <0.
int64_t ltpu_frame_decompress(const uint8_t* src, size_t n, uint8_t* dst,
                              size_t cap) {
  size_t p = 0, dpos = 0;
  while (p < n) {
    if (p + 4 > n) return -1;
    uint32_t magic = rd32(src + p);
    if ((magic & 0xFFFFFFF0u) == 0x184D2A50u) {  // skippable frame
      if (p + 8 > n) return -1;
      p += 8 + rd32(src + p + 4);
      continue;
    }
    if (magic != 0x184D2206u) return -1;
    p += 4;
    if (p + 3 > n) return -1;
    uint8_t flg = src[p], bd = src[p + 1];
    if (((flg >> 6) & 3) != 1 || (flg & 3) || (bd & 0x8F)) return -1;
    bool linked = ((flg >> 5) & 1) == 0;
    bool has_crc = (flg >> 2) & 1;
    bool has_size = (flg >> 3) & 1;
    size_t hlen = has_size ? 10 : 2;
    if (p + hlen + 1 > n) return -1;
    uint8_t hc = src[p + hlen];
    if (((xxh32(src + p, hlen, 0) >> 8) & 0xFF) != hc) return -1;
    p += hlen + 1;

    size_t frame_start = dpos;
    while (true) {
      if (p + 4 > n) return -1;
      uint32_t bsize = rd32(src + p);
      p += 4;
      if (bsize == 0) break;
      bool stored = bsize & 0x80000000u;
      bsize &= 0x7FFFFFFFu;
      if (p + bsize > n) return -1;
      if (stored) {
        if (dpos + bsize > cap) return -1;
        std::memcpy(dst + dpos, src + p, bsize);
        dpos += bsize;
      } else {
        int64_t r = decompress_stream(src + p, bsize, dst, cap, dpos,
                                      linked ? frame_start : dpos);
        if (r < 0) return r;
        dpos += (size_t)r;
      }
      p += bsize;
    }
    if (has_crc) {
      if (p + 4 > n) return -1;
      if (xxh32(dst + frame_start, dpos - frame_start, 0) != rd32(src + p))
        return -3;
      p += 4;
    }
  }
  return (int64_t)dpos;
}

}  // extern "C"

// ===========================================================================
// fastLZ4-family block-stream ENCODER (written from scratch against the
// format spec, doc/lizard_Block_format.md + lib/lizard_compress_lz4.h
// semantics): greedy hash match finder with LZ4-style skip acceleration and
// backward extension, emitting the two raw streams (flags + literals) per
// 128 KB inner block. Output is a valid stream for any fastLZ4 level byte;
// it is NOT byte-identical to the reference encoder (the bit-exact encoder
// lives in lizard_tpu/ref/block_encode.py) -- this is the fast host path.
// ===========================================================================
namespace {

constexpr size_t kBlock = 131072;            // LIZARD_BLOCK_SIZE
constexpr uint32_t kMaxOff = 65535;
constexpr size_t kLastLiterals = 16;         // decoder tail rule slack
constexpr uint8_t kFlagUncompressed = 128;   // lizard_common.h LIZARD_FLAG_UNCOMPRESSED

inline uint32_t ehash(uint32_t v, int hlog) {
  return (v * 2654435761u) >> (32 - hlog);
}

// append a length-extension (<254 | 254+LE16 | 255+LE24)
inline void put_ext(std::vector<uint8_t>& out, uint32_t v) {
  if (v < 254) {
    out.push_back((uint8_t)v);
  } else if (v < 65536) {
    out.push_back(254);
    out.push_back((uint8_t)v);
    out.push_back((uint8_t)(v >> 8));
  } else {
    out.push_back(255);
    out.push_back((uint8_t)v);
    out.push_back((uint8_t)(v >> 8));
    out.push_back((uint8_t)(v >> 16));
  }
}

inline void put_le24(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((uint8_t)v);
  out.push_back((uint8_t)(v >> 8));
  out.push_back((uint8_t)(v >> 16));
}

struct EncAcc {
  std::vector<uint8_t> flags, lits;
};

// encode src[b0, b1) as one inner block's token streams; the hash table
// holds absolute positions into src (window shared across inner blocks of
// the same call, like one Lizard raw stream, lizard_compress.c:494-540)
void encode_inner_lz4(const uint8_t* src, size_t b0, size_t b1, size_t n,
                      uint32_t* htab, int hlog, int accel, EncAcc& acc) {
  acc.flags.clear();
  acc.lits.clear();
  size_t ip = b0, anchor = b0;
  // matches must stop so that every in-loop literal run leaves >= 2+16
  // bytes in the literal stream (decoder rule lizard_decompress_lz4.h:104)
  size_t mflimit = (b1 >= 20 && b1 - 20 >= b0) ? b1 - 20 : b0;

  auto emit = [&](size_t lit_end, size_t mpos, size_t mlen, uint32_t off) {
    size_t ll = lit_end - anchor;
    uint32_t ml = (uint32_t)mlen - 4;
    uint8_t tok = (uint8_t)(((ml < 15 ? ml : 15) << 4) |
                            (ll < 15 ? (uint8_t)ll : 15));
    acc.flags.push_back(tok);
    if (ll >= 15) put_ext(acc.lits, (uint32_t)(ll - 15));
    acc.lits.insert(acc.lits.end(), src + anchor, src + anchor + ll);
    acc.lits.push_back((uint8_t)off);
    acc.lits.push_back((uint8_t)(off >> 8));
    if (ml >= 15) put_ext(acc.lits, ml - 15);
    (void)mpos;
  };

  if (b1 - b0 > 24) {
    uint32_t searches = 0;
    while (ip < mflimit) {
      uint32_t v = rd32(src + ip);
      uint32_t h = ehash(v, hlog);
      size_t cand = htab[h];
      htab[h] = (uint32_t)ip;
      // LIZARD_FAST_MIN_OFFSET: the fastLZ4 decoder's unconditional
      // 8-byte copies require offsets >= 8 (lizard_parser_fast.h:1)
      if (cand + 8 <= ip && ip - cand <= kMaxOff && cand < n &&
          rd32(src + cand) == v) {
        // backward extension
        size_t mp = cand, mq = ip;
        while (mq > anchor && mp > 0 && src[mp - 1] == src[mq - 1]) {
          --mp;
          --mq;
        }
        // (backward extension preserves the offset, so >= 8 still holds)
        // forward extension
        size_t len = 4;
        size_t maxl = b1 - kLastLiterals - mq;
        while (len < maxl && src[mp + len] == src[mq + len]) ++len;
        if (len >= 4) {
          emit(mq, mp, len, (uint32_t)(mq - mp));
          anchor = mq + len;
          ip = anchor;
          searches = 0;
          // insert a couple of positions inside the match for future refs
          if (ip - 2 > b0 && ip < mflimit) {
            htab[ehash(rd32(src + ip - 2), hlog)] = (uint32_t)(ip - 2);
          }
          continue;
        }
      }
      ip += 1 + (searches++ >> (6 + (accel > 1 ? accel - 1 : 0)));
    }
  }
  // trailing literals: the remainder of the block, raw
  acc.lits.insert(acc.lits.end(), src + anchor, src + b1);
}

}  // namespace

extern "C" {

// Compress `src` into a Lizard block stream (level byte + inner blocks with
// raw flags/literals streams). level must be a fastLZ4-family level
// (10..19 or 30..39 -- written verbatim; streams are raw so any of them
// decodes it). accel >= 1 trades ratio for speed. Returns bytes written or
// -1 if dst is too small.
int64_t ltpu_compress_lz4(const uint8_t* src, size_t n, uint8_t* dst,
                          size_t cap, int level, int accel) {
  int hlog = 17;
  std::vector<uint32_t> htab((size_t)1 << hlog, 0xFFFFFFFFu);
  // position 0 sentinel: fill with large value so "cand < ip" rejects
  std::vector<uint8_t> out;
  out.reserve(n / 2 + 1024);
  out.push_back((uint8_t)level);
  EncAcc acc;
  for (size_t b0 = 0; b0 < n || (n == 0 && b0 == 0); b0 += kBlock) {
    size_t b1 = b0 + kBlock < n ? b0 + kBlock : n;
    encode_inner_lz4(src, b0, b1, n, htab.data(), hlog, accel, acc);
    size_t comp = 1 + 5 * 3 + acc.flags.size() + acc.lits.size();
    size_t raw = b1 - b0;
    if (raw > 0 && comp >= raw - (raw >> 6)) {
      // insufficient gain: stored block (lizard_compress.c:235-245)
      out.push_back(kFlagUncompressed);
      put_le24(out, (uint32_t)raw);
      out.insert(out.end(), src + b0, src + b1);
    } else {
      // header byte 0: all five streams raw
      out.push_back(0);
      put_le24(out, 0);                          // len stream (empty)
      put_le24(out, 0);                          // off16 (empty)
      put_le24(out, 0);                          // off24 (empty)
      put_le24(out, (uint32_t)acc.flags.size()); // flags
      out.insert(out.end(), acc.flags.begin(), acc.flags.end());
      put_le24(out, (uint32_t)acc.lits.size());  // literals
      out.insert(out.end(), acc.lits.begin(), acc.lits.end());
    }
    if (n == 0) break;
  }
  if (out.size() > cap) return -1;
  std::memcpy(dst, out.data(), out.size());
  return (int64_t)out.size();
}

}  // extern "C"

extern "C" {
// standalone Huff0 decode (for the host-side stream splitter)
int ltpu_huf_decompress(const uint8_t* src, size_t n, uint8_t* dst,
                        size_t dst_size) {
  return huf_decompress(src, n, dst, dst_size) ? 0 : -1;
}
}
