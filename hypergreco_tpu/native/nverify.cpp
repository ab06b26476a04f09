// Native (C++) verifier core for the Goldilocks/GL2 host verifier.
//
// The reference verifies on a laptop CPU in ~10-100 ms (README.md:39-56) in
// Rust; the pure-Python/numpy verifier spends ~40 us per numpy array op and
// ~5 us per scalar ext mul, putting a 10x floor over the baseline. The hot
// loops live here instead: the Fiat-Shamir transcript reader (keccak absorb +
// canonical felt decode), the per-round sumcheck verification loop (read,
// bind, interpolate, squeeze — transcript.rs:198-209 / the reference's
// SumCheck::verify round loop), and the O(L) table kernels (eq tables,
// DFT-row MLE tables, MLE dot products).
//
// Everything is specialized to Goldilocks p = 2^64 - 2^32 + 1 with the
// degree-2 extension w^2 = 7 (GoldilocksExt2 parity). BN254-Fr verification
// keeps the Python path (object-dtype numpy); its baseline is milliseconds.
//
// Built into libhg_native.so next to keccak.cpp (see utils/keccak.py).

#include <cstdint>
#include <cstring>
#include <cstddef>

using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

constexpr u64 GLP = 0xFFFFFFFF00000001ULL;  // 2^64 - 2^32 + 1
constexpr u64 M32 = 0xFFFFFFFFULL;          // 2^32 - 1 == 2^64 mod p
constexpr u64 GLW = 7;                      // GL2 nonresidue

inline u64 gl_add(u64 a, u64 b) {
  u64 s = a + b;
  if (s < a) s += M32;  // wrapped: 2^64 ≡ 2^32 - 1
  if (s >= GLP) s -= GLP;
  return s;
}

inline u64 gl_sub(u64 a, u64 b) {
  u64 d = a - b;
  if (a < b) d -= M32;  // borrowed: -2^64 ≡ -(2^32 - 1)
  if (d >= GLP) d -= GLP;
  return d;
}

inline u64 gl_reduce128(u128 x) {
  u64 lo = (u64)x, hi = (u64)(x >> 64);
  u64 h0 = hi & M32, h1 = hi >> 32;
  // x ≡ lo + h0*(2^32-1) - h1  (2^64 ≡ 2^32-1, 2^96 ≡ -1)
  u64 t0 = lo - h1;
  if (lo < h1) t0 -= M32;
  if (t0 >= GLP) t0 -= GLP;
  u64 t1 = h0 * M32;  // < 2^64
  u64 s = t0 + t1;
  if (s < t0) s += M32;
  if (s >= GLP) s -= GLP;
  return s;
}

inline u64 gl_mul(u64 a, u64 b) { return gl_reduce128((u128)a * b); }

inline u64 gl_pow(u64 a, u64 e) {
  u64 r = 1;
  while (e) {
    if (e & 1) r = gl_mul(r, a);
    a = gl_mul(a, a);
    e >>= 1;
  }
  return r;
}

inline u64 gl_inv(u64 a) { return gl_pow(a, GLP - 2); }

struct Ext {  // GL2 element: c0 + c1*w, w^2 = 7
  u64 c0, c1;
};

inline Ext e_add(Ext a, Ext b) { return {gl_add(a.c0, b.c0), gl_add(a.c1, b.c1)}; }
inline Ext e_sub(Ext a, Ext b) { return {gl_sub(a.c0, b.c0), gl_sub(a.c1, b.c1)}; }
inline Ext e_mul(Ext a, Ext b) {
  u64 t0 = gl_mul(a.c0, b.c0);
  u64 t1 = gl_mul(a.c1, b.c1);
  u64 t2 = gl_mul(a.c0, b.c1);
  u64 t3 = gl_mul(a.c1, b.c0);
  return {gl_add(t0, gl_mul(t1, GLW)), gl_add(t2, t3)};
}
inline Ext e_scale(Ext a, u64 c) { return {gl_mul(a.c0, c), gl_mul(a.c1, c)}; }

// ---- keccak (shared with keccak.cpp via extern decls) ----

struct KeccakState {
  u64 st[25];
  size_t pos;
};

}  // namespace

extern "C" {
void hg_keccak_init(KeccakState* s);
void hg_keccak_update(KeccakState* s, const uint8_t* data, size_t len);
void hg_keccak_finalize_reset(KeccakState* s, uint8_t out[32]);
}

namespace {

// challenge = int_le(digest) mod p; digest re-absorbed (transcript.rs:202)
inline u64 squeeze_base(KeccakState* h) {
  uint8_t d[32];
  hg_keccak_finalize_reset(h, d);
  hg_keccak_update(h, d, 32);
  // 256-bit LE mod GLP via four 64-bit limbs: 2^64 ≡ 2^32-1, chain upward
  u64 w0, w1, w2, w3;
  std::memcpy(&w0, d, 8);
  std::memcpy(&w1, d + 8, 8);
  std::memcpy(&w2, d + 16, 8);
  std::memcpy(&w3, d + 24, 8);
  // value = ((w3*2^64 + w2)*2^64 + w1)*2^64 + w0
  u64 acc = w3 % GLP;
  acc = gl_add(gl_mul(acc, M32), w2 % GLP);
  acc = gl_add(gl_mul(acc, M32), w1 % GLP);
  acc = gl_add(gl_mul(acc, M32), w0 % GLP);
  return acc;
}

// GL2 challenge, protocol v2.1: ONE digest, coefficients from the two
// 16-byte LE halves mod p (utils/transcript.py squeeze_challenge parity)
inline void squeeze_halves(KeccakState* h, u64* c0, u64* c1) {
  uint8_t d[32];
  hg_keccak_finalize_reset(h, d);
  hg_keccak_update(h, d, 32);
  u64 w[4];
  std::memcpy(w, d, 32);
  *c0 = gl_add(gl_mul(w[1] % GLP, M32), w[0] % GLP);
  *c1 = gl_add(gl_mul(w[3] % GLP, M32), w[2] % GLP);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// transcript reader (GL2)
// ---------------------------------------------------------------------------

struct HgvTr {
  KeccakState hash;
  const uint8_t* proof;
  size_t len, pos;
};

HgvTr* hgv_tr_new(const uint8_t* proof, size_t len) {
  HgvTr* t = new HgvTr();
  hg_keccak_init(&t->hash);
  t->proof = proof;  // borrowed: Python keeps the bytes alive
  t->len = len;
  t->pos = 0;
  return t;
}

void hgv_tr_free(HgvTr* t) { delete t; }

size_t hgv_tr_pos(HgvTr* t) { return t->pos; }

// absorb n canonical base felts (8-byte LE each)
void hgv_tr_common(HgvTr* t, const u64* xs, size_t n) {
  hg_keccak_update(&t->hash, reinterpret_cast<const uint8_t*>(xs), 8 * n);
}

void hgv_tr_common_bytes(HgvTr* t, const uint8_t* b, size_t n) {
  hg_keccak_update(&t->hash, b, n);
}

// read n base felts: decode LE u64, check canonical, absorb.
// returns 0 ok, 1 = stream overrun, 2 = non-canonical encoding
int hgv_tr_read(HgvTr* t, size_t n, u64* out) {
  if (t->pos + 8 * n > t->len) return 1;
  const uint8_t* src = t->proof + t->pos;
  for (size_t i = 0; i < n; i++) {
    u64 x;
    std::memcpy(&x, src + 8 * i, 8);
    if (x >= GLP) return 2;
    out[i] = x;
  }
  hg_keccak_update(&t->hash, src, 8 * n);
  t->pos += 8 * n;
  return 0;
}

void hgv_tr_squeeze(HgvTr* t, size_t n, u64* out) {
  for (size_t i = 0; i < n; i++) out[i] = squeeze_base(&t->hash);
}

// n GL2 challenges, protocol v2.1: both coefficients from ONE digest
// (16-byte LE halves mod p). out: 2n words, (c0, c1) interleaved.
void hgv_tr_squeeze_ext(HgvTr* t, size_t n, u64* out) {
  for (size_t i = 0; i < n; i++)
    squeeze_halves(&t->hash, &out[2 * i], &out[2 * i + 1]);
}

// ---------------------------------------------------------------------------
// sumcheck round loop (GL2): the verifier side of one sumcheck instance.
// Round messages carry evals at x = {0, 2, .., degree} (npts = degree); the
// x=1 value is bound by S(0)+S(1) = claim (gkr/sumcheck.py _round_ys).
// challenges_out: num_vars ext elements (c0,c1 interleaved), LSB-first.
// ---------------------------------------------------------------------------

int hgv_tr_verify_sumcheck(HgvTr* t, int degree, int num_vars,
                           const u64 claim_in[2], u64 final_out[2],
                           u64* challenges_out) {
  int npts = degree;      // |{0, 2..degree}|
  int n = degree + 1;     // interpolation nodes 0..degree
  if (n > 16) return 3;
  Ext claim = {claim_in[0], claim_in[1]};
  // lagrange inverse denominators for nodes 0..degree
  u64 dinv[16];
  for (int i = 0; i < n; i++) {
    long long den = 1;
    for (int j = 0; j < n; j++)
      if (j != i) den *= (i - j);
    u64 d = den >= 0 ? (u64)den % GLP : GLP - ((u64)(-den) % GLP);
    dinv[i] = gl_inv(d);
  }
  u64 evals[32];
  Ext ys[16], pre[17], suf[17], diffs[16];
  for (int v = 0; v < num_vars; v++) {
    int rc = hgv_tr_read(t, 2 * npts, evals);
    if (rc) return rc;
    Ext r;
    squeeze_halves(&t->hash, &r.c0, &r.c1);
    challenges_out[2 * v] = r.c0;
    challenges_out[2 * v + 1] = r.c1;
    // ys = [e0, claim - e0, e1, .., e_{npts-1}]
    ys[0] = {evals[0], evals[1]};
    ys[1] = e_sub(claim, ys[0]);
    for (int i = 1; i < npts; i++) ys[i + 1] = {evals[2 * i], evals[2 * i + 1]};
    // barycentric-free lagrange: num_i = pre[i]*suf[i+1], li = num_i*dinv_i
    for (int j = 0; j < n; j++) diffs[j] = e_sub(r, Ext{(u64)j % GLP, 0});
    pre[0] = {1, 0};
    for (int j = 0; j < n; j++) pre[j + 1] = e_mul(pre[j], diffs[j]);
    suf[n] = {1, 0};
    for (int j = n - 1; j >= 0; j--) suf[j] = e_mul(suf[j + 1], diffs[j]);
    Ext acc = {0, 0};
    for (int i = 0; i < n; i++) {
      Ext li = e_scale(e_mul(pre[i], suf[i + 1]), dinv[i]);
      acc = e_add(acc, e_mul(ys[i], li));
    }
    claim = acc;
  }
  final_out[0] = claim.c0;
  final_out[1] = claim.c1;
  return 0;
}

// ---------------------------------------------------------------------------
// table kernels (GL2 vectors as two parallel u64 arrays c0[], c1[])
// ---------------------------------------------------------------------------

// eq(point, x) over x in [0, 2^v), LSB-first doubling (npfield.eq_table)
void hgv_gl2_eq_table(const u64* point /*2v, interleaved c0,c1*/, int v,
                      u64* out0, u64* out1) {
  out0[0] = 1;
  out1[0] = 0;
  for (int j = 0; j < v; j++) {
    size_t half = (size_t)1 << j;
    Ext r = {point[2 * j], point[2 * j + 1]};
    for (size_t i = half; i-- > 0;) {
      Ext t = {out0[i], out1[i]};
      Ext hi = e_mul(t, r);
      Ext lo = e_sub(t, hi);
      out0[half + i] = hi.c0;
      out1[half + i] = hi.c1;
      out0[i] = lo.c0;
      out1[i] = lo.c1;
    }
  }
}

// DFT-row MLE table for ONE claim point (npfield.d_table, single point, no
// alpha): d(j) = prod_b ((1-r_b) + r_b * w^(j*2^b)), 1/L-scaled if linv != 1.
// w must already be the inverse root for inverse transforms.
void hgv_gl2_d_table(const u64* r /*2v interleaved*/, int v, u64 w, u64 linv,
                     u64* out0, u64* out1) {
  size_t L = (size_t)1 << v;
  // wpow[j] = w^j
  u64* wp = new u64[L];
  wp[0] = 1;
  for (size_t j = 1; j < L; j++) wp[j] = gl_mul(wp[j - 1], w);
  out0[0] = 1;
  out1[0] = 0;
  size_t size = 1;
  for (int b = v - 1; b >= 0; b--) {
    size <<= 1;
    Ext rb = {r[2 * b], r[2 * b + 1]};
    Ext one_minus = e_sub(Ext{1, 0}, rb);
    size_t half = size >> 1;
    for (size_t i = size; i-- > 0;) {
      Ext t = {out0[i % half], out1[i % half]};
      u64 wb = wp[(i << b) & (L - 1)];
      Ext f = e_add(one_minus, e_scale(rb, wb));
      Ext o = e_mul(t, f);
      out0[i] = o.c0;
      out1[i] = o.c1;
    }
  }
  if (linv != 1)
    for (size_t i = 0; i < L; i++) {
      out0[i] = gl_mul(out0[i], linv);
      out1[i] = gl_mul(out1[i], linv);
    }
  delete[] wp;
}

// <ext vector, base vector>
void hgv_gl2_dot_base(const u64* a0, const u64* a1, const u64* b, size_t L,
                      u64 out[2]) {
  u128 s0 = 0, s1 = 0;  // sums of reduced products: safe to 2^64 terms
  for (size_t i = 0; i < L; i++) {
    s0 += gl_mul(a0[i], b[i]);
    s1 += gl_mul(a1[i], b[i]);
  }
  out[0] = gl_reduce128(s0);
  out[1] = gl_reduce128(s1);
}

// <ext vector, ext vector>
void hgv_gl2_dot_ext(const u64* a0, const u64* a1, const u64* b0,
                     const u64* b1, size_t L, u64 out[2]) {
  u128 s0 = 0, s1 = 0;
  for (size_t i = 0; i < L; i++) {
    u64 t0 = gl_mul(a0[i], b0[i]);
    u64 t1 = gl_mul(a1[i], b1[i]);
    u64 t2 = gl_mul(a0[i], b1[i]);
    u64 t3 = gl_mul(a1[i], b0[i]);
    s0 += gl_add(t0, gl_mul(t1, GLW));
    s1 += gl_add(t2, t3);
  }
  out[0] = gl_reduce128(s0);
  out[1] = gl_reduce128(s1);
}

// ---- grand-product layer verification helpers (gkr/grand_product.py) ----
// Ext vectors in INTERLEAVED layout: x[2i], x[2i+1] = (c0, c1) of element i.

// <a, b> over m interleaved ext elements
void hgv_gl2_dot_ext_inter(const u64* a, const u64* b, size_t m, u64 out[2]) {
  Ext acc = {0, 0};
  for (size_t i = 0; i < m; i++) {
    Ext x = {a[2 * i], a[2 * i + 1]};
    Ext y = {b[2 * i], b[2 * i + 1]};
    acc = e_add(acc, e_mul(x, y));
  }
  out[0] = acc.c0;
  out[1] = acc.c1;
}

// ev = m interleaved (l_i, r_i) ext pairs (4m words, transcript order);
// out = sum_i a_i * l_i * r_i
void hgv_gl2_dot3_inter(const u64* a, const u64* ev, size_t m, u64 out[2]) {
  Ext acc = {0, 0};
  for (size_t i = 0; i < m; i++) {
    Ext ai = {a[2 * i], a[2 * i + 1]};
    Ext l = {ev[4 * i], ev[4 * i + 1]};
    Ext r = {ev[4 * i + 2], ev[4 * i + 3]};
    acc = e_add(acc, e_mul(ai, e_mul(l, r)));
  }
  out[0] = acc.c0;
  out[1] = acc.c1;
}

// claims_i = l_i + mu * (r_i - l_i)  (next-layer claim mix)
void hgv_gl2_mix_inter(const u64* ev, size_t m, const u64 mu[2],
                       u64* out /*2m*/) {
  Ext muv = {mu[0], mu[1]};
  for (size_t i = 0; i < m; i++) {
    Ext l = {ev[4 * i], ev[4 * i + 1]};
    Ext r = {ev[4 * i + 2], ev[4 * i + 3]};
    Ext c = e_add(l, e_mul(muv, e_sub(r, l)));
    out[2 * i] = c.c0;
    out[2 * i + 1] = c.c1;
  }
}

// eq(x, y) = prod_i (x_i y_i + (1-x_i)(1-y_i)) over interleaved ext points
void hgv_gl2_eq_eval(const u64* x, const u64* y, size_t n, u64 out[2]) {
  Ext acc = {1, 0};
  const Ext one = {1, 0};
  for (size_t i = 0; i < n; i++) {
    Ext xi = {x[2 * i], x[2 * i + 1]};
    Ext yi = {y[2 * i], y[2 * i + 1]};
    Ext t = e_mul(xi, yi);
    Ext u = e_mul(e_sub(one, xi), e_sub(one, yi));
    acc = e_mul(acc, e_add(t, u));
  }
  out[0] = acc.c0;
  out[1] = acc.c1;
}

// sum_{y in [lo, hi)} prod_p eq(point_p, y + off_p) over dyadic blocks
// (gkr/wiring_eval.py eq_affine_sum — the affine-run wiring closed form).
// pts: concatenated interleaved ext points; lens[p] = len(point_p);
// offs[p] >= 0 with y + off_p < 2^lens[p] guaranteed by the caller.
void hgv_gl2_eq_affine_sum(const u64* pts, const int64_t* lens,
                           const int64_t* offs, size_t npairs, int64_t lo,
                           int64_t hi, u64 out[2]) {
  out[0] = 0;
  out[1] = 0;
  if (lo >= hi || npairs == 0) return;
  const Ext one = {1, 0};
  // per-pair base offsets into pts
  int64_t starts[64];
  int64_t minlen = lens[0];
  {
    int64_t s = 0;
    for (size_t p = 0; p < npairs; p++) {
      starts[p] = s;
      s += 2 * lens[p];
      if (lens[p] < minlen) minlen = lens[p];
    }
  }
  // lowpref[j] = prod_{b<j} (prod_p pt_p[b] + prod_p (1 - pt_p[b]))
  Ext lowpref[64];
  lowpref[0] = one;
  for (int64_t b = 0; b < minlen; b++) {
    Ext t = one, s = one;
    for (size_t p = 0; p < npairs; p++) {
      Ext ptb = {pts[starts[p] + 2 * b], pts[starts[p] + 2 * b + 1]};
      t = e_mul(t, ptb);
      s = e_mul(s, e_sub(one, ptb));
    }
    lowpref[b + 1] = e_mul(lowpref[b], e_add(t, s));
  }
  Ext acc = {0, 0};
  int64_t x = lo;
  while (x < hi) {
    // largest dyadic block at x fitting the interval and every alignment
    int64_t j = 63 - __builtin_clzll((unsigned long long)(hi - x));
    if (j > minlen) j = minlen;
    for (size_t p = 0; p < npairs; p++) {
      int64_t base = x + offs[p];
      int64_t v2 = base == 0 ? j : __builtin_ctzll((unsigned long long)base);
      if (v2 < j) j = v2;
    }
    Ext blk = lowpref[j];
    for (size_t p = 0; p < npairs; p++) {
      int64_t base = x + offs[p];
      for (int64_t b = j; b < lens[p]; b++) {
        Ext ptb = {pts[starts[p] + 2 * b], pts[starts[p] + 2 * b + 1]};
        blk = e_mul(blk, ((base >> b) & 1) ? ptb : e_sub(one, ptb));
      }
    }
    acc = e_add(acc, blk);
    x += (int64_t)1 << j;
  }
  out[0] = acc.c0;
  out[1] = acc.c1;
}

// batch of base-table MLE dots against ONE eq table: tabs is [T, L] row-major
void hgv_gl2_dot_base_many(const u64* eq0, const u64* eq1, const u64* tabs,
                           size_t T, size_t L, u64* out /*2T interleaved*/) {
  for (size_t t = 0; t < T; t++)
    hgv_gl2_dot_base(eq0, eq1, tabs + t * L, L, out + 2 * t);
}

}  // extern "C"
