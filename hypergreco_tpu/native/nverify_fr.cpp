// Native verifier core, BN254-Fr half (4x64 Montgomery CIOS).
//
// Mirrors the Goldilocks kernel set in nverify.cpp for the bn254 backend
// (ext_degree 1): Fiat-Shamir transcript reader over 32-byte LE felts, the
// sumcheck round loop, eq/DFT-row tables, MLE dots, grand-product layer
// helpers, and elementwise field vectors backing npfield's bn254 base ops
// (which otherwise run as object-dtype numpy — Python-int C loops).
//
// Representation at the C boundary: one felt = 4 little-endian u64 limbs,
// PLAIN (non-Montgomery) canonical value; arrays are [N][4] row-major.
// Kernels convert to Montgomery internally where it pays.

#include <cstdint>
#include <cstring>
#include <cstddef>

using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

struct Fr {
  u64 v[4];
};

constexpr u64 FRP[4] = {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                        0xb85045b68181585dULL, 0x30644e72e131a029ULL};
constexpr u64 FR_NINV = 0xc2e1f593efffffffULL;  // -p^{-1} mod 2^64
constexpr u64 FR_R2[4] = {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                          0x8c49833d53bb8085ULL, 0x216d0b17f4e44a5ULL};

inline bool fr_geq_p(const u64 t[4]) {
  for (int i = 3; i >= 0; i--) {
    if (t[i] > FRP[i]) return true;
    if (t[i] < FRP[i]) return false;
  }
  return true;  // equal
}

inline void fr_sub_p(u64 t[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)t[i] - FRP[i] - borrow;
    t[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

inline Fr fr_add(const Fr& a, const Fr& b) {
  Fr r;
  u128 c = 0;
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)a.v[i] + b.v[i] + c;
    r.v[i] = (u64)s;
    c = s >> 64;
  }
  if (c || fr_geq_p(r.v)) fr_sub_p(r.v);
  return r;
}

inline Fr fr_sub(const Fr& a, const Fr& b) {
  Fr r;
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  if (borrow) {  // += p
    u128 c = 0;
    for (int i = 0; i < 4; i++) {
      u128 s = (u128)r.v[i] + FRP[i] + c;
      r.v[i] = (u64)s;
      c = s >> 64;
    }
  }
  return r;
}

// CIOS Montgomery multiplication: returns a*b*R^{-1} mod p
inline Fr mont_mul(const Fr& a, const Fr& b) {
  u64 t[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    // t += a * b[i]
    u128 c = 0;
    for (int j = 0; j < 4; j++) {
      u128 s = (u128)a.v[j] * b.v[i] + t[j] + c;
      t[j] = (u64)s;
      c = s >> 64;
    }
    u64 t4 = (u64)((u128)t[4] + c);
    u64 carry_hi = (u64)(((u128)t[4] + c) >> 64);
    // m = t[0] * n' mod 2^64; t += m * p; t >>= 64
    u64 m = t[0] * FR_NINV;
    c = ((u128)m * FRP[0] + t[0]) >> 64;
    for (int j = 1; j < 4; j++) {
      u128 s = (u128)m * FRP[j] + t[j] + c;
      t[j - 1] = (u64)s;
      c = s >> 64;
    }
    u128 s = (u128)t4 + c;
    t[3] = (u64)s;
    t[4] = carry_hi + (u64)(s >> 64);
  }
  Fr r;
  std::memcpy(r.v, t, 32);
  if (t[4] || fr_geq_p(r.v)) fr_sub_p(r.v);
  return r;
}

inline Fr fr_to_mont(const Fr& a) {
  Fr r2;
  std::memcpy(r2.v, FR_R2, 32);
  return mont_mul(a, r2);
}

inline Fr fr_from_mont(const Fr& a) {
  Fr one = {{1, 0, 0, 0}};
  return mont_mul(a, one);
}

// plain-value product: a*b mod p (two mont muls)
inline Fr fr_mul(const Fr& a, const Fr& b) {
  return mont_mul(fr_to_mont(a), b);
}

inline Fr mont_pow(Fr base_m, const u64 e[4]) {
  // base in MONTGOMERY form; returns base^e in Montgomery form
  Fr acc = fr_to_mont(Fr{{1, 0, 0, 0}});
  for (int limb = 3; limb >= 0; limb--) {
    for (int bit = 63; bit >= 0; bit--) {
      acc = mont_mul(acc, acc);
      if ((e[limb] >> bit) & 1) acc = mont_mul(acc, base_m);
    }
  }
  return acc;
}

inline Fr mont_inv(const Fr& a_m) {
  u64 e[4];
  std::memcpy(e, FRP, 32);
  e[0] -= 2;  // p - 2 (no borrow: low limb of p is odd > 2)
  return mont_pow(a_m, e);
}

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

inline Fr squeeze_fr(KeccakState* h) {
  uint8_t d[32];
  hg_keccak_finalize_reset(h, d);
  hg_keccak_update(h, d, 32);
  Fr r;
  std::memcpy(r.v, d, 32);
  // digest < 2^256 < 6p: conditional subtractions suffice
  while (fr_geq_p(r.v)) fr_sub_p(r.v);
  return r;
}

inline Fr load_fr(const u64* p) {
  Fr r;
  std::memcpy(r.v, p, 32);
  return r;
}

inline void store_fr(u64* p, const Fr& a) { std::memcpy(p, a.v, 32); }

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// transcript reader (32-byte LE felts)
// ---------------------------------------------------------------------------

struct HgvTrFr {
  KeccakState hash;
  const uint8_t* proof;
  size_t len, pos;
};

HgvTrFr* hgv_fr_tr_new(const uint8_t* proof, size_t len) {
  HgvTrFr* t = new HgvTrFr();
  hg_keccak_init(&t->hash);
  t->proof = proof;
  t->len = len;
  t->pos = 0;
  return t;
}

void hgv_fr_tr_free(HgvTrFr* t) { delete t; }

size_t hgv_fr_tr_pos(HgvTrFr* t) { return t->pos; }

void hgv_fr_tr_common(HgvTrFr* t, const u64* xs /*[n][4]*/, size_t n) {
  hg_keccak_update(&t->hash, reinterpret_cast<const uint8_t*>(xs), 32 * n);
}

void hgv_fr_tr_common_bytes(HgvTrFr* t, const uint8_t* b, size_t n) {
  hg_keccak_update(&t->hash, b, n);
}

int hgv_fr_tr_read(HgvTrFr* t, size_t n, u64* out /*[n][4]*/) {
  if (t->pos + 32 * n > t->len) return 1;
  const uint8_t* src = t->proof + t->pos;
  for (size_t i = 0; i < n; i++) {
    Fr x;
    std::memcpy(x.v, src + 32 * i, 32);
    if (fr_geq_p(x.v)) return 2;
    store_fr(out + 4 * i, x);
  }
  hg_keccak_update(&t->hash, src, 32 * n);
  t->pos += 32 * n;
  return 0;
}

void hgv_fr_tr_squeeze(HgvTrFr* t, size_t n, u64* out /*[n][4]*/) {
  for (size_t i = 0; i < n; i++) store_fr(out + 4 * i, squeeze_fr(&t->hash));
}

int hgv_fr_tr_verify_sumcheck(HgvTrFr* t, int degree, int num_vars,
                              const u64 claim_in[4], u64 final_out[4],
                              u64* challenges_out /*[nv][4]*/) {
  int npts = degree;
  int n = degree + 1;
  if (n > 16) return 3;
  Fr claim_m = fr_to_mont(load_fr(claim_in));
  // lagrange inverse denominators (Montgomery)
  Fr dinv[16];
  for (int i = 0; i < n; i++) {
    long long den = 1;
    for (int j = 0; j < n; j++)
      if (j != i) den *= (i - j);
    Fr d = {{0, 0, 0, 0}};
    if (den >= 0) {
      d.v[0] = (u64)den;
    } else {
      Fr pos = {{(u64)(-den), 0, 0, 0}};
      d = fr_sub(Fr{{0, 0, 0, 0}}, pos);
    }
    dinv[i] = mont_inv(fr_to_mont(d));
  }
  u64 evals[16 * 4];
  Fr ys[16], pre[17], suf[17], diffs[16];
  Fr one_m = fr_to_mont(Fr{{1, 0, 0, 0}});
  for (int v = 0; v < num_vars; v++) {
    int rc = hgv_fr_tr_read(t, npts, evals);
    if (rc) return rc;
    Fr r = squeeze_fr(&t->hash);
    store_fr(challenges_out + 4 * v, r);
    Fr r_m = fr_to_mont(r);
    ys[0] = fr_to_mont(load_fr(evals));
    ys[1] = fr_sub(claim_m, ys[0]);
    for (int i = 1; i < npts; i++)
      ys[i + 1] = fr_to_mont(load_fr(evals + 4 * i));
    for (int j = 0; j < n; j++) {
      Fr jm = fr_to_mont(Fr{{(u64)j, 0, 0, 0}});
      diffs[j] = fr_sub(r_m, jm);
    }
    pre[0] = one_m;
    for (int j = 0; j < n; j++) pre[j + 1] = mont_mul(pre[j], diffs[j]);
    suf[n] = one_m;
    for (int j = n - 1; j >= 0; j--) suf[j] = mont_mul(suf[j + 1], diffs[j]);
    Fr acc = {{0, 0, 0, 0}};
    for (int i = 0; i < n; i++) {
      Fr li = mont_mul(mont_mul(pre[i], suf[i + 1]), dinv[i]);
      acc = fr_add(acc, mont_mul(ys[i], li));
    }
    claim_m = acc;
  }
  store_fr(final_out, fr_from_mont(claim_m));
  return 0;
}

// ---------------------------------------------------------------------------
// table kernels ([N][4] plain-value arrays)
// ---------------------------------------------------------------------------

void hgv_fr_eq_table(const u64* point /*[v][4]*/, int v, u64* out /*[N][4]*/) {
  Fr one_m = fr_to_mont(Fr{{1, 0, 0, 0}});
  store_fr(out, fr_from_mont(one_m));
  // build in Montgomery in-place, convert at the end
  Fr* buf = new Fr[(size_t)1 << v];
  buf[0] = one_m;
  for (int j = 0; j < v; j++) {
    size_t half = (size_t)1 << j;
    Fr r = fr_to_mont(load_fr(point + 4 * j));
    for (size_t i = half; i-- > 0;) {
      Fr hi = mont_mul(buf[i], r);
      buf[half + i] = hi;
      buf[i] = fr_sub(buf[i], hi);
    }
  }
  size_t N = (size_t)1 << v;
  for (size_t i = 0; i < N; i++) store_fr(out + 4 * i, fr_from_mont(buf[i]));
  delete[] buf;
}

void hgv_fr_d_table(const u64* r /*[v][4]*/, int v, const u64 w[4],
                    const u64 linv[4], u64* out /*[L][4]*/) {
  size_t L = (size_t)1 << v;
  Fr* wp = new Fr[L];
  Fr w_m = fr_to_mont(load_fr(w));
  Fr one_m = fr_to_mont(Fr{{1, 0, 0, 0}});
  wp[0] = one_m;
  for (size_t j = 1; j < L; j++) wp[j] = mont_mul(wp[j - 1], w_m);
  Fr* buf = new Fr[L];
  buf[0] = one_m;
  size_t size = 1;
  for (int b = v - 1; b >= 0; b--) {
    size <<= 1;
    Fr rb = fr_to_mont(load_fr(r + 4 * b));
    Fr one_minus = fr_sub(one_m, rb);
    size_t half = size >> 1;
    for (size_t i = size; i-- > 0;) {
      Fr t = buf[i % half];
      Fr f = fr_add(one_minus, mont_mul(rb, wp[(i << b) & (L - 1)]));
      buf[i] = mont_mul(t, f);
    }
  }
  Fr linv_f = load_fr(linv);
  bool scale = !(linv_f.v[0] == 1 && linv_f.v[1] == 0 && linv_f.v[2] == 0 &&
                 linv_f.v[3] == 0);
  Fr linv_m = fr_to_mont(linv_f);
  for (size_t i = 0; i < L; i++) {
    Fr x = scale ? mont_mul(buf[i], linv_m) : buf[i];
    store_fr(out + 4 * i, fr_from_mont(x));
  }
  delete[] buf;
  delete[] wp;
}

void hgv_fr_dot(const u64* a, const u64* b, size_t N, u64 out[4]) {
  Fr acc = {{0, 0, 0, 0}};
  for (size_t i = 0; i < N; i++) {
    acc = fr_add(acc, fr_mul(load_fr(a + 4 * i), load_fr(b + 4 * i)));
  }
  store_fr(out, acc);
}

void hgv_fr_dot_many(const u64* eq, const u64* tabs /*[T][N][4]*/, size_t T,
                     size_t N, u64* out /*[T][4]*/) {
  // convert eq once to Montgomery: saves T*N of the 2 mont muls per term
  Fr* eqm = new Fr[N];
  for (size_t i = 0; i < N; i++) eqm[i] = fr_to_mont(load_fr(eq + 4 * i));
  for (size_t t = 0; t < T; t++) {
    Fr acc = {{0, 0, 0, 0}};
    const u64* tab = tabs + t * N * 4;
    for (size_t i = 0; i < N; i++)
      acc = fr_add(acc, mont_mul(eqm[i], load_fr(tab + 4 * i)));
    store_fr(out + 4 * t, acc);
  }
  delete[] eqm;
}

void hgv_fr_eq_eval(const u64* x, const u64* y, size_t n, u64 out[4]) {
  Fr one_m = fr_to_mont(Fr{{1, 0, 0, 0}});
  Fr acc = one_m;
  for (size_t i = 0; i < n; i++) {
    Fr xi = fr_to_mont(load_fr(x + 4 * i));
    Fr yi = fr_to_mont(load_fr(y + 4 * i));
    Fr t = mont_mul(xi, yi);
    Fr u = mont_mul(fr_sub(one_m, xi), fr_sub(one_m, yi));
    acc = mont_mul(acc, fr_add(t, u));
  }
  store_fr(out, fr_from_mont(acc));
}

// grand-product layer helpers; ev = [m][2][4] (l_i, r_i) transcript order
void hgv_fr_gp_dot(const u64* a, const u64* b, size_t m, u64 out[4]) {
  hgv_fr_dot(a, b, m, out);
}

void hgv_fr_gp_dot3(const u64* a, const u64* ev, size_t m, u64 out[4]) {
  Fr acc = {{0, 0, 0, 0}};
  for (size_t i = 0; i < m; i++) {
    Fr ai = fr_to_mont(load_fr(a + 4 * i));
    Fr l = fr_to_mont(load_fr(ev + 8 * i));
    Fr r = load_fr(ev + 8 * i + 4);  // plain: two mont factors cancel R
    acc = fr_add(acc, mont_mul(mont_mul(ai, l), r));
  }
  store_fr(out, acc);
}

void hgv_fr_gp_mix(const u64* ev, size_t m, const u64 mu[4], u64* out) {
  Fr mu_m = fr_to_mont(load_fr(mu));
  for (size_t i = 0; i < m; i++) {
    Fr l = load_fr(ev + 8 * i);
    Fr r = load_fr(ev + 8 * i + 4);
    Fr c = fr_add(l, mont_mul(mu_m, fr_sub(r, l)));
    store_fr(out + 4 * i, c);
  }
}

// elementwise vectors (npfield bn254 base ops): [N][4] plain arrays
void hgv_fr_vec_add(const u64* a, const u64* b, size_t N, u64* out) {
  for (size_t i = 0; i < N; i++)
    store_fr(out + 4 * i, fr_add(load_fr(a + 4 * i), load_fr(b + 4 * i)));
}

void hgv_fr_vec_sub(const u64* a, const u64* b, size_t N, u64* out) {
  for (size_t i = 0; i < N; i++)
    store_fr(out + 4 * i, fr_sub(load_fr(a + 4 * i), load_fr(b + 4 * i)));
}

void hgv_fr_vec_mul(const u64* a, const u64* b, size_t N, u64* out) {
  for (size_t i = 0; i < N; i++)
    store_fr(out + 4 * i,
             fr_mul(load_fr(a + 4 * i), load_fr(b + 4 * i)));
}

void hgv_fr_vec_scale(const u64* a, const u64 c[4], size_t N, u64* out) {
  Fr cm = fr_to_mont(load_fr(c));
  for (size_t i = 0; i < N; i++)
    store_fr(out + 4 * i, mont_mul(cm, load_fr(a + 4 * i)));
}

void hgv_fr_vec_neg(const u64* a, size_t N, u64* out) {
  Fr z = {{0, 0, 0, 0}};
  for (size_t i = 0; i < N; i++)
    store_fr(out + 4 * i, fr_sub(z, load_fr(a + 4 * i)));
}

void hgv_fr_vec_sum(const u64* a, size_t N, u64 out[4]) {
  Fr acc = {{0, 0, 0, 0}};
  for (size_t i = 0; i < N; i++) acc = fr_add(acc, load_fr(a + 4 * i));
  store_fr(out, acc);
}

}  // extern "C"
