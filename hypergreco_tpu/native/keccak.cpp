// Keccak-256 (original padding 0x01, rate 136) — native transcript hash.
//
// The Fiat-Shamir transcript performs thousands of absorb/squeeze operations
// per proof (one per sumcheck round message); pure-Python keccak-f costs
// ~100us/permutation which would dominate verify time, so the hot path is
// native (reference uses the Rust `keccak` crate via plonkish's Keccak256,
// transcript.rs:11).
//
// Build: g++ -O3 -shared -fPIC -o libhg_native.so keccak.cpp parse.cpp

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

const int ROT[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55, 20, 3,  10, 43,
                     25, 39, 41, 45, 15, 21, 8,  18, 2,  61, 56, 14};

inline uint64_t rotl(uint64_t x, int n) {
  return n == 0 ? x : (x << n) | (x >> (64 - n));
}

void keccakf(uint64_t st[25]) {
  uint64_t bc[5], t;
  for (int round = 0; round < 24; round++) {
    // theta
    for (int i = 0; i < 5; i++)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (int i = 0; i < 5; i++) {
      t = bc[(i + 4) % 5] ^ rotl(bc[(i + 1) % 5], 1);
      for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    // rho + pi
    uint64_t tmp[25];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) {
        int src = x + 5 * y;
        int dst = y + 5 * ((2 * x + 3 * y) % 5);
        tmp[dst] = rotl(st[src], ROT[src]);
      }
    // chi
    for (int y = 0; y < 25; y += 5)
      for (int x = 0; x < 5; x++)
        st[y + x] = tmp[y + x] ^ ((~tmp[y + (x + 1) % 5]) & tmp[y + (x + 2) % 5]);
    // iota
    st[0] ^= RC[round];
  }
}

constexpr size_t RATE = 136;  // keccak-256

}  // namespace

extern "C" {

struct KeccakState {
  uint64_t st[25];
  size_t pos;
};

void hg_keccak_init(KeccakState* s) { std::memset(s, 0, sizeof(*s)); }

void hg_keccak_update(KeccakState* s, const uint8_t* data, size_t len) {
  uint8_t* bytes = reinterpret_cast<uint8_t*>(s->st);
  while (len > 0) {
    size_t take = RATE - s->pos;
    if (take > len) take = len;
    for (size_t i = 0; i < take; i++) bytes[s->pos + i] ^= data[i];
    s->pos += take;
    data += take;
    len -= take;
    if (s->pos == RATE) {
      keccakf(s->st);
      s->pos = 0;
    }
  }
}

// finalize (keccak 0x01 padding), write the 32-byte digest, reset the state.
void hg_keccak_finalize_reset(KeccakState* s, uint8_t out[32]) {
  uint8_t* bytes = reinterpret_cast<uint8_t*>(s->st);
  bytes[s->pos] ^= 0x01;
  bytes[RATE - 1] ^= 0x80;
  keccakf(s->st);
  std::memcpy(out, bytes, 32);
  std::memset(s, 0, sizeof(*s));
}

// one-shot digest
void hg_keccak256(const uint8_t* data, size_t len, uint8_t out[32]) {
  KeccakState s;
  hg_keccak_init(&s);
  hg_keccak_update(&s, data, len);
  hg_keccak_finalize_reset(&s, out);
}

}  // extern "C"
