// Reed-Solomon RS(255,223) batch codec over GF(2^8), poly 0x11d, fcr=0.
//
// Native backend for ofdm_tpu.fec.reed_solomon (same math as the Python
// implementation; behavior parity with the reference's reed_solomon crate —
// /root/reference/src/utils.rs:97-180).  Exposed via a C ABI for ctypes.
// Batch-oriented: encodes/decodes N blocks per call so the streaming FEC
// path amortizes the FFI boundary.

#include <cstdint>
#include <cstring>

namespace {

constexpr int kN = 255;
constexpr int kEcc = 32;
constexpr int kK = kN - kEcc;  // 223
constexpr int kPrim = 0x11d;

struct Tables {
    uint8_t exp[512];
    uint8_t log[256];
    uint8_t gen[kEcc + 1];

    Tables() {
        int x = 1;
        for (int i = 0; i < 255; ++i) {
            exp[i] = static_cast<uint8_t>(x);
            log[x] = static_cast<uint8_t>(i);
            x <<= 1;
            if (x & 0x100) x ^= kPrim;
        }
        for (int i = 255; i < 512; ++i) exp[i] = exp[i - 255];
        log[0] = 0;

        // generator polynomial prod_{i=0}^{31} (x - alpha^i)
        uint8_t g[kEcc + 1] = {1};
        int deg = 0;
        for (int i = 0; i < kEcc; ++i) {
            uint8_t root = exp[i];
            // multiply g by (x - root), coefficients highest-degree-first:
            // ng[j] += g[j] (times x term keeps position as length grows),
            // ng[j+1] += root * g[j]
            uint8_t ng[kEcc + 1] = {0};
            for (int j = 0; j <= deg; ++j) {
                ng[j] ^= g[j];
                ng[j + 1] ^= mul_raw(g[j], root);
            }
            ++deg;
            std::memcpy(g, ng, sizeof(g));
        }
        std::memcpy(gen, g, sizeof(gen));
    }

    uint8_t mul_raw(uint8_t a, uint8_t b) const {
        if (!a || !b) return 0;
        return exp[log[a] + log[b]];
    }
};

const Tables T;

inline uint8_t gf_mul(uint8_t a, uint8_t b) {
    if (!a || !b) return 0;
    return T.exp[T.log[a] + T.log[b]];
}

inline uint8_t gf_inv(uint8_t a) { return T.exp[255 - T.log[a]]; }

inline uint8_t gf_pow2(int p) {  // alpha^p, p may exceed 255
    p %= 255;
    if (p < 0) p += 255;
    return T.exp[p];
}

void encode_one(const uint8_t* data, uint8_t* out) {
    // systematic: out = data || parity (LFSR division by generator)
    std::memcpy(out, data, kK);
    uint8_t rem[kEcc] = {0};
    for (int i = 0; i < kK; ++i) {
        uint8_t factor = data[i] ^ rem[0];
        std::memmove(rem, rem + 1, kEcc - 1);
        rem[kEcc - 1] = 0;
        if (factor) {
            for (int j = 0; j < kEcc; ++j)
                rem[j] ^= gf_mul(factor, T.gen[j + 1]);
        }
    }
    std::memcpy(out + kK, rem, kEcc);
}

// returns 1 on success (block corrected in place), 0 on failure
int decode_one(uint8_t* block) {
    // syndromes S_i = C(alpha^i), coefficients high-to-low (block[0] = x^254)
    uint8_t synd[kEcc];
    bool all_zero = true;
    for (int i = 0; i < kEcc; ++i) {
        uint8_t s = 0;
        // Horner: C(a) = ((c0*a + c1)*a + c2)...
        uint8_t a = T.exp[i];
        for (int j = 0; j < kN; ++j) s = gf_mul(s, a) ^ block[j];
        synd[i] = s;
        all_zero &= (s == 0);
    }
    if (all_zero) return 1;

    // Berlekamp-Massey
    uint8_t C[kEcc + 1] = {1}, B[kEcc + 1] = {1};
    int L = 0, m = 1;
    uint8_t b = 1;
    for (int n = 0; n < kEcc; ++n) {
        uint8_t d = synd[n];
        for (int i = 1; i <= L; ++i) d ^= gf_mul(C[i], synd[n - i]);
        if (d == 0) {
            ++m;
        } else if (2 * L <= n) {
            uint8_t Tt[kEcc + 1];
            std::memcpy(Tt, C, sizeof(C));
            uint8_t coef = gf_mul(d, gf_inv(b));
            for (int i = 0; i + m <= kEcc; ++i)
                C[i + m] ^= gf_mul(coef, B[i]);
            L = n + 1 - L;
            std::memcpy(B, Tt, sizeof(B));
            b = d;
            m = 1;
        } else {
            uint8_t coef = gf_mul(d, gf_inv(b));
            for (int i = 0; i + m <= kEcc; ++i)
                C[i + m] ^= gf_mul(coef, B[i]);
            ++m;
        }
    }
    if (L > kEcc / 2) return 0;

    // Chien search: error at power j where C(alpha^{-j}) == 0
    int err_pos[kEcc / 2];
    int n_err = 0;
    for (int j = 0; j < kN; ++j) {
        uint8_t xinv = gf_pow2(255 - j);
        uint8_t val = 0, xp = 1;
        for (int deg = 0; deg <= L; ++deg) {
            val ^= gf_mul(C[deg], xp);
            xp = gf_mul(xp, xinv);
        }
        if (val == 0) {
            if (n_err >= kEcc / 2) return 0;
            err_pos[n_err++] = j;
        }
    }
    if (n_err != L) return 0;

    // Forney: omega = (S * C) mod x^ecc ; e = X * omega(X^-1) / C'(X^-1)
    uint8_t omega[kEcc] = {0};
    for (int i = 0; i <= L; ++i) {
        if (!C[i]) continue;
        for (int j = 0; i + j < kEcc; ++j)
            omega[i + j] ^= gf_mul(C[i], synd[j]);
    }
    for (int e = 0; e < n_err; ++e) {
        int j = err_pos[e];
        uint8_t x = gf_pow2(j);
        uint8_t xinv = gf_inv(x);
        uint8_t num = 0, xp = 1;
        for (int deg = 0; deg < kEcc; ++deg) {
            num ^= gf_mul(omega[deg], xp);
            xp = gf_mul(xp, xinv);
        }
        uint8_t den = 0;
        uint8_t xinv2 = gf_mul(xinv, xinv), xq = 1;
        for (int deg = 1; deg <= L; deg += 2) {
            den ^= gf_mul(C[deg], xq);
            xq = gf_mul(xq, xinv2);
        }
        if (!den) return 0;
        uint8_t mag = gf_mul(x, gf_mul(num, gf_inv(den)));
        block[kN - 1 - j] ^= mag;
    }
    return 1;
}

}  // namespace

extern "C" {

// in:  n_blocks * 223 bytes ; out: n_blocks * 255 bytes
void rs_encode_blocks(const uint8_t* in, int n_blocks, uint8_t* out) {
    for (int i = 0; i < n_blocks; ++i)
        encode_one(in + i * kK, out + i * kN);
}

// inout: n_blocks * 255 bytes (corrected in place); ok: n_blocks flags
void rs_decode_blocks(uint8_t* inout, int n_blocks, uint8_t* ok) {
    for (int i = 0; i < n_blocks; ++i)
        ok[i] = static_cast<uint8_t>(decode_one(inout + i * kN));
}

}  // extern "C"
