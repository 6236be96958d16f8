// Native host kernels for openfhe-tpu.
//
// TPU-native analog of the reference's BigInteger host machinery
// (/root/reference src/core/include/math/hal/bigintfxd et al.): the device
// never needs >32-bit scalars, but the host data boundary (CKKS decode,
// schemelet conversions) does exact CRT work. This library implements
// Garner's mixed-radix CRT with __int128 intermediates, exposed over a
// C ABI for ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfhe_host.so fhe_host.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

using u32 = uint32_t;
using u64 = uint64_t;
using u128 = unsigned __int128;
using i64 = int64_t;

static inline u64 mulmod64(u64 a, u64 b, u64 q) {
    return (u64)(((u128)a * b) % q);
}

static inline u64 powmod64(u64 a, u64 e, u64 q) {
    u64 r = 1 % q;
    a %= q;
    while (e) {
        if (e & 1) r = mulmod64(r, a, q);
        a = mulmod64(a, a, q);
        e >>= 1;
    }
    return r;
}

static inline u64 invmod64(u64 a, u64 q) {   // q prime
    return powmod64(a % q, q - 2, q);
}

extern "C" {

// Garner mixed-radix digits for one chain:
//   x = d0 + d1*q0 + d2*q0*q1 + ...  with 0 <= di < qi
// residues: [k][n] row-major uint32; moduli: [k]; out digits: [k][n] u64.
void garner_digits(const u32* residues, const u64* moduli, int k, int n,
                   u64* digits) {
    // precompute prefix products pref[j][i] = (q_0*...*q_{i-1}) mod q_j
    // and prefinv[j] = inv(pref[j][j]) mod q_j; then fill digit-major so
    // the hot loop is a flat multiply-accumulate over coefficients.
    std::vector<u64> pref((u64)k * k), prefinv(k, 1);
    for (int j = 1; j < k; ++j) {
        u64 qj = moduli[j];
        u64 prod = 1 % qj;
        for (int i = 0; i <= j; ++i) {
            pref[(u64)j * k + i] = prod;
            if (i < j) prod = mulmod64(prod, moduli[i] % qj, qj);
        }
        prefinv[j] = invmod64(prod, qj);
    }
    // d0
    for (int t = 0; t < n; ++t)
        digits[t] = residues[t];
    // digits and prefix weights are < 2^31, so a u128 accumulator takes
    // the whole inner sum with ONE modular reduction per (j, t)
    for (int j = 1; j < k; ++j) {
        u64 qj = moduli[j];
        const u32* xj = residues + (u64)j * n;
        u64* dj = digits + (u64)j * n;
        u64 pinv = prefinv[j];
        const u64* prefj = pref.data() + (u64)j * k;
        for (int t = 0; t < n; ++t) {
            u128 acc = digits[t];
            for (int i = 1; i < j; ++i)
                acc += (u128)digits[(u64)i * n + t] * prefj[i];
            u64 a = (u64)(acc % qj);
            u64 diff = (xj[t] % qj + qj - a) % qj;
            dj[t] = mulmod64(diff, pinv, qj);
        }
    }
}

// CKKS decode helper: centered CRT value as double.
//   out[t] = centered(x_t mod Q) as double (exact to double precision)
void crt_interpolate_centered_double(const u32* residues, const u64* moduli,
                                     int k, int n, double* out) {
    std::vector<u64> digits((u64)k * n);
    garner_digits(residues, moduli, k, n, digits.data());
    // weights w_j = prod_{i<j} q_i as double, and Q
    std::vector<double> w(k);
    double q_tot = 1.0;
    for (int j = 0; j < k; ++j) {
        w[j] = q_tot;
        q_tot *= (double)moduli[j];
    }
    // The decoded value is tiny relative to Q, so a direct float sum of
    // Q - small would cancel catastrophically. Decide the sign from the
    // top digit and negate in DIGIT space (exact) before the float sum.
    for (int t = 0; t < n; ++t) {
        u64 top = digits[(u64)(k - 1) * n + t];
        bool neg = (k > 1) ? (top > moduli[k - 1] / 2)
                           : (top > moduli[0] / 2);
        double v = 0.0;
        if (!neg) {
            for (int j = k - 1; j >= 0; --j)
                v += (double)digits[(u64)j * n + t] * w[j];
        } else {
            // digits of Q - x: complement each digit then add 1 w/ carry
            u64 carry = 1;
            for (int j = 0; j < k; ++j) {
                u64 d = moduli[j] - 1 - digits[(u64)j * n + t] + carry;
                carry = (d >= moduli[j]) ? 1 : 0;
                if (carry) d -= moduli[j];
                v += (double)d * w[j];
            }
            v = -v;
        }
        out[t] = v;
    }
}

// Exact residue lift of signed 64-bit values: out[i][t] = v_t mod q_i.
void to_residues_i64(const i64* values, const u64* moduli, int k, int n,
                     u32* out) {
    for (int i = 0; i < k; ++i) {
        i64 q = (i64)moduli[i];
        for (int t = 0; t < n; ++t) {
            i64 r = values[t] % q;
            if (r < 0) r += q;
            out[(u64)i * n + t] = (u32)r;
        }
    }
}

// Negacyclic NTT mod q (q < 2^32, q = 1 mod 2n), in place over a batch.
// psi_br / ipsi_br are the bit-reversed power tables shared with the
// Python host kernel (pke/encoding/packed.py _host_tables); layouts and
// butterfly order match it exactly so outputs are bit-identical.
void host_ntt(u64* x, int batch, int n, u64 q, const u64* psi_br,
              const u64* ipsi_br, u64 ninv, int inverse) {
    for (int b = 0; b < batch; ++b) {
        u64* a = x + (u64)b * n;
        if (!inverse) {
            int step = n;
            for (int m = 1; m < n; m <<= 1) {
                step >>= 1;
                for (int i = 0; i < m; ++i) {
                    u64 s = psi_br[m + i];
                    int j1 = 2 * i * step;
                    for (int j = j1; j < j1 + step; ++j) {
                        u64 u = a[j];
                        u64 v = mulmod64(a[j + step], s, q);
                        u64 lo = u + v;
                        a[j] = lo >= q ? lo - q : lo;
                        a[j + step] = u >= v ? u - v : u + q - v;
                    }
                }
            }
        } else {
            int step = 1;
            for (int m = n >> 1; m >= 1; m >>= 1) {
                for (int i = 0; i < m; ++i) {
                    u64 s = ipsi_br[m + i];
                    int j1 = 2 * i * step;
                    for (int j = j1; j < j1 + step; ++j) {
                        u64 u = a[j];
                        u64 v = a[j + step];
                        u64 lo = u + v;
                        a[j] = lo >= q ? lo - q : lo;
                        a[j + step] = mulmod64(u >= v ? u - v : u + q - v,
                                               s, q);
                    }
                }
                step <<= 1;
            }
            for (int j = 0; j < n; ++j)
                a[j] = mulmod64(a[j], ninv, q);
        }
    }
}

// Centered exact modulus switch between single-word moduli:
//   out = round(centered(v mod q_from) * q_to / q_from) mod q_to
void switch_centered_u64(const u64* values, u64 q_from, u64 q_to, int n,
                         u64* out) {
    u64 half = q_from >> 1;
    for (int t = 0; t < n; ++t) {
        u128 v = values[t];
        bool neg = values[t] > half;
        u128 c = neg ? (u128)(q_from - values[t]) : v;
        u128 r = ((u128)c * q_to + q_from / 2) / q_from;
        u64 rr = (u64)(r % q_to);
        out[t] = neg ? (q_to - rr) % q_to : rr;
    }
}

}  // extern "C"
