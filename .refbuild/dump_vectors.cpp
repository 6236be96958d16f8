// Dump golden test vectors from the reference implementation:
//   - negacyclic NTT in/out pairs (2 moduli x 2 ring sizes)
//   - PackedEncoding encode() coefficient vectors for known inputs
// Output: JSON to stdout (redirected into tests/vectors/).
#include <cstdio>
#include <cstdint>
#include <vector>

#include "openfhe.h"
#include "math/hal/basicint.h"

using namespace lbcrypto;

static void dump_u64_vec(const char* name, const std::vector<uint64_t>& v) {
    std::printf("\"%s\": [", name);
    for (size_t i = 0; i < v.size(); i++)
        std::printf("%s%llu", i ? "," : "", (unsigned long long)v[i]);
    std::printf("]");
}

int main() {
    std::printf("{\n\"ntt\": [\n");
    bool first = true;
    for (uint32_t logn : {10, 13}) {
        uint32_t n = 1u << logn;
        uint32_t m = 2 * n;
        // two NTT-friendly moduli below 2^27 (kara-compatible) and one
        // larger 28-bit one
        std::vector<uint64_t> mods;
        {
            NativeInteger q = FirstPrime<NativeInteger>(26, m);
            mods.push_back(q.ConvertToInt());
            q = NextPrime<NativeInteger>(q, m);
            mods.push_back(q.ConvertToInt());
        }
        for (uint64_t qq : mods) {
            NativeInteger q(qq);
            NativeInteger root = RootOfUnity<NativeInteger>(m, q);
            // deterministic input: x[i] = (i*i + 7) mod q
            NativeVector x(n, q);
            for (uint32_t i = 0; i < n; i++)
                x[i] = NativeInteger((uint64_t)((1ull * i * i + 7) % qq));
            NativeVector y(n, q);
            ChineseRemainderTransformFTT<NativeVector>().PreCompute(root, m, q);
            ChineseRemainderTransformFTT<NativeVector>().ForwardTransformToBitReverse(
                x, root, m, &y);
            std::vector<uint64_t> xin(n), yout(n);
            for (uint32_t i = 0; i < n; i++) {
                xin[i] = x[i].ConvertToInt();
                yout[i] = y[i].ConvertToInt();
            }
            std::printf("%s{\"n\": %u, \"q\": %llu, \"root\": %llu, ",
                        first ? "" : ",\n", n, (unsigned long long)qq,
                        (unsigned long long)root.ConvertToInt());
            dump_u64_vec("x", xin);
            std::printf(", ");
            dump_u64_vec("y_bitrev", yout);
            std::printf("}");
            first = false;
        }
    }
    std::printf("\n],\n");

    // PackedEncoding: encode integer slots -> coefficients mod t
    std::printf("\"packed\": [\n");
    first = true;
    for (uint32_t logn : {10, 12}) {
        uint32_t n = 1u << logn;
        uint32_t m = 2 * n;
        PlaintextModulus t = 65537;
        auto params = std::make_shared<ILNativeParams>(m, NativeInteger(537133057), NativeInteger(1));
        EncodingParams ep(std::make_shared<EncodingParamsImpl>(t));
        std::vector<int64_t> vals(n);
        for (uint32_t i = 0; i < n; i++)
            vals[i] = (int64_t)((i * 31 + 5) % t);
        PackedEncoding pt(params, ep, vals);
        pt.Encode();
        auto& poly = pt.GetElement<NativePoly>();
        std::vector<uint64_t> coef(n);
        for (uint32_t i = 0; i < n; i++)
            coef[i] = poly[i].ConvertToInt();
        std::printf("%s{\"n\": %u, \"t\": %u, ", first ? "" : ",\n", n, t);
        dump_u64_vec("slots", std::vector<uint64_t>(vals.begin(), vals.end()));
        std::printf(", ");
        dump_u64_vec("coeffs_mod_t", coef);
        std::printf("}");
        first = false;
    }
    std::printf("\n]\n}\n");
    return 0;
}
