// Golden decrypt transcripts from the reference: BFV and BGV secret key +
// ciphertext dumps (COEFF domain, per-tower residues) with the expected
// decrypted plaintext — consumed by tests/test_golden_vectors.py to check
// our CRT scale-and-round decrypt math cross-implementation.
#include <cstdio>
#include <cstdint>
#include <vector>

#include "openfhe.h"

using namespace lbcrypto;

static void dump_u64_vec(const char* name, const std::vector<uint64_t>& v) {
    std::printf("\"%s\": [", name);
    for (size_t i = 0; i < v.size(); i++)
        std::printf("%s%llu", i ? "," : "", (unsigned long long)v[i]);
    std::printf("]");
}

template <typename Elem>
static void dump_poly_coef(const char* name, Elem poly) {
    poly.SetFormat(Format::COEFFICIENT);
    std::printf("\"%s\": [", name);
    for (size_t t = 0; t < poly.GetNumOfElements(); t++) {
        auto& p = poly.GetElementAtIndex(t);
        std::printf("%s[", t ? "," : "");
        for (size_t i = 0; i < p.GetLength(); i++)
            std::printf("%s%llu", i ? "," : "",
                        (unsigned long long)p[i].ConvertToInt());
        std::printf("]");
    }
    std::printf("]");
}

int main() {
    std::printf("{\n");
    // ---- BFV ----
    {
        CCParams<CryptoContextBFVRNS> params;
        params.SetPlaintextModulus(65537);
        params.SetMultiplicativeDepth(1);
        params.SetRingDim(1 << 10);
        params.SetScalingModSize(30);
        params.SetSecurityLevel(HEStd_NotSet);
        auto cc = GenCryptoContext(params);
        cc->Enable(PKE); cc->Enable(KEYSWITCH); cc->Enable(LEVELEDSHE);
        auto kp = cc->KeyGen();
        std::vector<int64_t> vals(16);
        for (int i = 0; i < 16; i++) vals[i] = (i * 37 + 11) % 256;
        auto pt = cc->MakeCoefPackedPlaintext(vals);
        auto ct = cc->Encrypt(kp.publicKey, pt);
        Plaintext out;
        cc->Decrypt(kp.secretKey, ct, &out);
        out->SetLength(16);
        const auto ep = ct->GetElements()[0].GetParams();
        std::printf("\"bfv_decrypt\": {\"n\": %u, \"t\": 65537, ",
                    (unsigned)ep->GetRingDimension());
        std::printf("\"moduli\": [");
        auto parms = ep->GetParams();
        for (size_t i = 0; i < parms.size(); i++)
            std::printf("%s%llu", i ? "," : "",
                        (unsigned long long)parms[i]->GetModulus().ConvertToInt());
        std::printf("], ");
        dump_poly_coef("sk", kp.secretKey->GetPrivateElement());
        std::printf(", ");
        dump_poly_coef("c0", ct->GetElements()[0]);
        std::printf(", ");
        dump_poly_coef("c1", ct->GetElements()[1]);
        std::printf(", ");
        std::vector<uint64_t> dec;
        for (int i = 0; i < 16; i++) { int64_t v = out->GetCoefPackedValue()[i]; dec.push_back((uint64_t)(v < 0 ? v + 65537 : v)); }
        dump_u64_vec("plaintext", dec);
        std::printf("},\n");
    }
    // ---- BGV ----
    {
        CCParams<CryptoContextBGVRNS> params;
        params.SetPlaintextModulus(65537);
        params.SetMultiplicativeDepth(1);
        params.SetRingDim(1 << 10);
        
        params.SetSecurityLevel(HEStd_NotSet);
        params.SetScalingTechnique(FIXEDMANUAL);
        auto cc = GenCryptoContext(params);
        cc->Enable(PKE); cc->Enable(KEYSWITCH); cc->Enable(LEVELEDSHE);
        auto kp = cc->KeyGen();
        std::vector<int64_t> vals(16);
        for (int i = 0; i < 16; i++) vals[i] = (i * 53 + 7) % 512;
        auto pt = cc->MakeCoefPackedPlaintext(vals);
        auto ct = cc->Encrypt(kp.publicKey, pt);
        Plaintext out;
        cc->Decrypt(kp.secretKey, ct, &out);
        out->SetLength(16);
        const auto ep = ct->GetElements()[0].GetParams();
        std::printf("\"bgv_decrypt\": {\"n\": %u, \"t\": 65537, ",
                    (unsigned)ep->GetRingDimension());
        std::printf("\"moduli\": [");
        auto parms = ep->GetParams();
        for (size_t i = 0; i < parms.size(); i++)
            std::printf("%s%llu", i ? "," : "",
                        (unsigned long long)parms[i]->GetModulus().ConvertToInt());
        std::printf("], ");
        dump_poly_coef("sk", kp.secretKey->GetPrivateElement());
        std::printf(", ");
        dump_poly_coef("c0", ct->GetElements()[0]);
        std::printf(", ");
        dump_poly_coef("c1", ct->GetElements()[1]);
        std::printf(", ");
        std::vector<uint64_t> dec;
        for (int i = 0; i < 16; i++) { int64_t v = out->GetCoefPackedValue()[i]; dec.push_back((uint64_t)(v < 0 ? v + 65537 : v)); }
        dump_u64_vec("plaintext", dec);
        std::printf("}\n");
    }
    std::printf("}\n");
    return 0;
}
