// Baseline measurement harness for the OpenFHE reference libraries.
// Own timing code (std::chrono) against the public API — measures the
// metrics our bench.py mirrors. Single JSON line per metric on stdout.
#include <chrono>
#include <cstdio>
#include <cstdint>
#include <functional>
#include <string>
#include <vector>

#include "openfhe.h"
#include "binfhecontext.h"
#include "math/hal/basicint.h"

using namespace lbcrypto;
using Clock = std::chrono::steady_clock;

static double time_loop(const std::function<void()>& fn, double min_sec = 2.0,
                        int min_iters = 3) {
    // warmup
    fn();
    int iters = 0;
    auto t0 = Clock::now();
    for (;;) {
        fn();
        ++iters;
        double el = std::chrono::duration<double>(Clock::now() - t0).count();
        if (el >= min_sec && iters >= min_iters)
            return el / iters;
    }
}

static void emit(const std::string& metric, double value, const std::string& unit) {
    std::printf("{\"metric\": \"%s\", \"value\": %.6g, \"unit\": \"%s\"}\n",
                metric.c_str(), value, unit.c_str());
    std::fflush(stdout);
}

static void bench_ntt() {
    // Negacyclic NTT via ChineseRemainderTransformFTT, matching our ntt_fwd.
    for (uint32_t logn : {13, 14, 16}) {
        uint32_t n = 1u << logn;
        uint32_t m = 2 * n;
        NativeInteger q = LastPrime<NativeInteger>(MAX_MODULUS_SIZE, m);
        NativeInteger root = RootOfUnity<NativeInteger>(m, q);
        DiscreteUniformGeneratorImpl<NativeVector> dug;
        dug.SetModulus(q);
        NativeVector x = dug.GenerateVector(n);
        NativeVector y(n, q);
        ChineseRemainderTransformFTT<NativeVector>().PreCompute(root, m, q);
        double dt = time_loop([&]() {
            ChineseRemainderTransformFTT<NativeVector>().ForwardTransformToBitReverse(
                x, root, m, &y);
        });
        emit("ref_ntt_fwd_ms_N" + std::to_string(n), dt * 1e3, "ms");
    }
}

static void bench_ckks_mult() {
    // North-star mirror: CKKS EvalMult + relin at N=2^16, depth 30.
    CCParams<CryptoContextCKKSRNS> parameters;
    parameters.SetMultiplicativeDepth(30);
    parameters.SetScalingModSize(28);
    parameters.SetFirstModSize(30);
    parameters.SetRingDim(1 << 16);
    parameters.SetSecurityLevel(HEStd_128_classic);
    parameters.SetScalingTechnique(FIXEDMANUAL);
    parameters.SetKeySwitchTechnique(HYBRID);
    parameters.SetNumLargeDigits(3);
    CryptoContext<DCRTPoly> cc = GenCryptoContext(parameters);
    cc->Enable(PKE);
    cc->Enable(KEYSWITCH);
    cc->Enable(LEVELEDSHE);
    auto keys = cc->KeyGen();
    cc->EvalMultKeyGen(keys.secretKey);
    std::vector<double> vals(cc->GetRingDimension() / 2, 1.0);
    for (size_t i = 0; i < vals.size(); i++) vals[i] = 0.001 * (i % 100);
    Plaintext pt = cc->MakeCKKSPackedPlaintext(vals);
    auto ct1 = cc->Encrypt(keys.publicKey, pt);
    auto ct2 = cc->Encrypt(keys.publicKey, pt);
    double dt = time_loop([&]() { auto c = cc->EvalMult(ct1, ct2); }, 3.0);
    emit("ref_ckks_evalmult_relin_ct_per_s_N65536_L30", 1.0 / dt, "ciphertexts/s");
    double dt2 = time_loop([&]() { auto c = cc->EvalAdd(ct1, ct2); }, 1.0);
    emit("ref_ckks_evaladd_ms_N65536_L30", dt2 * 1e3, "ms");
    auto ctm = cc->EvalMult(ct1, ct2);
    double dt3 = time_loop([&]() { auto c = cc->Rescale(ctm); }, 1.0);
    emit("ref_ckks_rescale_ms_N65536_L30", dt3 * 1e3, "ms");
}

static void bench_bfv_bgv() {
    {
        CCParams<CryptoContextBFVRNS> parameters;
        parameters.SetPlaintextModulus(65537);
        parameters.SetMultiplicativeDepth(2);
        parameters.SetRingDim(1 << 14);
        parameters.SetSecurityLevel(HEStd_128_classic);
        CryptoContext<DCRTPoly> cc = GenCryptoContext(parameters);
        cc->Enable(PKE);
        cc->Enable(KEYSWITCH);
        cc->Enable(LEVELEDSHE);
        auto keys = cc->KeyGen();
        cc->EvalMultKeyGen(keys.secretKey);
        std::vector<int64_t> v(8192, 3);
        Plaintext pt = cc->MakePackedPlaintext(v);
        auto ct1 = cc->Encrypt(keys.publicKey, pt);
        auto ct2 = cc->Encrypt(keys.publicKey, pt);
        double dt = time_loop([&]() { auto c = cc->EvalMult(ct1, ct2); }, 2.0);
        emit("ref_bfv_evalmult_relin_ms_N16384_depth2", dt * 1e3, "ms");
    }
    {
        CCParams<CryptoContextBGVRNS> parameters;
        parameters.SetPlaintextModulus(65537);
        parameters.SetMultiplicativeDepth(10);
        parameters.SetSecurityLevel(HEStd_128_classic);
        parameters.SetScalingTechnique(FLEXIBLEAUTO);
        CryptoContext<DCRTPoly> cc = GenCryptoContext(parameters);
        cc->Enable(PKE);
        cc->Enable(KEYSWITCH);
        cc->Enable(LEVELEDSHE);
        auto keys = cc->KeyGen();
        cc->EvalMultKeyGen(keys.secretKey);
        std::vector<int64_t> v(8192, 3);
        Plaintext pt = cc->MakePackedPlaintext(v);
        auto ct1 = cc->Encrypt(keys.publicKey, pt);
        auto ct2 = cc->Encrypt(keys.publicKey, pt);
        double dt = time_loop([&]() { auto c = cc->EvalMult(ct1, ct2); }, 2.0);
        emit("ref_bgv_evalmult_relin_ms_N" + std::to_string(cc->GetRingDimension())
             + "_depth10", dt * 1e3, "ms");
    }
}

static void bench_bfv_techniques() {
    // BFV multiplication method comparison at N=2^14 depth-2 (reference
    // bfv-mult-method-benchmark.cpp shape): the TPU repo serves all four
    // enum values with one integer-exact path; this measures what each
    // reference algorithm costs so that claim is backed by numbers.
    struct { MultiplicationTechnique t; const char* name; } techs[] = {
        {BEHZ, "behz"}, {HPS, "hps"}, {HPSPOVERQ, "hpspoverq"},
        {HPSPOVERQLEVELED, "hpspoverqleveled"}};
    for (auto& tc : techs) {
        CCParams<CryptoContextBFVRNS> parameters;
        parameters.SetPlaintextModulus(65537);
        parameters.SetMultiplicativeDepth(2);
        parameters.SetRingDim(1 << 14);
        parameters.SetSecurityLevel(HEStd_128_classic);
        parameters.SetMultiplicationTechnique(tc.t);
        CryptoContext<DCRTPoly> cc = GenCryptoContext(parameters);
        cc->Enable(PKE);
        cc->Enable(KEYSWITCH);
        cc->Enable(LEVELEDSHE);
        auto keys = cc->KeyGen();
        cc->EvalMultKeyGen(keys.secretKey);
        std::vector<int64_t> v(8192, 3);
        Plaintext pt = cc->MakePackedPlaintext(v);
        auto ct1 = cc->Encrypt(keys.publicKey, pt);
        auto ct2 = cc->Encrypt(keys.publicKey, pt);
        double dt = time_loop([&]() { auto c = cc->EvalMult(ct1, ct2); }, 2.0);
        emit(std::string("ref_bfv_") + tc.name +
             "_evalmult_relin_ms_N16384_depth2", dt * 1e3, "ms");
    }
}

static void bench_binfhe() {
    auto cc = BinFHEContext();
    cc.GenerateBinFHEContext(STD128, GINX);
    auto sk = cc.KeyGen();
    cc.BTKeyGen(sk);
    auto ct1 = cc.Encrypt(sk, 1);
    auto ct2 = cc.Encrypt(sk, 1);
    double dt = time_loop([&]() { auto r = cc.EvalBinGate(AND, ct1, ct2); }, 3.0);
    emit("ref_binfhe_ginx_std128_gate_ms", dt * 1e3, "ms");
    emit("ref_binfhe_ginx_std128_gates_per_s", 1.0 / dt, "gates/s");
}

static void bench_ckks_bootstrap() {
    // Mirrors simple-ckks-bootstrapping.cpp parameters (N=2^12, toy security)
    // and a production N=2^16 HEStd_128_classic config.
    for (int prod = 0; prod < 2; prod++) {
        CCParams<CryptoContextCKKSRNS> parameters;
        SecretKeyDist secretKeyDist = UNIFORM_TERNARY;
        parameters.SetSecretKeyDist(secretKeyDist);
        std::vector<uint32_t> levelBudget = {4, 4};
        uint32_t levelsAfterBootstrap = 10;
        uint32_t depth = levelsAfterBootstrap +
            FHECKKSRNS::GetBootstrapDepth(levelBudget, secretKeyDist);
        parameters.SetMultiplicativeDepth(depth);
        parameters.SetScalingModSize(59);
        parameters.SetFirstModSize(60);
        parameters.SetScalingTechnique(FLEXIBLEAUTO);
        if (prod) {
            parameters.SetSecurityLevel(HEStd_128_classic);
        } else {
            parameters.SetSecurityLevel(HEStd_NotSet);
            parameters.SetRingDim(1 << 12);
        }
        CryptoContext<DCRTPoly> cc = GenCryptoContext(parameters);
        cc->Enable(PKE);
        cc->Enable(KEYSWITCH);
        cc->Enable(LEVELEDSHE);
        cc->Enable(ADVANCEDSHE);
        cc->Enable(FHE);
        uint32_t ringDim = cc->GetRingDimension();
        uint32_t numSlots = ringDim / 2;
        cc->EvalBootstrapSetup(levelBudget);
        auto keyPair = cc->KeyGen();
        cc->EvalMultKeyGen(keyPair.secretKey);
        cc->EvalBootstrapKeyGen(keyPair.secretKey, numSlots);
        std::vector<double> x(numSlots, 0.25);
        Plaintext ptxt = cc->MakeCKKSPackedPlaintext(x, 1, depth - 1, nullptr, numSlots);
        auto ct = cc->Encrypt(keyPair.publicKey, ptxt);
        double dt = time_loop([&]() { auto c = cc->EvalBootstrap(ct); }, 1.0, 1);
        emit(std::string("ref_ckks_bootstrap_s_N") + std::to_string(ringDim), dt, "s");
    }
}

int main(int argc, char** argv) {
    std::string which = argc > 1 ? argv[1] : "all";
    if (which == "all" || which == "ntt") bench_ntt();
    if (which == "all" || which == "ckks") bench_ckks_mult();
    if (which == "all" || which == "bfvbgv") bench_bfv_bgv();
    if (which == "all" || which == "bfvtech") bench_bfv_techniques();
    if (which == "all" || which == "binfhe") bench_binfhe();
    if (which == "all" || which == "boot") bench_ckks_bootstrap();
    return 0;
}
