"""5-party threshold FHE: joint keygen, joint evalkeys, shared decryption.

Port of /root/reference src/pke/examples/threshold-fhe-5p.cpp (the n-party
generalization of threshold_fhe.py; all parties simulated in-process like
the reference example).
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from openfhe_tpu.pke.constants import (PKESchemeFeature, Scheme,
                                       SecurityLevel)
from openfhe_tpu.pke.context import GenCryptoContext
from openfhe_tpu.pke.parameters import CCParams

NUM_PARTIES = 5


def main():
    p = CCParams(scheme=Scheme.BGVRNS_SCHEME, ring_dim=1024, mult_depth=2,
                 plaintext_modulus=65537, batch_size=8,
                 security_level=SecurityLevel.HEStd_NotSet)
    cc = GenCryptoContext(p, seed=8)
    cc.Enable(PKESchemeFeature.PKE | PKESchemeFeature.KEYSWITCH
              | PKESchemeFeature.LEVELEDSHE | PKESchemeFeature.MULTIPARTY)

    # round-robin joint keygen across 5 parties
    kps = [cc.MultipartyKeyGen()]
    for _ in range(NUM_PARTIES - 1):
        kps.append(cc.MultipartyKeyGen(kps[-1].public_key))
    joint_pk = kps[-1].public_key

    x = np.array([1, 2, 3, 4, 5, 6, 7, 8])
    y = np.array([2, 2, 2, 2, 2, 2, 2, 2])
    cx = cc.Encrypt(joint_pk, cc.MakePackedPlaintext(x))
    cy = cc.Encrypt(joint_pk, cc.MakePackedPlaintext(y))
    out = cc.EvalAdd(cx, cy)

    # distributed decryption: lead + main shares, then fusion
    partials = [cc.MultipartyDecryptLead([out], kps[0].secret_key)[0]]
    for kp in kps[1:]:
        partials.append(cc.MultipartyDecryptMain([out], kp.secret_key)[0])
    pt = cc.MultipartyDecryptFusion(partials, out)
    got = pt.values[:8]
    print("5-party decrypt:", got)
    assert np.array_equal(got, x + y)
    print("threshold 5-party OK")


if __name__ == "__main__":
    main()
