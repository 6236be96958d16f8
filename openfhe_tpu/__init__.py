"""openfhe_tpu — a TPU-native FHE framework (JAX/XLA/Pallas).

Feature parity target: openfhe-development (reference: the single
`#include "openfhe.h"` umbrella header, src/pke/include/openfhe.h).  This
top-level package re-exports the full user-facing API so that

    import openfhe_tpu as fhe
    cc = fhe.GenCryptoContext(fhe.CCParams(scheme=fhe.Scheme.CKKSRNS_SCHEME, ...))

mirrors the reference's one-include workflow.  Submodules stay importable
directly (openfhe_tpu.pke.context etc.) for framework-internal use.
"""

from openfhe_tpu.pke.constants import (
    CKKSDataType,
    DecryptionNoiseMode,
    EncryptionTechnique,
    ExecutionMode,
    Format,
    KeySwitchTechnique,
    MultipartyMode,
    MultiplicationTechnique,
    PKESchemeFeature,
    PlaintextEncodings,
    ProxyReEncryptionMode,
    ScalingTechnique,
    Scheme,
    SecretKeyDist,
    SecurityLevel,
)
from openfhe_tpu.pke.parameters import CCParams
from openfhe_tpu.pke.context import CryptoContext, GenCryptoContext
from openfhe_tpu.pke.keys import EvalKey, KeyPair, PrivateKey, PublicKey
from openfhe_tpu.pke.ciphertext import Ciphertext, Plaintext
from openfhe_tpu.binfhe.context import BinFHEContext
from openfhe_tpu.utils.serialization import (
    SerType,
    deserialize,
    deserialize_from_file,
    serialize,
    serialize_to_file,
)

__version__ = "0.1.0"

__all__ = [
    "BinFHEContext",
    "CCParams",
    "CKKSDataType",
    "Ciphertext",
    "CryptoContext",
    "DecryptionNoiseMode",
    "EncryptionTechnique",
    "EvalKey",
    "ExecutionMode",
    "Format",
    "GenCryptoContext",
    "KeyPair",
    "KeySwitchTechnique",
    "MultipartyMode",
    "MultiplicationTechnique",
    "PKESchemeFeature",
    "Plaintext",
    "PlaintextEncodings",
    "PrivateKey",
    "ProxyReEncryptionMode",
    "PublicKey",
    "ScalingTechnique",
    "Scheme",
    "SecretKeyDist",
    "SecurityLevel",
    "SerType",
    "deserialize",
    "deserialize_from_file",
    "serialize",
    "serialize_to_file",
]
