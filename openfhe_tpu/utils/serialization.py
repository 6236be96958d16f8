"""Serialization: versioned flat binary + JSON for every crypto object.

Reference analog: /root/reference src/core/include/utils/serial.h (cereal
binary/JSON archives), src/pke/include/cryptocontext-ser.h:115-218
(context/key/ciphertext serialization incl. the static eval-key maps), and
cryptocontextfactory.h (context dedup on deserialize).

TPU-first design: no polymorphic archive — each object is (type tag,
version, static metadata JSON, raw uint32 tensor blobs). The binary layout
is:  magic 'OFT1' | u32 header_len | header JSON (utf-8) | blob bytes...
JSON mode base64-encodes the blobs inline. Deserialized objects re-bind to
a deduplicated CryptoContext through `CryptoContextFactory`.
"""

from __future__ import annotations

import base64
import dataclasses
import enum
import json
import struct as _struct

import jax.numpy as jnp
import numpy as np

from openfhe_tpu.pke.ciphertext import Ciphertext, Plaintext
from openfhe_tpu.pke.keys import EvalKey, KeyPair, PrivateKey, PublicKey

MAGIC = b"OFT1"
VERSION = 1


class SerType(enum.Enum):
    BINARY = "BINARY"
    JSON = "JSON"


# ---------------------------------------------------------------------------
# pytree <-> (header, blobs)
# ---------------------------------------------------------------------------

def _array_entry(name, arr, blobs):
    a = np.asarray(arr)
    offset = sum(len(b) for b in blobs)
    blobs.append(a.tobytes())
    return {"name": name, "dtype": str(a.dtype), "shape": list(a.shape),
            "offset": offset, "nbytes": a.nbytes}


def _pack(type_name: str, meta: dict, arrays: dict) -> tuple:
    blobs = []
    entries = [_array_entry(k, v, blobs) for k, v in arrays.items()]
    header = {"type": type_name, "version": VERSION, "meta": meta,
              "arrays": entries}
    return header, b"".join(blobs)


def _unpack_arrays(header, blob) -> dict:
    out = {}
    for e in header["arrays"]:
        a = np.frombuffer(blob[e["offset"]:e["offset"] + e["nbytes"]],
                          dtype=e["dtype"]).reshape(e["shape"])
        out[e["name"]] = jnp.asarray(a)
    return out


def _obj_to_parts(obj):
    if isinstance(obj, Ciphertext):
        meta = {"level": obj.level, "noise_deg": obj.noise_deg,
                "scale": obj.scale, "slots": obj.slots,
                "key_tag": obj.key_tag, "encoding": obj.encoding,
                "scale_int": obj.scale_int, "n_elements": len(obj.elements)}
        arrays = {f"c{i}": e for i, e in enumerate(obj.elements)}
        return "Ciphertext", meta, arrays
    if isinstance(obj, Plaintext):
        meta = {"fmt": obj.fmt, "level": obj.level, "noise_deg": obj.noise_deg,
                "scale": obj.scale, "slots": obj.slots,
                "encoding": obj.encoding, "scale_int": obj.scale_int}
        return "Plaintext", meta, {"poly": obj.poly}
    if isinstance(obj, PublicKey):
        return "PublicKey", {"key_tag": obj.key_tag}, {"b": obj.b, "a": obj.a}
    if isinstance(obj, PrivateKey):
        return "PrivateKey", {"key_tag": obj.key_tag}, {"s_qp": obj.s_qp}
    if isinstance(obj, EvalKey):
        return "EvalKey", {"key_tag": obj.key_tag}, {"bv": obj.bv,
                                                     "av": obj.av}
    from openfhe_tpu.binfhe import lwe as _lwe
    if isinstance(obj, _lwe.LWECiphertext):
        return "LWECiphertext", {"modulus": obj.modulus,
                                 "pt_modulus": obj.pt_modulus}, \
            {"a": obj.a, "b": obj.b}
    if isinstance(obj, _lwe.LWEPrivateKey):
        return "LWEPrivateKey", {}, {"s": obj.s}
    if isinstance(obj, _lwe.LWESwitchingKey):
        return "LWESwitchingKey", {"mod_ks": obj.mod_ks,
                                   "base_ks": obj.base_ks}, \
            {"a": obj.a, "b": obj.b}
    if isinstance(obj, dict):  # eval-key maps (tag -> EvalKey / {g: EvalKey})
        raise TypeError("use serialize_eval_key_map for key maps")
    if isinstance(obj, (np.ndarray, jnp.ndarray)):
        # raw tensors (e.g. binfhe refresh keys, which are single device
        # arrays by design — reference analog: RingGSWACCKey cereal blobs)
        return "NdArray", {}, {"a": obj}
    if isinstance(obj, (tuple, list)):
        # fixed-shape tuples of tensors (e.g. AP/LMKCDEY key bundles)
        metas, arrays = [], {}
        for i, item in enumerate(obj):
            if isinstance(item, (np.ndarray, jnp.ndarray)):
                arrays[f"t{i}"] = item
                metas.append(None)
            elif isinstance(item, (int, float)):
                metas.append(item)
            else:
                raise TypeError(f"cannot serialize tuple item {type(item)}")
        return "TensorTuple", {"items": metas,
                               "is_list": isinstance(obj, list)}, arrays
    raise TypeError(f"cannot serialize {type(obj)}")


def _parts_to_obj(header, arrays):
    t = header["type"]
    m = header["meta"]
    if t == "Ciphertext":
        elems = tuple(arrays[f"c{i}"] for i in range(m["n_elements"]))
        return Ciphertext(elements=elems, level=m["level"],
                          noise_deg=m["noise_deg"], scale=m["scale"],
                          slots=m["slots"], key_tag=m["key_tag"],
                          encoding=m["encoding"], scale_int=m["scale_int"])
    if t == "Plaintext":
        return Plaintext(poly=arrays["poly"], fmt=m["fmt"], level=m["level"],
                         noise_deg=m["noise_deg"], scale=m["scale"],
                         slots=m["slots"], encoding=m["encoding"],
                         scale_int=m["scale_int"])
    if t == "PublicKey":
        return PublicKey(b=arrays["b"], a=arrays["a"], key_tag=m["key_tag"])
    if t == "PrivateKey":
        return PrivateKey(s_qp=arrays["s_qp"], key_tag=m["key_tag"])
    if t == "EvalKey":
        return EvalKey(bv=arrays["bv"], av=arrays["av"],
                       key_tag=m["key_tag"])
    if t == "LWECiphertext":
        from openfhe_tpu.binfhe import lwe as _lwe
        return _lwe.LWECiphertext(a=arrays["a"], b=arrays["b"],
                                  modulus=m["modulus"],
                                  pt_modulus=m["pt_modulus"])
    if t == "LWEPrivateKey":
        from openfhe_tpu.binfhe import lwe as _lwe
        return _lwe.LWEPrivateKey(s=arrays["s"])
    if t == "LWESwitchingKey":
        from openfhe_tpu.binfhe import lwe as _lwe
        return _lwe.LWESwitchingKey(a=arrays["a"], b=arrays["b"],
                                    mod_ks=m["mod_ks"],
                                    base_ks=m["base_ks"])
    if t == "NdArray":
        return arrays["a"]
    if t == "TensorTuple":
        out, ti = [], 0
        for i, mv in enumerate(m["items"]):
            if mv is None:
                out.append(arrays[f"t{i}"])
            else:
                out.append(mv)
            ti += 1
        return out if m.get("is_list") else tuple(out)
    raise TypeError(f"unknown serialized type {t}")


# ---------------------------------------------------------------------------
# public API (Serial:: parity)
# ---------------------------------------------------------------------------

def serialize(obj, sertype: SerType = SerType.BINARY):
    from openfhe_tpu.pke.context import CryptoContext
    if isinstance(obj, CryptoContext):
        # contexts are pure parameter records (reference: contexts
        # serialize as CCParams and dedup through the factory)
        s = serialize_context(obj)
        return s.encode() if sertype == SerType.BINARY else s
    header, blob = _pack(*_obj_to_parts(obj))
    if sertype == SerType.BINARY:
        h = json.dumps(header).encode()
        return MAGIC + _struct.pack("<I", len(h)) + h + blob
    header["blob_b64"] = base64.b64encode(blob).decode()
    return json.dumps(header)


def deserialize(data, sertype: SerType = SerType.BINARY):
    head = data[:1]
    if head in (b"{", "{"):        # context record (JSON either way)
        s = data.decode() if isinstance(data, bytes) else data
        if '"CryptoContext"' in s[:64]:
            return deserialize_context(s)
    if sertype == SerType.BINARY:
        assert data[:4] == MAGIC, "bad magic"
        (hlen,) = _struct.unpack("<I", data[4:8])
        header = json.loads(data[8:8 + hlen].decode())
        blob = data[8 + hlen:]
    else:
        header = json.loads(data)
        blob = base64.b64decode(header.pop("blob_b64"))
    return _parts_to_obj(header, _unpack_arrays(header, blob))


def serialize_to_file(path: str, obj, sertype: SerType = SerType.BINARY):
    data = serialize(obj, sertype)
    mode = "wb" if sertype == SerType.BINARY else "w"
    with open(path, mode) as f:
        f.write(data)


def deserialize_from_file(path: str, sertype: SerType = SerType.BINARY):
    mode = "rb" if sertype == SerType.BINARY else "r"
    with open(path, mode) as f:
        return deserialize(f.read(), sertype)


# ---------------------------------------------------------------------------
# eval-key maps (reference: SerializeEvalMultKey / SerializeEvalAutomorphismKey)
# ---------------------------------------------------------------------------

def serialize_eval_mult_keys(cc, sertype=SerType.BINARY):
    items = {tag: base64.b64encode(serialize(ek)).decode()
             for tag, ek in cc.eval_mult_keys.items()}
    return json.dumps({"type": "EvalMultKeyMap", "keys": items})


def deserialize_eval_mult_keys(cc, data) -> None:
    d = json.loads(data)
    assert d["type"] == "EvalMultKeyMap"
    for tag, b in d["keys"].items():
        cc.eval_mult_keys[tag] = deserialize(base64.b64decode(b))


def serialize_eval_automorphism_keys(cc, sertype=SerType.BINARY):
    items = {tag: {str(g): base64.b64encode(serialize(ek)).decode()
                   for g, ek in gs.items()}
             for tag, gs in cc.eval_automorphism_keys.items()}
    return json.dumps({"type": "EvalAutomorphismKeyMap", "keys": items})


def deserialize_eval_automorphism_keys(cc, data) -> None:
    d = json.loads(data)
    assert d["type"] == "EvalAutomorphismKeyMap"
    for tag, gs in d["keys"].items():
        store = cc.eval_automorphism_keys.setdefault(tag, {})
        for g, b in gs.items():
            store[int(g)] = deserialize(base64.b64decode(b))


# ---------------------------------------------------------------------------
# context (de)serialization + factory dedup (cryptocontextfactory.h:56)
# ---------------------------------------------------------------------------

def _params_to_dict(params) -> dict:
    out = {}
    for f in dataclasses.fields(params):
        v = getattr(params, f.name)
        out[f.name] = v.name if isinstance(v, enum.Enum) else v
    return out


def serialize_context(cc) -> str:
    return json.dumps({"type": "CryptoContext", "version": VERSION,
                       "params": _params_to_dict(cc.params),
                       "seed": 0})


class CryptoContextFactory:
    """Context dedup cache (reference: cryptocontextfactory.cpp): contexts
    deserialized from the same parameters re-bind to one instance."""
    _cache: dict = {}

    @classmethod
    def get_context(cls, params, seed: int = 0):
        from openfhe_tpu.pke.context import CryptoContext
        key = json.dumps(_params_to_dict(params), sort_keys=True)
        if key not in cls._cache:
            cls._cache[key] = CryptoContext(params, seed=seed)
        return cls._cache[key]

    @classmethod
    def release_all_contexts(cls):
        cls._cache.clear()


def deserialize_context(data: str):
    from openfhe_tpu.pke import parameters as prm
    from openfhe_tpu.pke.constants import (EncryptionTechnique, ExecutionMode,
                                           KeySwitchTechnique, MultipartyMode,
                                           MultiplicationTechnique,
                                           ProxyReEncryptionMode,
                                           ScalingTechnique, Scheme,
                                           SecretKeyDist, SecurityLevel,
                                           DecryptionNoiseMode)
    d = json.loads(data)
    assert d["type"] == "CryptoContext"
    enum_types = {
        "scheme": Scheme, "security_level": SecurityLevel,
        "secret_key_dist": SecretKeyDist, "ks_technique": KeySwitchTechnique,
        "scaling_technique": ScalingTechnique,
        "multiplication_technique": MultiplicationTechnique,
        "encryption_technique": EncryptionTechnique,
        "pre_mode": ProxyReEncryptionMode, "multiparty_mode": MultipartyMode,
        "execution_mode": ExecutionMode,
        "decryption_noise_mode": DecryptionNoiseMode,
    }
    kw = {}
    for k, v in d["params"].items():
        kw[k] = enum_types[k][v] if k in enum_types else v
    params = prm.CCParams(**kw)
    return CryptoContextFactory.get_context(params, seed=d.get("seed", 0))
