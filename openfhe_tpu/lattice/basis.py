"""RNS basis: per-tower modular constants + NTT twiddle tables as a pytree.

TPU-native replacement for the reference's cached static root-of-unity table
maps (/root/reference src/core/include/math/hal/intnat/transformnat.h:352-368)
and `ILDCRTParams` (src/core/include/lattice/ildcrtparams.h).

A `Basis` bundles, for a tuple of NTT-friendly prime moduli (q_i = 1 mod 2N,
q_i < 2^31), everything the device needs to run negacyclic NTTs and modular
arithmetic on `[k, N]` uint32 residue tensors. It is a JAX pytree whose
leaves are device arrays; the Python-int moduli ride along as static aux data
so host code can do exact big-int work (CRT interpolation, parameter gen).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from flax import struct

from openfhe_tpu.math import nbtheory
from openfhe_tpu.math.modops import mod_constants


@struct.dataclass
class Basis:
    # per-tower scalar constants, shaped [k, 1] for broadcasting over [k, N]
    q: jnp.ndarray          # moduli
    r32: jnp.ndarray        # 2^32 mod q
    r32_sh: jnp.ndarray     # shoup companion of r32
    m32: jnp.ndarray        # floor(2^32 / q)
    ninv: jnp.ndarray       # N^{-1} mod q
    ninv_sh: jnp.ndarray
    # twiddle tables, shaped [k, N]: psi^bitrev(j) for the 2N-th root psi
    psi_br: jnp.ndarray
    psi_br_sh: jnp.ndarray
    ipsi_br: jnp.ndarray
    ipsi_br_sh: jnp.ndarray
    # static host-side metadata
    moduli: tuple = struct.field(pytree_node=False)
    ring_dim: int = struct.field(pytree_node=False)

    @property
    def k(self) -> int:
        return len(self.moduli)

    def slice(self, start: int, stop: int) -> "Basis":
        """Sub-basis of towers [start, stop) — cheap array slicing."""
        return Basis(
            q=self.q[start:stop], r32=self.r32[start:stop],
            r32_sh=self.r32_sh[start:stop], m32=self.m32[start:stop],
            ninv=self.ninv[start:stop], ninv_sh=self.ninv_sh[start:stop],
            psi_br=self.psi_br[start:stop], psi_br_sh=self.psi_br_sh[start:stop],
            ipsi_br=self.ipsi_br[start:stop], ipsi_br_sh=self.ipsi_br_sh[start:stop],
            moduli=self.moduli[start:stop], ring_dim=self.ring_dim)

    def take(self, idx: tuple) -> "Basis":
        """Sub-basis of an arbitrary tower index tuple."""
        ix = np.asarray(idx)
        return Basis(
            q=self.q[ix], r32=self.r32[ix], r32_sh=self.r32_sh[ix],
            m32=self.m32[ix], ninv=self.ninv[ix], ninv_sh=self.ninv_sh[ix],
            psi_br=self.psi_br[ix], psi_br_sh=self.psi_br_sh[ix],
            ipsi_br=self.ipsi_br[ix], ipsi_br_sh=self.ipsi_br_sh[ix],
            moduli=tuple(self.moduli[i] for i in idx), ring_dim=self.ring_dim)

    def concat(self, other: "Basis") -> "Basis":
        assert self.ring_dim == other.ring_dim
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        return Basis(
            q=cat(self.q, other.q), r32=cat(self.r32, other.r32),
            r32_sh=cat(self.r32_sh, other.r32_sh), m32=cat(self.m32, other.m32),
            ninv=cat(self.ninv, other.ninv), ninv_sh=cat(self.ninv_sh, other.ninv_sh),
            psi_br=cat(self.psi_br, other.psi_br),
            psi_br_sh=cat(self.psi_br_sh, other.psi_br_sh),
            ipsi_br=cat(self.ipsi_br, other.ipsi_br),
            ipsi_br_sh=cat(self.ipsi_br_sh, other.ipsi_br_sh),
            moduli=self.moduli + other.moduli, ring_dim=self.ring_dim)

    def big_modulus(self) -> int:
        """Q = prod(moduli) as an exact Python int."""
        out = 1
        for m in self.moduli:
            out *= m
        return out


def _bitrev_indices(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


def _power_table(base: int, n: int, q: int) -> np.ndarray:
    """[base^0, ..., base^(n-1)] mod q, log-doubling, uint64-safe (q < 2^31)."""
    pows = np.ones(n, dtype=np.uint64)
    m = 1
    cur = base % q
    while m < n:
        span = min(m, n - m)
        pows[m:m + span] = (pows[:span] * np.uint64(cur)) % np.uint64(q)
        cur = cur * cur % q
        m *= 2
    return pows


def _shoup_table(c: np.ndarray, q: int) -> np.ndarray:
    return ((c.astype(np.uint64) << np.uint64(32)) // np.uint64(q)).astype(np.uint32)


@functools.lru_cache(maxsize=None)
def _tower_tables(q: int, n: int, root: int | None = None) -> tuple:
    """Numpy twiddle tables for one tower (cached host-side). `root`
    overrides the 2N-th root (golden-vector interop with the reference's
    RootOfUnity choice)."""
    psi = root if root is not None else nbtheory.root_of_unity(2 * n, q)
    ipsi = nbtheory.mod_inverse(psi, q)
    rev = _bitrev_indices(n)
    psi_pows = _power_table(psi, n, q)[rev].astype(np.uint32)
    ipsi_pows = _power_table(ipsi, n, q)[rev].astype(np.uint32)
    ninv = nbtheory.mod_inverse(n, q)
    return (psi_pows, _shoup_table(psi_pows, q),
            ipsi_pows, _shoup_table(ipsi_pows, q), ninv)


def make_basis(moduli, ring_dim: int, roots=None) -> Basis:
    """Build a Basis for `moduli` (each = 1 mod 2*ring_dim) at `ring_dim`.

    `roots` (optional, per-modulus) overrides the 2N-th primitive roots —
    used by golden-vector tests to match the reference's RootOfUnity."""
    moduli = tuple(int(m) for m in moduli)
    k = len(moduli)
    n = ring_dim
    q_arr = np.zeros((k, 1), np.uint32)
    r32_arr = np.zeros((k, 1), np.uint32)
    r32sh_arr = np.zeros((k, 1), np.uint32)
    m32_arr = np.zeros((k, 1), np.uint32)
    ninv_arr = np.zeros((k, 1), np.uint32)
    ninvsh_arr = np.zeros((k, 1), np.uint32)
    psi = np.zeros((k, n), np.uint32)
    psi_sh = np.zeros((k, n), np.uint32)
    ipsi = np.zeros((k, n), np.uint32)
    ipsi_sh = np.zeros((k, n), np.uint32)
    for i, q in enumerate(moduli):
        if q >= 1 << 31 or q % (2 * n) != 1:
            raise ValueError(f"modulus {q} not NTT-friendly for N={n} or >= 2^31")
        r32, r32s, m32 = mod_constants(q)
        q_arr[i], r32_arr[i], r32sh_arr[i], m32_arr[i] = q, r32, r32s, m32
        p, ps, ip, ips, ninv = _tower_tables(
            q, n, None if roots is None else int(roots[i]))
        psi[i], psi_sh[i], ipsi[i], ipsi_sh[i] = p, ps, ip, ips
        ninv_arr[i] = ninv
        ninvsh_arr[i] = (ninv << 32) // q
    return Basis(
        q=jnp.asarray(q_arr), r32=jnp.asarray(r32_arr),
        r32_sh=jnp.asarray(r32sh_arr), m32=jnp.asarray(m32_arr),
        ninv=jnp.asarray(ninv_arr), ninv_sh=jnp.asarray(ninvsh_arr),
        psi_br=jnp.asarray(psi), psi_br_sh=jnp.asarray(psi_sh),
        ipsi_br=jnp.asarray(ipsi), ipsi_br_sh=jnp.asarray(ipsi_sh),
        moduli=moduli, ring_dim=n)
