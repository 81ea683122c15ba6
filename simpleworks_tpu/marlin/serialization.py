"""Byte serialization for Marlin proofs and keys
(reference ``src/marlin/serialization.rs``: serialize_proof/verifying_key/
proving_key + deserialize twins).

Format (little-endian, framework-defined — arkworks byte-compatibility is a
planned extension since our transcripts already differ):

* Commitment: 48B compressed G1 | 1B has_shifted | [48B shifted]
* Proof: 9 round commitments (canonical order) | 18 evaluations (32B Fr)
         | 2 opening witnesses (48B) | 2 blinding evaluations (32B Fr)
* VerifyingKey: info (5×u64) | 9 index commitments | g | h | beta_h | γG
"""

from __future__ import annotations

import struct

from ..curves.bls12_377 import G1Point, G2Point
from ..fields.bls12_377 import Fr
from ..kzg.kzg10 import Commitment
from . import (
    BETA_POLYS,
    GAMMA_POLYS,
    INDEX_POLYS,
    IndexVerifierKey,
    MarlinProof,
)
from .ahp import IndexInfo

ROUND_COMMS = ["w", "z_a", "z_b", "mask", "t", "g_1", "h_1", "g_2", "h_2"]
ALL_EVALS = BETA_POLYS + GAMMA_POLYS


def _read_commitment(data: bytes, off: int) -> tuple[Commitment, int]:
    comm = G1Point.deserialize_compressed(data[off : off + 48])
    off += 48
    has_shifted = data[off]
    off += 1
    shifted = None
    if has_shifted:
        shifted = G1Point.deserialize_compressed(data[off : off + 48])
        off += 48
    return Commitment(comm=comm, shifted_comm=shifted), off


def serialize_proof(proof: MarlinProof) -> bytes:
    out = bytearray()
    for name in ROUND_COMMS:
        out += proof.commitments[name].serialize()
    for name in ALL_EVALS:
        out += Fr(proof.evaluations[name]).serialize()
    out += proof.pc_proof_beta.serialize_compressed()
    out += proof.pc_proof_gamma.serialize_compressed()
    out += Fr(proof.pc_rand_beta).serialize()
    out += Fr(proof.pc_rand_gamma).serialize()
    return bytes(out)


def deserialize_proof(data: bytes) -> MarlinProof:
    off = 0
    commitments = {}
    for name in ROUND_COMMS:
        commitments[name], off = _read_commitment(data, off)
    evaluations = {}
    for name in ALL_EVALS:
        evaluations[name] = Fr.deserialize(data[off : off + 32]).value
        off += 32
    pc_beta = G1Point.deserialize_compressed(data[off : off + 48])
    off += 48
    pc_gamma = G1Point.deserialize_compressed(data[off : off + 48])
    off += 48
    rand_beta = Fr.deserialize(data[off : off + 32]).value
    off += 32
    rand_gamma = Fr.deserialize(data[off : off + 32]).value
    return MarlinProof(
        commitments=commitments,
        evaluations=evaluations,
        pc_proof_beta=pc_beta,
        pc_proof_gamma=pc_gamma,
        pc_rand_beta=rand_beta,
        pc_rand_gamma=rand_gamma,
    )


def serialize_verifying_key(vk: IndexVerifierKey) -> bytes:
    out = bytearray()
    out += struct.pack(
        "<5Q",
        vk.info.num_instance_padded,
        vk.info.num_instance,
        vk.info.domain_h_size,
        vk.info.domain_k_size,
        vk.srs_max_degree,
    )
    for name in INDEX_POLYS:
        out += vk.index_commitments[name].serialize()
    out += vk.g.serialize_compressed()
    out += vk.h.serialize_compressed()
    out += vk.beta_h.serialize_compressed()
    out += b"\x01" if vk.gamma_g is not None else b"\x00"
    if vk.gamma_g is not None:
        out += vk.gamma_g.serialize_compressed()
    shift_powers = vk.shift_powers or {}
    out += struct.pack("<Q", len(shift_powers))
    for bound in sorted(shift_powers):
        out += struct.pack("<Q", bound)
        out += shift_powers[bound].serialize_compressed()
    return bytes(out)


def deserialize_verifying_key(data: bytes) -> IndexVerifierKey:
    ell, num_instance, n, m, srs_max = struct.unpack_from("<5Q", data, 0)
    off = 40
    commitments = {}
    for name in INDEX_POLYS:
        commitments[name], off = _read_commitment(data, off)
    g = G1Point.deserialize_compressed(data[off : off + 48])
    off += 48
    h = G2Point.deserialize_compressed(data[off : off + 96])
    off += 96
    beta_h = G2Point.deserialize_compressed(data[off : off + 96])
    off += 96
    gamma_g = None
    if off < len(data) and data[off]:
        gamma_g = G1Point.deserialize_compressed(data[off + 1 : off + 49])
        off += 49
    else:
        off += 1
    shift_powers = None
    if off < len(data):
        (n_shift,) = struct.unpack_from("<Q", data, off)
        off += 8
        shift_powers = {}
        for _ in range(n_shift):
            (bound,) = struct.unpack_from("<Q", data, off)
            off += 8
            shift_powers[bound] = G1Point.deserialize_compressed(data[off : off + 48])
            off += 48
    info = IndexInfo(
        num_instance_padded=ell,
        num_instance=num_instance,
        domain_h_size=n,
        domain_k_size=m,
        max_degree=max(3 * n - 1, 6 * m - 6),
    )
    return IndexVerifierKey(
        info=info,
        index_commitments=commitments,
        g=g,
        h=h,
        beta_h=beta_h,
        srs_max_degree=srs_max,
        gamma_g=gamma_g,
        shift_powers=shift_powers,
    )


def serialize_proving_key(pk) -> bytes:
    """ProvingKey serde (reference serialization.rs:28-45): vk + the index
    polynomial coefficients + the SRS powers.  Large at full scale — as is
    the reference's (the SRS dominates)."""
    from ..fields.bls12_377 import Fr

    out = bytearray()
    vk_bytes = serialize_verifying_key(pk.vk)
    out += len(vk_bytes).to_bytes(8, "little")
    out += vk_bytes
    for mat in pk.index.matrices:
        for poly in (mat.row_poly, mat.col_poly, mat.val_poly):
            out += len(poly.vec).to_bytes(8, "little")
            # standard-form u64 LE limbs == the 32B-LE Fr serde bytes
            out += poly.vec.to_std_array().tobytes()
    out += len(pk.srs.powers_of_g).to_bytes(8, "little")
    for p in pk.srs.powers_of_g:
        out += p.serialize_compressed()
    out += pk.srs.h.serialize_compressed()
    out += pk.srs.beta_h.serialize_compressed()
    gamma_powers = pk.srs.powers_of_gamma_g or []
    out += len(gamma_powers).to_bytes(8, "little")
    for p in gamma_powers:
        out += p.serialize_compressed()
    return bytes(out)


def deserialize_proving_key(data: bytes):
    """Rebuild an IndexProverKey (index K-evals recomputed from coeffs)."""
    from ..fields.bls12_377 import Fr
    from ..kzg.kzg10 import UniversalSRS
    from ..poly.dense import DensePoly
    from ..poly.domain import Radix2Domain
    from . import IndexProverKey
    from .ahp import Index, MatrixArithmetization

    import numpy as np

    from ..fields.frvec import FrVec

    off = 0
    vk_len = int.from_bytes(data[off : off + 8], "little")
    off += 8
    vk = deserialize_verifying_key(data[off : off + vk_len])
    off += vk_len
    domain_k = Radix2Domain(vk.info.domain_k_size)
    matrices = []
    for _ in range(3):
        polys = []
        for _ in range(3):
            n_coeffs = int.from_bytes(data[off : off + 8], "little")
            off += 8
            std = np.frombuffer(data[off : off + 32 * n_coeffs], dtype="<u8")
            off += 32 * n_coeffs
            polys.append(DensePoly(FrVec.from_std_array(std.reshape(-1, 4))))
        row, col, val = polys
        matrices.append(
            MatrixArithmetization(
                row_poly=row, col_poly=col, val_poly=val,
                row_evals=domain_k.fft_vec(row.vec),
                col_evals=domain_k.fft_vec(col.vec),
                val_evals=domain_k.fft_vec(val.vec),
            )
        )
    n_powers = int.from_bytes(data[off : off + 8], "little")
    off += 8
    powers = []
    for _ in range(n_powers):
        powers.append(G1Point.deserialize_compressed(data[off : off + 48]))
        off += 48
    h = G2Point.deserialize_compressed(data[off : off + 96])
    off += 96
    beta_h = G2Point.deserialize_compressed(data[off : off + 96])
    off += 96
    gamma_powers = None
    if off < len(data):
        n_gamma = int.from_bytes(data[off : off + 8], "little")
        off += 8
        gamma_powers = []
        for _ in range(n_gamma):
            gamma_powers.append(G1Point.deserialize_compressed(data[off : off + 48]))
            off += 48
    srs = UniversalSRS(powers_of_g=powers, h=h, beta_h=beta_h,
                       powers_of_gamma_g=gamma_powers)
    index = Index(info=vk.info, matrices=matrices)
    return IndexProverKey(index=index, srs=srs, vk=vk)
