"""Device-batched R1CS satisfiability: Az ∘ Bz − Cz == 0 as sparse matvecs.

The DP axis of the framework (SURVEY.md §2.4 row 'Batched witness
execution'): one circuit structure, many witness assignments evaluated
simultaneously on device.  The sparse matvec is a gather + Montgomery
mul + segment-sum over uint32 limb arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.device import DeviceField, LIMB_BITS


def _reduce_wide_sum(df: DeviceField, wide: jnp.ndarray) -> jnp.ndarray:
    """Reduce a lazily-accumulated limb sum (limbs < 2^31) to canonical form.

    ``wide``: [..., L] uint32 limbs, each < 2^31 (sums of < 2^15 terms).
    Returns canonical Montgomery-form [..., L].
    """
    L = df.n_limbs
    # Normalize into L+2 limbs (carries can push ~15 bits past the top limb).
    limbs = [wide[..., i] for i in range(L)] + [
        jnp.zeros(wide.shape[:-1], jnp.uint32),
        jnp.zeros(wide.shape[:-1], jnp.uint32),
    ]
    carry = jnp.zeros(wide.shape[:-1], jnp.uint32)
    out = []
    for i in range(L + 2):
        v = limbs[i] + carry
        out.append(v & ((1 << LIMB_BITS) - 1))
        carry = v >> LIMB_BITS
    lo = jnp.stack(out[:L], axis=-1)
    # hi = out[L] + out[L+1]*2^16 (< 2^31): value = hi*R + lo.
    hi = out[L].astype(jnp.uint32) + (out[L + 1].astype(jnp.uint32) << LIMB_BITS)
    hi_limbs = jnp.zeros(lo.shape, jnp.uint32).at[..., 0].set(hi & ((1 << LIMB_BITS) - 1))
    hi_limbs = hi_limbs.at[..., 1].set(hi >> LIMB_BITS)
    # hi*R mod p == mont_mul(hi, R^2)
    hi_term = df.mul(hi_limbs, jnp.broadcast_to(df.r2_limbs, lo.shape))
    # lo < 2^(16L) < 2^shave * p: a few conditional subtracts make it canonical.
    for _ in range(df.params.repr_shave_bits + 1):
        lo = df._cond_sub_p(lo)
    return df.add(hi_term, lo)


class DeviceR1CS:
    """Device-resident circuit structure for batched satisfiability.

    Built once from a synthesized :class:`ConstraintSystem`; evaluated over
    ``[batch, num_cols]`` assignment matrices.
    """

    def __init__(self, cs, device_field: DeviceField | None = None):
        self.field = cs.field
        self.df = device_field or DeviceField(cs.field.PARAMS)
        self.num_constraints = cs.num_constraints
        self.num_cols = cs.num_instance_variables + cs.num_witness_variables
        mats = cs.to_matrices()
        self.coo = []
        for rows, cols, coeffs in mats:
            rows = np.asarray(rows, dtype=np.int32)
            cols = np.asarray(cols, dtype=np.int32)
            coeff_arr = self.df.to_mont(coeffs) if coeffs else jnp.zeros((0, self.df.n_limbs), jnp.uint32)
            self.coo.append((jnp.asarray(rows), jnp.asarray(cols), coeff_arr))

    def matvec(self, coo, z_mont: jnp.ndarray) -> jnp.ndarray:
        """[batch, cols, L] -> [batch, rows, L] sparse product."""
        rows, cols, coeffs = coo
        df = self.df
        gathered = z_mont[:, cols, :]  # [batch, nnz, L]
        prods = df.mul(gathered, coeffs[None, :, :])  # canonical Montgomery
        # segment-sum by row with lazy limbs (safe: row nnz << 2^15)
        sums = jax.ops.segment_sum(
            prods.swapaxes(0, 1), rows, num_segments=self.num_constraints
        )  # [rows, batch, L]
        return _reduce_wide_sum(df, sums).swapaxes(0, 1)

    def check(self, assignments: np.ndarray | list[list[int]]) -> jnp.ndarray:
        """Batched satisfiability: returns bool[batch].

        ``assignments``: [batch][num_cols] standard-form ints
        (z = [1, instances..., witnesses...]).
        """
        batch = [self.df.to_mont(row) for row in assignments]
        z = jnp.stack(batch)  # [batch, cols, L]
        return self._check_mont(z)

    def _check_mont(self, z_mont: jnp.ndarray) -> jnp.ndarray:
        az = self.matvec(self.coo[0], z_mont)
        bz = self.matvec(self.coo[1], z_mont)
        cz = self.matvec(self.coo[2], z_mont)
        lhs = self.df.mul(az, bz)
        diff = self.df.sub(lhs, cz)
        return jnp.all(self.df.is_zero(diff), axis=-1)
