"""Exact (Hensel) division on limb arrays.

Implements the Paillier L-function L(u) = (u-1)/p as an exact truncated
multiply by p^{-1} mod 2^(16*Lp) — no division hardware needed.  Wide
modular reduction (reduce a mod-n^2 value to mod p^2) lives in
montgomery.mont_reduce_wide, which is exact where limb-rounded Barrett is
not.  (Reference behavior: ipcl::PrivateKey::decrypt CRT path,
SURVEY.md §3.3.)
"""

from __future__ import annotations

from functools import partial

import jax

from .limb import big_mul


@partial(jax.jit, static_argnames=("out_limbs",))
def exact_div(x, dinv, out_limbs: int):
    """x / d for exact divisions: multiply by d^{-1} mod 2^(16*out_limbs).

    Valid when d | x and x/d < 2^(16*out_limbs).  dinv: (out_limbs, 1) or
    (out_limbs, B) limbs of pow(d, -1, 2^(16*out_limbs)).
    """
    return big_mul(x[:out_limbs], dinv, out_limbs=out_limbs)
