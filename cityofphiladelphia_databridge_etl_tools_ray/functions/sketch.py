"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, public
algorithm) — the mergeable-sketch primitive for cardinality at 100 TB:
each batch collapses to at most ``m`` (register, max_rho) rows, the
cluster merges them with one tiny max-groupby, and the driver touches
only the final m-row aggregate (never the data).

The hash is a vectorized splitmix64 (Steele et al., public domain
constants) over int64 keys: deterministic across processes / runs /
cluster sizes, so the estimate is bit-reproducible.
"""

from __future__ import annotations

import numpy as np

HLL_P = 10  # 2^10 = 1024 registers; rel. std error 1.04/sqrt(m) ~= 3.25%
HLL_M = 1 << HLL_P


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def hll_partial(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batch-local register maxima: (register ids, max rho per register).

    rho = 1 + number of leading zeros of the (64-p)-bit suffix — the
    standard HLL register update, computed branch-free with float64
    log2 (exact for suffixes below 2^53; the top bits that would
    overflow that are folded out by the p-bit register split)."""
    h = splitmix64(keys.astype(np.uint64))
    reg = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    suffix = h & np.uint64((1 << (64 - HLL_P)) - 1)
    # position of the highest set bit of suffix (0 when suffix == 0)
    nz = suffix != 0
    hi = np.zeros(len(suffix), np.int64)
    hi[nz] = np.floor(np.log2(suffix[nz].astype(np.float64))).astype(np.int64)
    # exact fixup for the float64 rounding band (suffix >= 2^53):
    # hi must satisfy 2^hi <= suffix < 2^(hi+1)
    over = nz & (suffix >> np.minimum(hi, 63).astype(np.uint64) == 0)
    hi[over] -= 1
    under = nz & (suffix >> np.minimum(hi + 1, 63).astype(np.uint64) != 0)
    hi[under] += 1
    rho = np.where(nz, (64 - HLL_P) - hi, (64 - HLL_P) + 1).astype(np.int64)
    # max rho per register within the batch
    order = np.lexsort((rho, reg))
    reg_s, rho_s = reg[order], rho[order]
    last = np.r_[reg_s[1:] != reg_s[:-1], True]  # last (= max rho) per register run
    return reg_s[last], rho_s[last]


def hll_estimate(registers: np.ndarray, rhos: np.ndarray) -> float:
    """Bias-corrected HLL estimate from merged (register, max_rho)
    pairs; absent registers count as rho = 0.  Small-range correction
    uses linear counting (the original paper's rule)."""
    M = np.zeros(HLL_M, np.float64)
    M[registers] = rhos
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    est = alpha * HLL_M * HLL_M / np.sum(np.exp2(-M))
    zeros = float(np.count_nonzero(M == 0))
    if est <= 2.5 * HLL_M and zeros > 0:
        est = HLL_M * np.log(HLL_M / zeros)  # linear counting
    return float(est)
