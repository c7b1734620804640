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
    if len(keys) == 0:  # empty slice of a batch (e.g. one-type blocks)
        return np.empty(0, np.int64), np.empty(0, np.int64)
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


class QuantileSketch:
    """Deterministic KLL-style mergeable quantile sketch (Karnin,
    Lang & Liberty 2016 structure with the deterministic
    every-other-item compactor of Munro-Paterson / MRL — all public
    algorithms).

    Level ``i`` holds at most ``k`` items, each standing for ``2^i``
    original rows.  A full level is sorted and every other item is
    promoted to level ``i+1`` (start offset alternates per level
    between compactions, cancelling half the rank bias while staying
    fully deterministic — same input stream → same sketch, no RNG).
    Merging concatenates level-wise and re-compacts: the accumulator
    shape Ray's ``AggregateFn`` tree-merge needs.

    Memory is O(k · log(n/k)) items regardless of n; each compaction
    at level i shifts any rank by at most 2^i, and level i compacts
    at most ceil(n / (k·2^i)) times, so the worst-case rank error is
    bounded by n·H/k with H = #levels — ``max_rank_error()`` reports
    this bound and tests pin the observed error well inside it.
    """

    def __init__(self, k: int = 512):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.parity: list[int] = [0]
        self.n = 0

    def _compact(self, i: int) -> None:
        while i >= len(self.levels) - 1:
            self.levels.append(np.empty(0, dtype=np.float64))
            self.parity.append(0)
        buf = np.sort(self.levels[i], kind="stable")
        start = self.parity[i]
        self.parity[i] ^= 1
        # odd buffer: set aside one unpaired item at this level (the
        # min/max end alternates with parity so the tail bias cancels);
        # the even remainder promotes exactly half its items at double
        # weight — total represented weight is conserved EXACTLY.
        if len(buf) % 2 == 1:
            if start == 0:
                keep, buf = buf[-1:], buf[:-1]
            else:
                keep, buf = buf[:1], buf[1:]
        else:
            keep = buf[:0]
        promoted = buf[start::2]
        self.levels[i] = keep
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    def add(self, values: np.ndarray) -> "QuantileSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        i = 0
        while i < len(self.levels) and len(self.levels[i]) >= self.k:
            self._compact(i)
            i += 1
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        if other.n == 0:
            return self
        self.n += other.n
        for i, buf in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self.parity.append(0)
            if len(buf):
                self.levels[i] = np.concatenate([self.levels[i], buf])
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) >= self.k:
                self._compact(i)
            i += 1
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, buf in enumerate(self.levels):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), 1 << i, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, np.int64)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantiles(self, phis) -> np.ndarray:
        """Estimated values at the given quantile fractions."""
        it, w = self._weighted()
        if len(it) == 0:
            return np.full(len(phis), np.nan)
        cum = np.cumsum(w)
        total = cum[-1]
        idx = np.searchsorted(cum, np.asarray(phis, dtype=np.float64) * total)
        return it[np.clip(idx, 0, len(it) - 1)]

    def max_rank_error(self) -> int:
        """Deterministic worst-case rank error bound: n·H/k."""
        h = max(1, len(self.levels))
        return int(np.ceil(self.n * h / self.k)) if self.n else 0


def qsketch_state(s: QuantileSketch) -> np.ndarray:
    """Flatten a QuantileSketch into one float64 vector — the
    Arrow-native accumulator shape for Ray ``AggregateFn`` handoffs
    (an object accumulator would pickle-fallback on every block).
    Layout: [k, n, L, parity×L, len×L, items...]."""
    L = len(s.levels)
    head = np.array([s.k, s.n, L], dtype=np.float64)
    par = np.asarray(s.parity, dtype=np.float64)
    lens = np.array([len(b) for b in s.levels], dtype=np.float64)
    items = (
        np.concatenate([b for b in s.levels if len(b)])
        if any(len(b) for b in s.levels)
        else np.empty(0, np.float64)
    )
    return np.concatenate([head, par, lens, items])


def qsketch_from_state(v: np.ndarray) -> QuantileSketch:
    v = np.asarray(v, dtype=np.float64)
    k, n, L = int(v[0]), int(v[1]), int(v[2])
    par = v[3 : 3 + L].astype(np.int64)
    lens = v[3 + L : 3 + 2 * L].astype(np.int64)
    s = QuantileSketch(k=k)
    s.n = n
    s.parity = [int(p) for p in par]
    s.levels = []
    off = 3 + 2 * L
    for ln in lens:
        s.levels.append(v[off : off + ln].copy())
        off += ln
    if not s.levels:
        s.levels, s.parity = [np.empty(0, np.float64)], [0]
    return s
