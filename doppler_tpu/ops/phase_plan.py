"""Host-side NCO phase planning: samplenum emulation → per-block (D, C, t).

The reference's mutable NCO state is a single counter with a reset quirk
(``src/dsp.rs:125-130``; see ``ops.nco`` for the taxonomy of resets).  This
module runs that counter **on the host, exactly**, and compiles its effect
into the per-block constants the stateless device kernel consumes:

    phase(local j) = (j·D_b + C_b(j)) / 2^64 cycles,
    C_b(j) = C1_b  for j <  t_b   (samplenum continuing from prior blocks)
           = C2_b  for j >= t_b   (samplenum restarted at the block's first
                                    reset; t_b = reset position + 1)

Only the *first* reset per block gets an offset switch: subsequent resets
within a block are necessarily exact-periodic (the rounding kind needs
samplenum ≳ 2·10^4, far beyond one block after a restart) and exact resets
are phase-preserving to < 2^-40 cycles under the Q0.64 representation, so a
single segment switch reproduces the reference's emitted phase to well below
its own f32 noise floor.

Reset detection mirrors the reference bit-for-bit — ``f32(f32(ratio) ·
f32(n)) fract == 0`` — but is *predicted analytically* in O(polylog) per
block (:func:`_first_reset_analytic`): the f32 ratio is a dyadic rational
P/2^s, so "the product rounds to an integer" is an integer residue-window
condition solved with a Euclid-style recursion, valid for any counter value
(no 2^24 cliff, no O(count) mask scan).  ``reset_quirk=False`` skips the
quirk entirely and uses pure absolute-index phase (cleaner output).

The counter is u32 in the reference and wraps in release builds; the state
tracks it mod 2^32.
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from typing import Sequence

import numpy as np

from doppler_tpu.ops import fixedpoint as fxp

__all__ = ["NCOState", "BlockPlan", "plan_blocks"]

_M64 = (1 << 64) - 1


@dataclass
class NCOState:
    """The reference's entire mutable DSP state (SURVEY §5 checkpointing):
    the samplenum counter plus the absolute stream offset."""

    samplenum: int = 0
    abs_offset: int = 0


@dataclass
class BlockPlan:
    """Device-ready plan arrays for one chunk of B blocks (all uint32)."""

    d_hi: np.ndarray
    d_lo: np.ndarray
    c1_hi: np.ndarray
    c1_lo: np.ndarray
    c2_hi: np.ndarray
    c2_lo: np.ndarray
    t: np.ndarray

    @classmethod
    def zeros(cls, n: int) -> "BlockPlan":
        z = lambda: np.zeros(n, dtype=np.uint32)  # noqa: E731
        return cls(z(), z(), z(), z(), z(), z(), z())

    @classmethod
    def from_rows(cls, rows: list) -> "BlockPlan":
        """rows: [(d, c1, c2, t), ...] python ints → bulk uint32 arrays."""
        m = 0xFFFFFFFF
        arr = np.array(
            [(d >> 32, d & m, c1 >> 32, c1 & m, c2 >> 32, c2 & m, t)
             for d, c1, c2, t in rows],
            dtype=np.uint64,
        ).astype(np.uint32).reshape(-1, 7)
        return cls(*(arr[:, i].copy() for i in range(7)))

    def set(self, k: int, d: int, c1: int, c2: int, t: int) -> None:
        self.d_hi[k], self.d_lo[k] = fxp.split_u64(d)
        self.c1_hi[k], self.c1_lo[k] = fxp.split_u64(c1)
        self.c2_hi[k], self.c2_lo[k] = fxp.split_u64(c2)
        self.t[k] = t


def _ratio_f32(shift_hz: float, samplerate: int) -> np.float32:
    return np.float32(np.float32(shift_hz) / np.float32(samplerate))


def _first_reset_scan(r32: np.float32, m0: int, count: int) -> int | None:
    """O(count) vectorized mirror of dsp.rs:125-130 — the fuzz oracle.

    Reset fires at local j when ``fract(f32(r32 · f32(m0 + j))) == 0``.
    """
    if count == 0:
        return None
    n = np.arange(m0, m0 + count, dtype=np.float64).astype(np.float32)
    prod = np.float32(r32) * n           # f32 elementwise product
    frac = prod - np.trunc(prod)         # Rust fract(): toward-zero remainder
    hits = np.nonzero(frac == np.float32(0.0))[0]
    return int(hits[0]) if hits.size else None


def _is_reset(r32: np.float32, n: int) -> bool:
    """Scalar f32 ground truth for one counter value (verifies candidates)."""
    prod = np.float32(r32) * np.float64(n).astype(np.float32)
    return bool(prod - np.trunc(prod) == np.float32(0.0))


def _min_affine(a: int, b: int, m: int, R: int) -> int | None:
    """Minimal k ≥ 0 with ``(a·k + b) mod m ≤ R`` — Euclid-style O(log m).

    The workhorse of the analytic reset predictor: "when does the phase
    residue next land inside the half-ulp window".  Each level reduces the
    modulus like the Euclidean algorithm (m, a) → (a, (−m) mod a), so the
    depth is O(log m) even for m = 2⁵³.
    """
    a %= m
    b %= m
    if b <= R:
        return 0
    if a == 0:
        return None
    if 2 * a > m:
        # reflect: (a·k + b) mod m ≤ R ⟺ ((m−a)·k + (R−b)) mod m ≤ R,
        # so the multiplier always halves and the recursion depth is O(log m)
        return _min_affine(m - a, (R - b) % m, m, R)
    # need c ≥ 1 wraps: a·k ∈ [c·m − b, c·m − b + R] for minimal c, i.e.
    # ((b − m) − (c−1)·m) mod a ≤ R — the same problem one level down
    c1 = _min_affine((-m) % a, (b - m) % a, a, R)
    if c1 is None:
        return None
    c = 1 + c1
    return -((-(c * m - b)) // a)        # ceil((c·m − b)/a)


def _first_reset_analytic(r32: np.float32, m0: int, count: int) -> int | None:
    """O(polylog) twin of :func:`_first_reset_scan` — exact, any counter size.

    Write |r32| = P·2⁻ˢ with P odd (every finite f32 is a dyadic rational)
    and n' = f32(n) = M·2ᵍ on the binade's mantissa grid.  The product the
    reference tests is then exactly x = P·M·2^{g−s}, and ``fract(f32(x))==0``
    iff x lies within half an ulp of an integer — an integer condition
    ``(P·2ᵍ·M mod 2ˢ) ∈ [−H, H]`` with H = 2^{E−24+s} fixed per binade
    E = ⌊log₂ x⌋.  Per (n-binade × x-binade) segment that minimal M is one
    :func:`_min_affine` call; candidates sitting exactly on the half-ulp
    boundary (ties, round-to-nearest-even) are verified against the scalar
    f32 expression and skipped if they round away.  Replaces the O(count)
    mask scan in the ≥2²⁴-counter regime (VERDICT r1 "kill the O(samples)
    plan scan"); fuzzed against the scan and the native sequential loop in
    tests/test_phase_plan_analytic.py.
    """
    if count <= 0:
        return None
    if m0 == 0:
        return 0                          # fract(±0·r) == 0 always fires
    r = float(np.float32(r32))
    if r == 0.0 or not np.isfinite(r):
        return 0                          # prod ≡ ±0 (or NaN never equals 0)
    fr, e = np.frexp(abs(r))              # |r| = fr·2^e, fr ∈ [0.5, 1)
    P = int(fr * (1 << 53))               # exact: f32 → ≤24 significant bits
    tz = (P & -P).bit_length() - 1
    P >>= tz
    s = 53 - int(e) - tz                  # |r| = P / 2^s, P odd
    n_end = m0 + count                    # exclusive

    n = m0
    while n < n_end:
        # n-binade [2^k, 2^{k+1}): f32(n) lives on the grid 2^g
        k = n.bit_length() - 1
        g = max(0, k - 23)
        bin_end = min(1 << (k + 1), n_end)
        # M range for this binade (M = f32(n)/2^g, round-half-even)
        M_lo = (n + (1 << g) // 2) >> g if g else n
        if g and ((n + (1 << g) // 2) % (1 << g) == 0) and (M_lo & 1):
            M_lo -= 1                     # n is a tie rounding down to even
        M_hi = (bin_end - 1 + (1 << g) // 2) >> g if g else bin_end - 1
        M = M_lo
        while M <= M_hi:
            # x-binade split: E = ⌊log₂(P·M·2^{g−s})⌋ is constant until P·M
            # crosses a power of two
            pm_bits = (P * M).bit_length()
            E = pm_bits - 1 + g - s
            M_seg_hi = min(M_hi, ((1 << pm_bits) - 1) // P)
            if E >= 23:
                # ulp ≥ 1: every f32 at this magnitude is an integer
                cand_M = M
            else:
                Hnum = E - 24 + s - g     # window: |P·M mod± 2^{s−g}| ≤ 2^Hnum
                mod = 1 << max(0, s - g)
                if mod == 1:
                    cand_M = M            # x always a true integer
                elif Hnum < 0:
                    # window < 1: only exact multiples hit; P odd ⇒ 2^{s−g}|M
                    step = mod
                    cand_M = ((M + step - 1) // step) * step
                    if cand_M > M_seg_hi:
                        M = M_seg_hi + 1
                        continue
                else:
                    H = 1 << Hnum
                    A = P % mod
                    kk = _min_affine(A, (A * M + H) % mod, mod, 2 * H)
                    if kk is None or M + kk > M_seg_hi:
                        M = M_seg_hi + 1
                        continue
                    cand_M = M + kk
            # smallest n ≥ current position whose f32 is cand_M·2^g
            if g:
                half = 1 << (g - 1)
                lo_n = cand_M * (1 << g) - half
                if (cand_M & 1):          # odd target: tie rounds away
                    lo_n += 1
                cand_n = max(n, lo_n)
            else:
                cand_n = cand_M
            if cand_n >= n_end:
                return None
            if _is_reset(r32, cand_n):
                return cand_n - m0
            # tie rounded away — resume just past the candidate
            M = cand_M + 1
        n = bin_end
    return None


def _exact_period(r32: np.float32) -> int | None:
    """Denominator q of the (dyadic) f32 ratio: r·n is a true integer iff
    q | n.  Returns None for q too large to matter within a block run."""
    fr = Fraction(float(r32)).limit_denominator(1 << 62)
    q = fr.denominator
    return q if q <= (1 << 31) else None


def _state_after_run(r32: np.float32, v: int, count: int) -> int:
    """samplenum after processing ``count`` samples starting at value ``v``.

    Trajectory: n increments from v; resets to 1 at each j where
    fract(r·n)==0.  Uses the exact-period closed form when the ratio's dyadic
    period q fits in the remaining run (avoiding O(count/q) scans); otherwise
    re-scans from the restarted counter — rounding resets are rare, so the
    loop runs at most a couple of iterations.
    """
    remaining = count
    while remaining > 0:
        j = _first_reset_analytic(r32, v, remaining)
        if j is None:
            return (v + remaining) % (1 << 32)
        remaining -= j + 1        # samples left after the reset fires
        v = 1
        q = _exact_period(r32)
        if q is not None and q <= remaining:
            # periodic from here: counter cycles 1..q → (rem mod q) + 1
            return remaining % q + 1
    return v % (1 << 32)


def _exact_only_bound(r32: np.float32, q: int) -> float:
    """Largest |r·n| below which only *exact* resets can fire.

    With r = p/q exactly (f32 values are dyadic rationals), non-multiples of
    q sit ≥ 1/q from the integers, so a rounding reset needs
    ulp(r·n)/2 ≥ 1/q ⟺ |r·n| ≳ 2^23/q.  Stay a factor 2 under.
    """
    return (1 << 22) / q


def _state_after_run_exact(m0: int, count: int, q: int) -> int:
    """Closed-form counter evolution when every reset is exact-periodic."""
    j0 = (-m0) % q          # first local index whose counter is ≡ 0 (mod q)
    if j0 >= count:
        return (m0 + count) % (1 << 32)
    rem = count - 1 - j0
    return rem % q + 1


def plan_blocks(
    shifts_hz: Sequence[float],
    counts: Sequence[int],
    samplerate: int,
    state: NCOState,
    block_len: int,
    *,
    quantize_f32: bool = True,
    reset_quirk: bool = True,
    fast_path: bool = True,
) -> BlockPlan:
    """Compile per-block shifts + the running samplenum into kernel constants.

    ``counts[k]`` is the true sample count of block k (≤ block_len; only the
    final block may be short).  Advances ``state`` in place.

    Host cost: O(1) per block in the exact-reset regime (resets land only on
    true multiples of the ratio's dyadic period q, which are phase-preserving
    — the plan uses the absolute-index phase with no segment switch and the
    counter advances in closed form).  Only blocks where a *rounding* reset
    could fire (|r·n| ≳ 2^22/q, or huge-q ratios) pay the O(count) f32 mask
    scan that mirrors the reference bit-for-bit.
    """
    rows: list = []
    period_cache: dict[float, int | None] = {}
    rate_cache: dict[float, tuple[int, np.float32]] = {}
    for s_hz, count in zip(shifts_hz, counts):
        skey = float(s_hz)
        if skey not in rate_cache:
            rate_cache[skey] = (
                fxp.rate_to_q64(s_hz, samplerate, quantize_f32=quantize_f32),
                _ratio_f32(s_hz, samplerate),
            )
        d, r32_cached = rate_cache[skey]
        if not reset_quirk:
            c1 = (state.abs_offset * d) % (1 << 64)
            rows.append((d, c1, c1, block_len))
            state.abs_offset += count
            state.samplenum = state.abs_offset
            continue

        r32 = r32_cached
        m0 = state.samplenum

        if fast_path:
            key = float(r32)
            if key not in period_cache:
                period_cache[key] = _exact_period(r32)
            q = period_cache[key]
            n_hi = m0 + count
            if (
                q is not None
                and q <= (1 << 20)
                and n_hi <= (1 << 24)
                and abs(float(r32)) * n_hi < _exact_only_bound(r32, q)
            ):
                # exact-only regime: resets are phase-preserving, so the
                # absolute counter phase is faithful with no segment switch
                c1 = (m0 * d) % (1 << 64)
                rows.append((d, c1, c1, block_len))
                state.samplenum = _state_after_run_exact(m0, count, q)
                state.abs_offset += count
                continue

        c1 = (m0 * d) % (1 << 64)
        j0 = _first_reset_analytic(r32, m0, count)
        if j0 is None:
            rows.append((d, c1, c1, block_len))
        else:
            # segment 2: samplenum restarts at 1 for local index j0+1,
            # i.e. n_eff(j) = j - j0  →  C2 = (−j0 · D) mod 2^64
            c2 = (-j0 * d) % (1 << 64)
            rows.append((d, c1, c2, j0 + 1))
        state.samplenum = _state_after_run(r32, m0, count)
        state.abs_offset += count
    return BlockPlan.from_rows(rows)
