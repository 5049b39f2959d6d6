"""Multi-stage resampler: ÷2^k decimation cascade + final rational stage.

The multi-stage half of liquid-dsp's ``msresamp`` capability (SURVEY §2 #10:
the reference ecosystem's resampler is multi-stage for large ratios).  A
single-stage polyphase P/Q prototype needs O(max(P,Q)) taps for a fixed
transition width, so heavy decimation (1.024 Msps → 48 ksps is 3/64; 10 Msps
→ 48 ksps is 6/1250) gets expensive in one stage.  The cascade factors the
decimation into

    ÷q₀  →  ÷q₁  →  …  →  rational P/Q' (small Q'),   qᵢ ∈ {16, 8, 4, 2}

where every front stage only protects the final output band — its
transition region is most of its Nyquist interval, so it needs few taps —
and the sharp filter runs at the LOWEST rate, where taps are cheap.  Stage
factors are greedy-largest (fewer stages = fewer MACs in the fused kernel's
dense-matmul formulation; the classic all-halfband chain is the q=2
degenerate case).  (Per-input MAC
count of the single-stage polyphase dot is already ~attenuation-bound, not
Q-bound; what the cascade buys is that no stage carries a long filter —
prototype memory, FIR history/carry state, group delay, and device taps
matrices stay small for arbitrarily large ratios, where the single-stage
prototype grows as O(max(P,Q)).)

Each stage is a :class:`~doppler_tpu.ops.resample.RationalResampler`, so
streaming state, channel batching, Bresenham output alignment, and
checkpointing all compose; a halfband is just the P=1, Q=2 special case
whose windowed-sinc prototype (cutoff 0.25) is a true halfband (every other
tap zero).  The stage count is chosen so the rate entering the final
rational stage is the smallest power-of-two division of ``in_rate`` that
still leaves ≥ ``2·out_rate`` (no aliasing into the output band before the
final filter).
"""

from __future__ import annotations

import math

import numpy as np

from doppler_tpu.ops.filters import kaiser_beta
from doppler_tpu.ops.resample import RationalResampler

__all__ = ["MultiStageResampler", "halfband_taps_needed",
           "stage_taps_needed", "make_resampler"]


def stage_taps_needed(stage_rate: float, q: int, pass_hz: float,
                      atten_db: float) -> int:
    """Kaiser length for a ÷q decimation stage protecting ``pass_hz``.

    The stage's stopband must start where post-decimation aliases would
    fold onto the passband: stopband edge = rate/q − pass_hz.  Transition
    Δν = (rate/q − 2·pass_hz)/rate of the stage's input rate — wide for
    early stages and small q, hence short filters.  (The windowed-sinc
    cutoff midpoint (pass + stop)/2 = rate/2q is exactly
    ``design_polyphase_bank``'s 0.5/Q for P=1, for any pass_hz.)  Odd
    length keeps the q=2 true-halfband structure and costs nothing
    elsewhere.
    """
    dv = (stage_rate / q - 2.0 * pass_hz) / stage_rate
    if dv <= 0.0:
        raise ValueError(f"passband too wide for a ÷{q} stage")
    n = (max(atten_db, 21.0) - 7.95) / (2.285 * 2.0 * math.pi * dv)
    n = max(7, int(math.ceil(n)))
    return n + 1 if n % 2 == 0 else n


def halfband_taps_needed(stage_rate: float, pass_hz: float,
                         atten_db: float) -> int:
    """Kaiser length for a ÷2 halfband protecting ``pass_hz`` at this rate
    (the q=2 case of :func:`stage_taps_needed`)."""
    return stage_taps_needed(stage_rate, 2, pass_hz, atten_db)


class MultiStageResampler:
    """Streaming halfband-cascade resampler over planar IQ chunks.

    Drop-in for :class:`RationalResampler` at the pipeline boundary (same
    ``process`` / ``out_count_for`` / ``max_out_for`` / ``state_dict``
    surface).  Decimation-only (``out_rate < in_rate``); pure interpolation
    or near-unity ratios don't benefit from staging — use the single-stage
    resampler (:func:`make_resampler` picks automatically).
    """

    def __init__(
        self,
        in_rate: int,
        out_rate: float,
        *,
        atten_db: float = 70.0,
        channels: int | None = None,
        max_denominator: int = 1 << 16,
        impl: str = "auto",
    ):
        if out_rate >= in_rate:
            raise ValueError(
                "MultiStageResampler is decimation-only; use "
                "RationalResampler (or make_resampler) for ratios ≥ 1"
            )
        self.in_rate = int(in_rate)
        self.out_rate = float(out_rate)
        self.channels = channels

        pass_hz = 0.5 * float(out_rate)       # protect the full output band
        self.stages: list[RationalResampler] = []
        rate = float(in_rate)
        # Greedy ÷q stages (largest q ∈ {16, 8, 4, 2} first) while the
        # divided rate still fully contains the output band.  Bigger stage
        # factors cut the fused kernel's MAC count — a P=1/q stage costs
        # (q+1)·128/q MACs/sample in the dense-matmul formulation (its taps
        # matrix always spans R = HBR+1 row slices), so one ÷8 ≈ 144 beats
        # three ÷2 ≈ 336 (VERDICT r3 next #3).  T is capped at 129 taps to
        # keep the stage's carry at one 128-lane row (HBR=1, R=2); a q
        # whose sharper transition would exceed that falls back to the next
        # smaller factor.  All q divide 128, so every stage stays fusable
        # (and split-cascade-prefix eligible).
        #
        # Alias-fold margin: a ÷q stage folds ~q−1 stopband bands onto the
        # output band, so a flat atten_db stopband sums to roughly
        # atten_db − 10·log10(q−1) of final SNR (measured: the config-5
        # ÷16·÷16 cascade at a flat 70 dB design scored 56.8 dB).  Each
        # stage is therefore designed 10·log10(q) dB deeper — taps stay
        # within the 129-tap carry cap, so the fused MAC cost is unchanged
        # (the dense-matmul cost is taps-independent at R=2).
        while rate / 2.0 >= 2.0 * out_rate and float(rate / 2.0).is_integer():
            for q in (16, 8, 4, 2):
                if rate / q < 2.0 * out_rate:
                    continue
                if not float(rate / q).is_integer():
                    continue
                atten_s = atten_db + 10.0 * math.log10(q)
                try:
                    taps = stage_taps_needed(rate, q, pass_hz, atten_s)
                except ValueError:
                    continue
                if taps > 129:
                    continue
                break
            else:
                break
            self.stages.append(
                RationalResampler(
                    int(rate), rate / q,
                    taps_per_phase=taps, atten_db=atten_s,
                    channels=channels, impl=impl,
                )
            )
            rate = rate / q
        fin_ratio = max(1.0, rate / float(out_rate))
        atten_f = atten_db + 10.0 * math.log10(fin_ratio)
        self.stages.append(
            RationalResampler(
                int(rate), out_rate, atten_db=atten_f, channels=channels,
                max_denominator=max_denominator, impl=impl,
            )
        )
        fin = self.stages[-1]
        # overall reduced ratio (info only)
        g = 1
        for st in self.stages[:-1]:
            g *= st.Q                     # P=1 decimation front
        self.P = fin.P
        self.Q = fin.Q * g
        gg = math.gcd(self.P, self.Q)
        self.P //= gg
        self.Q //= gg
        # input-referred FIR latency: stage s's T−1 history samples live at
        # its own rate; expressed in input samples for drain/checkpoint sizing
        self.T = 1 + sum(
            (st.T - 1) * (self.in_rate // st.in_rate) for st in self.stages
        )

    # -- pipeline surface ----------------------------------------------------

    def out_count_for(self, n_new_inputs: int) -> int:
        n = int(n_new_inputs)
        for st in self.stages:
            n = st.out_count_for(n)
        return n

    def max_out_for(self, chunk_capacity: int) -> int:
        cap = int(chunk_capacity)
        for st in self.stages:
            cap = st.max_out_for(cap)
        return cap

    def process(self, i, q, valid: int, M: int | None = None):
        """Chain the stages; per-stage capacities derive from the actual
        array length, so one compilation serves the stream (``M`` is
        accepted for RationalResampler API compatibility and ignored —
        outputs are sized by the cascade itself)."""
        n = int(valid)
        for st in self.stages:
            cap = int(np.shape(i)[-1])
            i, q, n = st.process(i, q, n, st.max_out_for(cap))
        return i, q, n

    # -- checkpointing ---------------------------------------------------

    def state_dict(self) -> dict:
        out = {}
        for k, st in enumerate(self.stages):
            for key, val in st.state_dict().items():
                out[f"s{k}_{key}"] = val
        return out

    def load_state(self, state: dict) -> None:
        for k, st in enumerate(self.stages):
            st.load_state({
                key: state[f"s{k}_{key}"]
                for key in ("m_next", "in_consumed", "hist_i", "hist_q")
            })


def make_resampler(
    in_rate: int,
    out_rate: float,
    *,
    stages: str = "single",
    atten_db: float = 70.0,
    channels: int | None = None,
    **kwargs,
):
    """Factory: ``stages='single'`` → RationalResampler (bit-stable default);
    ``'auto'`` → halfband cascade when decimating by ≥ 4 (where it wins);
    ``'multi'`` → force the cascade."""
    heavy = float(out_rate) * 4.0 <= float(in_rate)
    if stages == "multi" or (stages == "auto" and heavy):
        if stages == "auto":
            # operator notice (ADVICE r3): 'auto' picks a different filter
            # chain than 'single' — SNR-equivalent output, not byte-equal
            # to pre-round-3 captures made with the old 'single' default
            from doppler_tpu.runtime.telemetry import get_logger

            get_logger("resample").info(
                "resample-stages auto: %.0f → %.0f Hz decimates ≥4× — "
                "using the multi-stage cascade (pass --resample-stages "
                "single for the legacy single-stage filter response)",
                float(in_rate), float(out_rate),
            )
        return MultiStageResampler(
            in_rate, out_rate, atten_db=atten_db, channels=channels, **kwargs,
        )
    if stages not in ("single", "auto"):
        raise ValueError(f"stages must be single|auto|multi, got {stages!r}")
    return RationalResampler(
        in_rate, out_rate, atten_db=atten_db, channels=channels, **kwargs
    )
