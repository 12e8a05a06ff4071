"""Fixed probe literals for oracle-checked queries.

All probes are constants inside the testdata's ranges (events span
2024-01-01..2024-01-30 at every sf; user_id 0..14 exists at sf0.001 and up) —
never ``now()`` (reference nondeterminism, SURVEY.md §7 risks).
"""

import math as _math

# As-of probe timestamps (events domain)
PROBE_TS = "2024-01-16 00:00:00"
PROBE_TS_EARLY = "2024-01-08 00:00:00"
PROBE_TS_LATE = "2024-01-24 00:00:00"

# Single-record probes
PROBE_KEY = "7"


# Similarity search
SIM_PROBE_VEC_ID = 0
SIM_TOP_K = 10


def micro_units(x: float) -> int:
    """THE half-UP micro-unit quantization — floor(x*1e6 + 0.5) — the
    repo's one cross-engine rounding idiom (round-12 ADVICE; round-13
    review pass 2 found it re-inlined three times). Matches the oracles'
    ROUND(x*1e6, 0) on the non-negative domain where every caller's ties
    can actually land (scores are pre-rounded to 6 decimals, so x*1e6 is
    near-integral and an exact .5 is unreachable); on a hypothetical
    negative exact tie floor(+0.5) rounds toward +inf where SQL ROUND
    rounds away from zero — documented asymmetry, not a live divergence.

    Lives in this leaf module so corpus (DSIR mixing) and similarity
    (Lloyd's inter-round centroid quantization) share one definition
    without an operator-module import cycle."""
    return int(_math.floor(x * 1e6 + 0.5))


def quant6(x: float) -> float:
    """micro_units as a 6-decimal float — the Lloyd form
    (floor(x*1e6 + 0.5) / 1e6). The int -> float division is NOT exact
    (1e-6 has no exact binary representation); it is correctly-rounded,
    and cross-engine parity holds because both engines perform the same
    correctly-rounded double division of the same integer — do not build
    a new invariant on the result being the exact decimal (round-13
    ADVICE)."""
    return micro_units(x) / 1e6
