"""Fixed probe literals for oracle-checked queries.

All probes are constants inside the testdata's ranges (events span
2024-01-01..2024-01-30 at every sf; user_id 0..14 exists at sf0.001 and up) —
never ``now()`` (reference nondeterminism, SURVEY.md §7 risks).
"""

# As-of probe timestamps (events domain)
PROBE_TS = "2024-01-16 00:00:00"
PROBE_TS_EARLY = "2024-01-08 00:00:00"
PROBE_TS_LATE = "2024-01-24 00:00:00"

# Single-record probes
PROBE_KEY = "7"


# Similarity search
SIM_PROBE_VEC_ID = 0
SIM_TOP_K = 10
