"""Large-scale pipeline operators — the net-new surface beyond the
reference (BASELINE.json "north_star"): dedup, similarity search, text
analysis, multimodal plumbing, as-of join, validation.

Everything here is built from DataFrame primitives (no driver-side
loops); each module's docstring states its 100 TB shuffle/partition
posture.
"""
