"""Pure-Python port of the reference rule path — TEST ORACLE ONLY.

Never imported by the Spark pipeline; used by tests/ to assert that
the distributed implementation emits the same triple set (P/R = 1.0 on
the synthetic corpus, satisfying the BASELINE P/R >= 0.95 gate).
"""
