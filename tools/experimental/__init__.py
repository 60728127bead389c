"""Experimental kernels EVICTED from the shipped package (round 3):
neither is wired into the engine and both measured slower than the
shipped formulations on v5e (see their module docstrings).  Kept
here with their tests as research artifacts; run the tests with
``python -m pytest tools/experimental -q`` from the repo root.
"""
