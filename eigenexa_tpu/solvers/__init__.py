"""Solver drivers (L5 analogue — SURVEY.md §1).

eigen_s / eigen_sx / eigen_h / eigen_gev orchestration:
scale → reduce → solve-reduced → back-transform → rescale, with stage
telemetry (the reference embeds GFLOPS/timers in each driver,
src/eigen_s.F:180-276).
"""
