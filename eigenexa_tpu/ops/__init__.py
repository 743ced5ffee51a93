"""Computational kernels (L4 analogue — SURVEY.md §1).

jnp/Pallas implementations of the reference's kernel families:
Householder panel reduction (eigen_trd_t2/t4/t5/t6 analogues), rank-2k
trailing update (eigen_t1.F), compact-WY back-transform (trbakwy4_body.F),
secular-equation solver (DLAED4 analogue), Sturm counts (bisect.F).
"""
