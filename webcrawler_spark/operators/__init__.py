"""Distributed operators: frontier ordering/dedup/admission, bloom sidecar,
and the training-data ops (dedup, similarity, text stats)."""
