"""Shared curation-policy constants (quality-rule thresholds, domain
cap) used by both the round-5 single-operator queries (q108/q110) and
the round-6 composed funnel (q118). Lives in its own leaf module so
query modules can share them without importing each other (the query
modules form an import chain through the registry in queries.py, so a
cross-import between them is circular)."""

from __future__ import annotations

# Gopher/C4-style quality-rule thresholds (q108, q118 stage 1)
QR_MIN_TOK, QR_MAX_TOK = 20, 2000
QR_MIN_MWL, QR_MAX_MWL = 2.0, 10.0
QR_MAX_TBF, QR_MAX_DTF = 0.2, 0.6

# per-domain document cap (q110, q118 stage 4)
DOMAIN_CAP = 15
